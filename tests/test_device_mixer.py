"""Device-side mixture materialization vs the host mixer.

Three layers of parity:
  1. recipe sampling + host materialization == the classic `__next__`
     path for the same rng stream (the decision split loses nothing);
  2. on-device `materialize` == host materialization for the same recipe
     (slices, FFT reverb, SNR noise all match within fp32 fft tolerance);
  3. a train step fed an encoded recipe == the same step fed the
     host-materialized audio (end-to-end equivalence inside jit).
"""

import numpy as np

import jax
import jax.numpy as jnp

from css_tpu.data import SyntheticCorpus
from css_tpu.data.corpus import synthetic_noise_pool, synthetic_rir_pool
from css_tpu.data.device_mixer import DeviceMixer, materialize
from css_tpu.data.mixer import MixtureSynthesizer
import pytest


def _mixer(seed=5, batch_size=6, augment=True, num_speakers=2, **kw):
    c = SyntheticCorpus(num_speakers=5, utts_per_speaker=3, seed=1)
    pools = {}
    if augment:
        pools = dict(rir_pool=synthetic_rir_pool(4),
                     noise_pool=synthetic_noise_pool(2, dur=2.0))
    return MixtureSynthesizer(c, batch_size=batch_size, min_window=2.0,
                              max_window=3.0, seed=seed,
                              num_speakers=num_speakers, **pools, **kw)


def test_recipe_host_materialization_matches_next():
    for augment in (False, True):
        a, b = _mixer(augment=augment), _mixer(augment=augment)
        for _ in range(3):  # several batches -> several window buckets
            classic = next(a)
            recipe = b.sample_recipe()
            recon = b.materialize_recipe_host(recipe)
            assert classic["mix"].shape == recon["mix"].shape
            np.testing.assert_allclose(recon["mix"], classic["mix"],
                                       atol=1e-5)
            for k in ("source1", "source2"):
                np.testing.assert_allclose(recon[k], classic[k], atol=1e-6)
            np.testing.assert_allclose(recon["ovl"], classic["ovl"])


def test_device_materialize_matches_host():
    m = _mixer(seed=9)
    dm = DeviceMixer(m)
    pools = dm.device_pools()
    for _ in range(3):
        recipe = m.sample_recipe()
        host = m.materialize_recipe_host(recipe)
        enc = dm.encode(recipe)
        enc.pop("ovl")
        dev = jax.jit(materialize)(pools, jax.tree.map(jnp.asarray, enc))
        np.testing.assert_allclose(np.asarray(dev["mix"]), host["mix"],
                                   atol=3e-4)
        for k in ("source1", "source2"):
            np.testing.assert_allclose(np.asarray(dev[k]), host[k],
                                       atol=1e-6)


def test_device_materialize_k3_no_augment():
    m = _mixer(seed=11, augment=False, num_speakers=3)
    dm = DeviceMixer(m)
    pools = dm.device_pools()
    recipe = m.sample_recipe()
    host = m.materialize_recipe_host(recipe)
    enc = dm.encode(recipe)
    enc.pop("ovl")
    dev = jax.jit(materialize)(pools, jax.tree.map(jnp.asarray, enc))
    for k in ("mix", "source1", "source2", "source3"):
        np.testing.assert_allclose(np.asarray(dev[k]), host[k], atol=1e-5)


@pytest.mark.slow
def test_train_step_recipe_equals_audio():
    from css_tpu.models import build_model
    from css_tpu.objectives import build_objective
    from css_tpu.trainer.loop import Trainer
    from css_tpu.trainer.lr_schedule import LRSchedule

    m = _mixer(seed=21, batch_size=4)
    dm = DeviceMixer(m)
    pools = dm.device_pools()
    recipe = m.sample_recipe()
    audio = m.materialize_recipe_host(recipe)
    audio.pop("ovl"), audio.pop("lens")
    enc = dm.encode(recipe)
    enc.pop("ovl")

    model = build_model("BLSTM", {"idim": 257, "hdim": 32, "num_layers": 1,
                                  "num_spk": 2, "num_noise": 1})
    objective = build_objective("MSE", {})
    tr = Trainer(model, objective, LRSchedule(1e-3, 10, 10, 1e-4),
                 optim="adam", donate=False)
    rng = jax.random.PRNGKey(0)
    state = tr.init_state(rng, enc, pools)

    s_audio, m_audio = tr._train_step(state, audio, rng)
    s_recipe, m_recipe = tr._train_step(state, enc, rng, pools)
    np.testing.assert_allclose(float(m_recipe["loss"]),
                               float(m_audio["loss"]), rtol=2e-4)
    la = jax.tree.leaves(s_audio.params)
    lr_ = jax.tree.leaves(s_recipe.params)
    for x, y in zip(la, lr_):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=5e-4)


def _blstm_trainer():
    from css_tpu.models import build_model
    from css_tpu.objectives import build_objective
    from css_tpu.trainer.loop import Trainer
    from css_tpu.trainer.lr_schedule import LRSchedule

    model = build_model("BLSTM", {"idim": 257, "hdim": 32, "num_layers": 1,
                                  "num_spk": 2, "num_noise": 1})
    return Trainer(model, build_objective("MSE", {}),
                   LRSchedule(1e-3, 10, 10, 1e-4), optim="adam",
                   donate=False)


@pytest.mark.slow
def test_data_parallel_with_recipes_matches_audio():
    """DP fed an encoded recipe == DP fed the host-materialized audio.

    Pools are replicated over the mesh; the recipe's index arrays are
    sharded over the data axis like any batch, so every device slices its
    own shard of windows out of its local pool copy."""
    from css_tpu.parallel import DataParallel, make_mesh

    m = _mixer(seed=41, batch_size=8)
    dm = DeviceMixer(m)
    recipe = m.sample_recipe()
    audio = m.materialize_recipe_host(recipe)
    audio.pop("ovl"), audio.pop("lens")
    enc = dm.encode(recipe)
    enc.pop("ovl")

    rng = jax.random.PRNGKey(0)
    dp_audio = DataParallel(_blstm_trainer(), make_mesh())
    dp_recipe = DataParallel(_blstm_trainer(), make_mesh(),
                             pools=dm.host_pools)
    s_a = dp_audio.init_state(rng, audio)
    s_r = dp_recipe.init_state(rng, enc)
    s_a, m_a = dp_audio.train_step(s_a, audio, rng)
    s_r, m_r = dp_recipe.train_step(s_r, enc, rng)
    np.testing.assert_allclose(float(m_r["loss"]), float(m_a["loss"]),
                               rtol=2e-4)
    for x, y in zip(jax.tree.leaves(s_a.params), jax.tree.leaves(s_r.params)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=5e-4)


@pytest.mark.slow
def test_replica_averaging_with_recipes_matches_audio():
    """replica_avg fed recipes == fed audio: the vmapped per-replica step
    materializes each replica's windows from the shared replicated pool."""
    from css_tpu.parallel import ReplicaAveraging, make_mesh

    m = _mixer(seed=51, batch_size=16)  # 8 replicas x 2
    dm = DeviceMixer(m)
    recipe = m.sample_recipe()
    audio = m.materialize_recipe_host(recipe)
    audio.pop("ovl"), audio.pop("lens")
    enc = dm.encode(recipe)
    enc.pop("ovl")

    rngs = jax.random.split(jax.random.PRNGKey(0), 8)
    ra_audio = ReplicaAveraging(_blstm_trainer(), make_mesh(),
                                num_replicas=8)
    ra_recipe = ReplicaAveraging(_blstm_trainer(), make_mesh(),
                                 num_replicas=8, pools=dm.host_pools)
    s_a = ra_audio.init_state(rngs, {k: v[:2] for k, v in audio.items()})
    s_r = ra_recipe.init_state(rngs, {k: v[:2] for k, v in enc.items()})
    step_rng = jax.random.PRNGKey(1)
    s_a, m_a = ra_audio.train_step(s_a, audio, step_rng)
    s_r, m_r = ra_recipe.train_step(s_r, enc, step_rng)
    np.testing.assert_allclose(np.asarray(m_r["loss"]),
                               np.asarray(m_a["loss"]), rtol=1e-3)
    for x, y in zip(jax.tree.leaves(s_a.params), jax.tree.leaves(s_r.params)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=5e-4)
    # averaging still collapses the replica axis
    avg = ra_recipe.average(s_r)
    leaf = np.asarray(jax.tree.leaves(avg.params)[0])
    np.testing.assert_allclose(leaf[0], leaf[-1], atol=1e-6)


@pytest.mark.slow
def test_multi_dispatch_with_recipes():
    """G stacked recipe batches scan correctly (same window bucket)."""
    from css_tpu.models import build_model
    from css_tpu.objectives import build_objective
    from css_tpu.trainer.loop import Trainer
    from css_tpu.trainer.lr_schedule import LRSchedule

    # window_group=3: the init example consumes one slot of the held
    # bucket, leaving two same-shape recipes for the stacking check
    m = _mixer(seed=31, batch_size=4, window_group=3)
    dm = DeviceMixer(m)
    pools = dm.device_pools()
    model = build_model("BLSTM", {"idim": 257, "hdim": 32, "num_layers": 1,
                                  "num_spk": 2, "num_noise": 1})
    objective = build_objective("MSE", {})
    tr = Trainer(model, objective, LRSchedule(1e-3, 10, 10, 1e-4),
                 optim="adam", donate=False)
    rng = jax.random.PRNGKey(1)
    example = next(iter(dm))
    example.pop("ovl")
    state = tr.init_state(rng, example, pools)

    g1 = [dm.encode(m.sample_recipe()) for _ in range(2)]
    for b in g1:
        b.pop("ovl")
    # sequential single-step dispatch
    s_seq = state
    for b in g1:
        s_seq, _ = tr._train_step(s_seq, b, rng, pools)
    # one scanned program over the stacked pair
    stacked = tr._stack_group(g1)
    assert stacked is not None, "same-bucket recipes must stack"
    s_multi, metrics = tr._train_multi(state, stacked, rng, pools)
    assert metrics["loss"].shape == (2,)
    for x, y in zip(jax.tree.leaves(s_seq.params),
                    jax.tree.leaves(s_multi.params)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-5)


def test_device_materialize_honors_normalize_output_false():
    """Host/device parity when the reverb transform does NOT energy-
    normalize (regression: materialize always rescaled by in_e/out_e)."""
    from css_tpu.data.augment import ReverbWithImpulseResponse

    m = _mixer(seed=61, augment=True)
    for tr in m.transforms:
        if isinstance(tr, ReverbWithImpulseResponse):
            tr.normalize_output = False
            tr.p = 1.0  # always reverb: exercise the unnormalized path
    dm = DeviceMixer(m)
    pools = dm.device_pools()
    recipe = m.sample_recipe()
    host = m.materialize_recipe_host(recipe)
    enc = dm.encode(recipe)
    enc.pop("ovl")
    dev = jax.jit(materialize)(pools, jax.tree.map(jnp.asarray, enc))
    np.testing.assert_allclose(np.asarray(dev["mix"]), host["mix"],
                               atol=3e-4)


def test_hard_pair_curriculum():
    """--hard-pair-frac forces ~frac of mixtures to close-f0 pairs, and
    the recipe path stays bit-identical to the classic __next__ path."""
    c = SyntheticCorpus(num_speakers=12, utts_per_speaker=3, seed=2,
                        f0_max=400.0)
    f0 = c.f0_by_speaker
    kw = dict(batch_size=8, min_window=2.0, max_window=2.0,
              hard_pair_frac=0.5, hard_pair_df0=60.0)
    a = MixtureSynthesizer(c, seed=3, **kw)
    b = MixtureSynthesizer(c, seed=3, **kw)
    # parity: recipe host materialization == classic path with curriculum on
    classic = next(a)
    recon = b.materialize_recipe_host(b.sample_recipe())
    np.testing.assert_allclose(recon["mix"], classic["mix"], atol=1e-5)

    # statistics: with frac=0.5 and 12 uniform speakers, close pairs must
    # appear far more often than the uniform base rate
    def close_rate(mixer, batches=40):
        n_close = n = 0
        for _ in range(batches):
            r = mixer.sample_recipe()
            for row in r["utt"]:
                pair = [f0[c.utterances[i].speaker] for i in row[:2]]
                n += 1
                n_close += abs(pair[0] - pair[1]) <= 60.0
        return n_close / n

    rate_on = close_rate(MixtureSynthesizer(c, seed=7, **kw))
    rate_off = close_rate(MixtureSynthesizer(
        c, seed=7, batch_size=8, min_window=2.0, max_window=2.0))
    # frac=0.5 of DRAWS are forced-close; rows per draw vary, so the
    # realized row-level lift is below frac*(1-base) but must be large
    assert rate_on > rate_off + 0.15, (rate_on, rate_off)
    assert rate_on > 0.5, rate_on


def test_hard_pair_frac_zero_is_bit_identical():
    """frac=0.0 must not consume any extra rng draws (historical stream)."""
    a = _mixer(seed=11)
    b = MixtureSynthesizer(
        SyntheticCorpus(num_speakers=5, utts_per_speaker=3, seed=1),
        batch_size=6, min_window=2.0, max_window=3.0, seed=11,
        rir_pool=synthetic_rir_pool(4),
        noise_pool=synthetic_noise_pool(2, dur=2.0),
        hard_pair_frac=0.0)
    for _ in range(2):
        x, y = next(a), next(b)
        np.testing.assert_array_equal(x["mix"], y["mix"])
