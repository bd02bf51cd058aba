"""Distributed strategies on the 8-virtual-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from css_tpu.data import SyntheticCorpus
from css_tpu.data.mixer import MixtureSynthesizer
from css_tpu.models.blstm import BLSTM
from css_tpu.models.conformer import Conformer
from css_tpu.objectives.mse import MeanSquaredError
from css_tpu.parallel import (DataParallel, ReplicaAveraging,
                              conformer_tp_spec, make_mesh)
from css_tpu.trainer import LRSchedule, Trainer


def _trainer(model=None):
    if model is None:
        model = BLSTM(idim=257, num_bins=257, hidden_dim=16, num_layers=1,
                      dropout_rate=0.0)
    sched = LRSchedule(lr=1e-3, warmup=0, fixed=0, decay=0.0)
    return Trainer(model, MeanSquaredError(), sched, optim="sgd",
                   grad_thresh=5.0)


def _loader(batch_size):
    corpus = SyntheticCorpus(num_speakers=4, utts_per_speaker=2,
                             min_dur=2.5, max_dur=4.0)
    return MixtureSynthesizer(corpus, batch_size=batch_size, min_window=2.0,
                              max_window=2.0, seed=0)


def test_mesh_shapes():
    mesh = make_mesh()
    assert mesh.shape == {"data": 8, "model": 1}
    mesh2 = make_mesh(model=2)
    assert mesh2.shape == {"data": 4, "model": 2}


def test_data_parallel_matches_single_device():
    """DP over 8 devices must produce the same update as 1 device."""
    trainer = _trainer()
    loader = _loader(batch_size=8)
    batch = next(loader)
    rng = jax.random.PRNGKey(0)

    state_single = trainer.init_state(rng, batch)
    s1, m1 = trainer._train_step(state_single, dict(batch), rng)

    dp = DataParallel(_trainer(), make_mesh())
    state_dp = dp.init_state(rng, batch)
    s2, m2 = dp.train_step(state_dp, dict(batch), rng)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_tp_spec_targets_ffn_and_attention():
    model = Conformer(idim=257, num_bins=257, attention_dim=32,
                      attention_heads=2, linear_units=64, num_blocks=1,
                      kernel_size=5)
    f = jnp.zeros((1, 10, 257))
    variables = model.init({"params": jax.random.PRNGKey(0)}, f, train=False)
    spec = conformer_tp_spec(variables["params"])
    enc = spec["conformer"]["encoders_0"]
    assert enc["feed_forward_in"]["w1"]["kernel"] == P(None, "model")
    assert enc["feed_forward_in"]["w2"]["kernel"] == P("model", None)
    assert enc["self_attn"]["linear_q"]["kernel"] == P(None, "model")
    assert enc["self_attn"]["linear_out"]["kernel"] == P("model", None)
    assert enc["conv"]["dw_kernel"] == P()


@pytest.mark.slow
def test_dp_with_tp_trains_conformer():
    """Full DP x TP (4x2) Conformer step runs and is finite."""
    model = Conformer(idim=257, num_bins=257, attention_dim=32,
                      attention_heads=2, linear_units=64, num_blocks=1,
                      kernel_size=5, dropout_rate=0.0)
    trainer = Trainer(model, MeanSquaredError(), LRSchedule(lr=1e-3),
                      optim="adam")
    mesh = make_mesh(model=2)
    loader = _loader(batch_size=4)
    batch = next(loader)
    rng = jax.random.PRNGKey(0)
    state = trainer.init_state(rng, batch)
    from css_tpu.parallel.mesh import shard_params

    tp = conformer_tp_spec(state.params)
    dp = DataParallel(trainer, mesh, tp_spec=tp)
    state = dp.init_state(rng, batch)
    state, metrics = dp.train_step(state, batch, rng)
    assert np.isfinite(float(metrics["loss"]))
    # params actually sharded over 'model'
    w1 = state.params["conformer"]["encoders_0"]["feed_forward_in"]["w1"]["kernel"]
    assert len(w1.sharding.device_set) == 8


@pytest.mark.slow
def test_replica_averaging_independent_then_converges():
    trainer = _trainer()
    ra = ReplicaAveraging(trainer, make_mesh(), num_replicas=8)
    loader = _loader(batch_size=16)  # 2 per replica
    batch = next(loader)
    rngs = jax.random.split(jax.random.PRNGKey(0), 8)
    state = ra.init_state(rngs, {k: v[:2] for k, v in batch.items()
                                 if k in ("mix", "source1", "source2")})
    # distinct initializations -> replicas differ
    p = state.params["embed_linear"]["kernel"]
    assert p.shape[0] == 8
    assert np.abs(np.asarray(p[0]) - np.asarray(p[1])).max() > 1e-4

    state, metrics = ra.train_step(state, batch, jax.random.PRNGKey(1))
    assert metrics["loss"].shape == (8,)
    assert np.isfinite(np.asarray(metrics["loss"])).all()

    avg = ra.average(state)
    pa = np.asarray(avg.params["embed_linear"]["kernel"])
    np.testing.assert_allclose(pa[0], pa[7], atol=1e-6)
    np.testing.assert_allclose(
        pa[0], np.mean(np.asarray(state.params["embed_linear"]["kernel"]),
                       axis=0), atol=1e-6)


def test_replica_averaging_elastic_over_survivors():
    trainer = _trainer()
    ra = ReplicaAveraging(trainer, make_mesh(), num_replicas=8)
    loader = _loader(batch_size=16)
    batch = next(loader)
    rngs = jax.random.split(jax.random.PRNGKey(0), 8)
    state = ra.init_state(rngs, {k: v[:2] for k, v in batch.items()
                                 if k in ("mix", "source1", "source2")})
    alive = np.array([True, True, False, False, False, False, False, False])
    avg = ra.average(state, alive=alive)
    pa = np.asarray(avg.params["embed_linear"]["kernel"])
    full = np.asarray(state.params["embed_linear"]["kernel"])
    np.testing.assert_allclose(pa[0], (full[0] + full[1]) / 2, atol=1e-6)
