"""Trainer: LR schedule parity, end-to-end training slice, checkpointing."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from css_tpu.data import SyntheticCorpus
from css_tpu.data.mixer import MixtureSynthesizer
from css_tpu.models.blstm import BLSTM
from css_tpu.objectives.mse import MeanSquaredError
from css_tpu.trainer import LRSchedule, Trainer, checkpoint


class _RefSched:
    """Direct port of the reference stateful scheduler semantics for
    cross-checking (css/trainer/lr_scheduler.py:33-46)."""

    def __init__(self, lr, warmup, fixed, decay, min_lr):
        self.lr, self.warmup, self.fixed = lr, warmup, fixed
        self.decay, self.min_lr = decay, min_lr
        self.nw = self.nf = self.nd = 0
        self.curr = min_lr if warmup > 0 else lr

    def step(self):
        import math

        if self.warmup > 0 and self.nw < self.warmup:
            self.nw += 1
            self.curr = self.min_lr + (self.lr - self.min_lr) * self.nw / self.warmup
        elif self.fixed > 0 and self.nf < self.fixed:
            self.nf += 1
            self.curr = self.lr
        else:
            self.nd += 1
            self.curr = self.lr * math.exp(-self.decay * self.nd)


@pytest.mark.parametrize("warmup,fixed,decay", [(5, 3, 0.1), (0, 0, 0.05), (4, 0, 0.0)])
def test_lr_schedule_matches_reference(warmup, fixed, decay):
    sched = LRSchedule(lr=1e-3, warmup=warmup, fixed=fixed, decay=decay,
                       min_lr=1e-9)
    ref = _RefSched(1e-3, warmup, fixed, decay, 1e-9)
    for step in range(20):
        # reference: update step+1 runs at ref.curr, then scheduler steps
        np.testing.assert_allclose(float(sched(step)), ref.curr, rtol=1e-6)
        ref.step()


def _tiny_trainer(optim="adam"):
    model = BLSTM(idim=257, num_bins=257, hidden_dim=32, num_layers=1,
                  dropout_rate=0.0)
    sched = LRSchedule(lr=1e-3, warmup=2, fixed=0, decay=0.0)
    return Trainer(model, MeanSquaredError(), sched, optim=optim,
                   weight_decay=1e-4, grad_thresh=5.0, input_domain="stft")


def _loader(batch_size=4):
    corpus = SyntheticCorpus(num_speakers=4, utts_per_speaker=2,
                             min_dur=2.5, max_dur=4.0)
    return MixtureSynthesizer(corpus, batch_size=batch_size, min_window=2.0,
                              max_window=2.0, seed=0)


def test_end_to_end_training_decreases_loss():
    """Minimum end-to-end slice (SURVEY.md §7 stage 5): BLSTM + synthetic
    mixtures + PIT-MSE, loss must drop over a few dozen steps."""
    trainer = _tiny_trainer()
    loader = _loader()
    rng = jax.random.PRNGKey(0)
    state = trainer.init_state(rng, next(loader))
    logs = []
    state, avg1 = trainer.train_one_epoch(state, loader, 15, rng,
                                          log_fn=logs.append)
    state, avg2 = trainer.train_one_epoch(state, loader, 15, rng)
    assert np.isfinite(avg1) and np.isfinite(avg2)
    assert avg2 < avg1
    assert logs[0]["audio_sec_per_sec_per_chip"] > 0
    assert int(state.step) == 30


def test_validate_runs():
    trainer = _tiny_trainer()
    loader = _loader()
    state = trainer.init_state(jax.random.PRNGKey(0), next(loader))
    val = trainer.validate(state, loader, num_batches=2)
    assert np.isfinite(val)


def test_checkpoint_roundtrip_and_resume(tmp_path):
    trainer = _tiny_trainer()
    loader = _loader()
    rng = jax.random.PRNGKey(0)
    state = trainer.init_state(rng, next(loader))
    state, avg = trainer.train_one_epoch(state, loader, 3, rng)
    path = tmp_path / "1.mdl"
    checkpoint.save_checkpoint(path, state, epoch=1, loss=avg, conf={"a": 1})
    ckpt = checkpoint.load_checkpoint(path)
    assert ckpt["epoch"] == 1 and ckpt["conf"] == {"a": 1}
    state2 = checkpoint.restore_state(ckpt, trainer.init_state(rng, next(loader)))
    assert int(state2.step) == int(state.step)
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(state2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # resumed training proceeds
    state2, _ = trainer.train_one_epoch(state2, loader, 2, rng)
    assert int(state2.step) == int(state.step) + 2


def test_average_checkpoints_elastic(tmp_path):
    trainer = _tiny_trainer()
    loader = _loader()
    rng = jax.random.PRNGKey(0)
    states = []
    for j in range(2):
        s = trainer.init_state(jax.random.PRNGKey(j), next(loader))
        s, avg = trainer.train_one_epoch(s, loader, 2, rng)
        checkpoint.save_checkpoint(tmp_path / f"1.{j + 1}.mdl", s, 1, avg)
        states.append(s)
    # elastic: a missing third job is tolerated and weights renormalize
    merged = checkpoint.average_checkpoints(
        [tmp_path / "1.1.mdl", tmp_path / "1.2.mdl", tmp_path / "1.3.mdl"])
    p0 = jax.tree.leaves(states[0].params)
    p1 = jax.tree.leaves(states[1].params)
    pm = jax.tree.leaves(merged["params"])
    for a, b, m in zip(p0, p1, pm):
        np.testing.assert_allclose(
            np.asarray(m), (np.asarray(a) + np.asarray(b)) / 2, atol=1e-6)


def test_warm_start_with_output_replacement():
    trainer = _tiny_trainer()
    loader = _loader()
    s1 = trainer.init_state(jax.random.PRNGKey(0), next(loader))
    s2 = trainer.init_state(jax.random.PRNGKey(1), next(loader))
    import numpy as np

    src = jax.tree.map(lambda x: np.asarray(x), s1.params)
    merged = checkpoint.warm_start(
        jax.tree.map(lambda x: np.asarray(x), s2.params), src,
        replace_output=True)
    # non-output layers copied from source
    np.testing.assert_array_equal(
        merged["embed_linear"]["kernel"], src["embed_linear"]["kernel"])
    # output layer kept from target
    np.testing.assert_array_equal(
        merged["linear"]["kernel"], np.asarray(s2.params["linear"]["kernel"]))


def test_warm_start_casts_to_destination_dtype():
    """--init from a slim f16 checkpoint must NOT demote fp32 master
    weights (ADVICE r4 medium: persist_checkpoint.py lists --init as a
    consumer; params stored f16 silently trained in f16 all run)."""
    trainer = _tiny_trainer()
    loader = _loader()
    s1 = trainer.init_state(jax.random.PRNGKey(0), next(loader))
    import numpy as np

    slim = jax.tree.map(lambda x: np.asarray(x, np.float16), s1.params)
    fresh = jax.tree.map(lambda x: np.asarray(x), s1.params)
    merged = checkpoint.warm_start(fresh, slim)
    for leaf in jax.tree.leaves(merged):
        assert np.asarray(leaf).dtype == np.float32
    # values round-trip through the f16 cast
    np.testing.assert_allclose(
        np.asarray(merged["embed_linear"]["kernel"]),
        np.asarray(s1.params["embed_linear"]["kernel"]), atol=1e-3)


def test_gc_checkpoints(tmp_path):
    for e in range(1, 11):
        (tmp_path / f"{e}.mdl").write_bytes(b"x")
    checkpoint.gc_checkpoints(tmp_path, keep_every=5, keep_last=2)
    left = sorted(int(p.name.split(".")[0]) for p in tmp_path.glob("*.mdl"))
    assert left == [5, 9, 10]


def test_gc_checkpoints_per_job(tmp_path):
    for e in range(1, 8):
        (tmp_path / f"{e}.1.mdl").write_bytes(b"x")
        (tmp_path / f"{e}.2.mdl").write_bytes(b"x")
    checkpoint.gc_checkpoints(tmp_path, keep_every=3, keep_last=2, job=1)
    left1 = sorted(int(p.name.split(".")[0]) for p in tmp_path.glob("*.1.mdl"))
    left2 = sorted(int(p.name.split(".")[0]) for p in tmp_path.glob("*.2.mdl"))
    assert left1 == [3, 6, 7]
    assert left2 == list(range(1, 8))  # other job untouched


def test_nonfinite_step_is_skipped():
    trainer = _tiny_trainer()
    loader = _loader()
    rng = jax.random.PRNGKey(0)
    state = trainer.init_state(rng, next(loader))
    batch = next(loader)
    batch["mix"] = batch["mix"] * np.nan
    params_before = jax.tree.map(np.asarray, state.params)
    state2, metrics = trainer._train_step(state, batch, rng)
    assert not bool(metrics["finite"])
    for a, b in zip(jax.tree.leaves(params_before),
                    jax.tree.leaves(state2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
