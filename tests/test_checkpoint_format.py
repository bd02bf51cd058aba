"""npz checkpoint format: round-trip, legacy-pickle compat, averaging
(VERDICT r1 item 9 — SURVEY §5 planned msgpack/npz pytrees; pickle was
fragile across refactors and unsafe to share)."""

import pickle

import numpy as np

import jax
import jax.numpy as jnp

from css_tpu.models.blstm import BLSTM
from css_tpu.objectives.mse import MeanSquaredError
from css_tpu.trainer import LRSchedule, Trainer, checkpoint


def make_state():
    model = BLSTM(idim=257, num_bins=257, hidden_dim=32, num_layers=1,
                  dropout_rate=0.0)
    trainer = Trainer(model, MeanSquaredError(), LRSchedule(lr=1e-3),
                      optim="adam")
    rng = np.random.default_rng(0)
    batch = {
        "mix": rng.standard_normal((2, 32000)).astype(np.float32),
        "source1": rng.standard_normal((2, 32000)).astype(np.float32),
        "source2": rng.standard_normal((2, 32000)).astype(np.float32),
    }
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    state, _ = trainer._train_step(state, batch, jax.random.PRNGKey(1))
    return trainer, state, batch


def test_npz_roundtrip(tmp_path):
    trainer, state, batch = make_state()
    path = tmp_path / "ckpt.mdl"
    checkpoint.save_checkpoint(path, state, epoch=3, loss=0.5,
                               conf={"model": "BLSTM", "lr": 1e-3})
    # the file is a plain zip of .npy arrays, NOT a pickle
    assert open(path, "rb").read(2) == b"PK"
    ckpt = checkpoint.load_checkpoint(path)
    assert ckpt["epoch"] == 3 and ckpt["loss"] == 0.5
    assert ckpt["conf"]["model"] == "BLSTM"
    for (p1, a), (p2, b) in zip(
            jax.tree_util.tree_flatten_with_path(ckpt["params"])[0],
            jax.tree_util.tree_flatten_with_path(
                jax.tree.map(np.asarray, state.params))[0]):
        assert jax.tree_util.keystr(p1) == jax.tree_util.keystr(p2)
        np.testing.assert_array_equal(a, b)
    # opt_state leaves preserved in order
    orig = [np.asarray(l) for l in jax.tree.leaves(state.opt_state)]
    assert len(ckpt["opt_state"]) == len(orig)
    for a, b in zip(ckpt["opt_state"], orig):
        np.testing.assert_array_equal(a, b)
    # restore into a live state and keep training
    restored = checkpoint.restore_state(ckpt, state)
    assert int(restored.step) == int(state.step)
    trainer._train_step(restored, batch, jax.random.PRNGKey(2))


def test_bfloat16_leaf_roundtrip(tmp_path):
    class S:
        params = {"w": jnp.ones((4, 3), jnp.bfloat16) * 1.5}
        batch_stats = {}
        opt_state = {}
        step = jnp.zeros((), jnp.int32)

    path = tmp_path / "bf16.mdl"
    checkpoint.save_checkpoint(path, S(), epoch=1, loss=0.0)
    ckpt = checkpoint.load_checkpoint(path)
    w = ckpt["params"]["w"]
    assert w.dtype.name == "bfloat16"
    np.testing.assert_array_equal(np.asarray(w, np.float32),
                                  np.full((4, 3), 1.5, np.float32))


def test_legacy_pickle_still_loads(tmp_path):
    trainer, state, _ = make_state()
    legacy = {
        "params": jax.tree.map(np.asarray, state.params),
        "batch_stats": {},
        "opt_state": jax.tree.map(np.asarray, state.opt_state),
        "step": 7, "epoch": 2, "loss": 1.25, "conf": {"x": 1},
    }
    path = tmp_path / "legacy.mdl"
    with open(path, "wb") as f:
        pickle.dump(legacy, f)
    ckpt = checkpoint.load_checkpoint(path)
    assert ckpt["epoch"] == 2 and ckpt["conf"] == {"x": 1}
    checkpoint.restore_state(ckpt, state)


def test_average_mixed_formats(tmp_path):
    trainer, state, _ = make_state()
    npz_path = tmp_path / "a.mdl"
    checkpoint.save_checkpoint(npz_path, state, epoch=1, loss=0.1)
    legacy = {
        "params": jax.tree.map(lambda x: np.asarray(x) * 3.0, state.params),
        "batch_stats": {},
        "opt_state": jax.tree.map(np.asarray, state.opt_state),
        "step": 1, "epoch": 1, "loss": 0.3, "conf": {},
    }
    pkl_path = tmp_path / "b.mdl"
    with open(pkl_path, "wb") as f:
        pickle.dump(legacy, f)
    merged = checkpoint.average_checkpoints([str(npz_path), str(pkl_path),
                                             str(tmp_path / "missing.mdl")])
    w_new = jax.tree.leaves(merged["params"])[0]
    w_old = jax.tree.leaves(jax.tree.map(np.asarray, state.params))[0]
    np.testing.assert_allclose(w_new, w_old * 2.0, rtol=1e-6)
