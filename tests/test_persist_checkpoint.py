"""Slim-checkpoint persistence (scripts/persist_checkpoint.py).

The dev environment wipes ``exp/`` between rounds; flagship checkpoints
survive as committed float16 inference-only copies. The cast must be
quality-neutral and the slim file loadable by every consumer path
(quality_eval / cli.separate build ``{"params": ckpt["params"]}``).
"""

import numpy as np

import scripts.persist_checkpoint as pc
from css_tpu.models import MODELS
from css_tpu.trainer import checkpoint as ckpt_io


def _tiny_blstm_checkpoint(tmp_path):
    import jax

    from css_tpu.objectives.mse import MeanSquaredError
    from css_tpu.trainer import LRSchedule, Trainer

    conf = {"blstm_hdim": 32, "blstm_num_layers": 1}
    model = MODELS["BLSTM"].build_model(conf)
    trainer = Trainer(model, MeanSquaredError(), LRSchedule(lr=1e-3,
                                                            warmup=2))
    rng = np.random.default_rng(0)
    batch = {"mix": rng.standard_normal((2, 16000)).astype(np.float32) * .1,
             "source1": rng.standard_normal((2, 16000)).astype(np.float32) * .05,
             "source2": rng.standard_normal((2, 16000)).astype(np.float32) * .05}
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    path = tmp_path / "full.mdl"
    ckpt_io.save_checkpoint(str(path), state, epoch=3, loss=0.25, conf=conf)
    return path, conf


def test_slim_roundtrip(tmp_path):
    full, conf = _tiny_blstm_checkpoint(tmp_path)
    out = tmp_path / "slim.mdl"
    pc.main(["--in", str(full), "--out", str(out), "--model", "BLSTM"])

    slim = ckpt_io.load_checkpoint(str(out))
    assert slim["slim_f16"] is True
    assert slim["epoch"] == 3
    assert slim["conf"]["blstm_hdim"] == 32
    assert not slim["opt_state"], "optimizer state must be dropped"
    # all float leaves stored as f16
    import jax

    for leaf in jax.tree.leaves(slim["params"]):
        if np.issubdtype(np.asarray(leaf).dtype, np.floating):
            assert np.asarray(leaf).dtype == np.float16
    # smaller than the full checkpoint
    assert out.stat().st_size < full.stat().st_size / 2

    # consumer path: masks from the slim copy track the original
    import jax.numpy as jnp

    model = MODELS["BLSTM"].build_model(conf)
    orig = ckpt_io.load_checkpoint(str(full))
    feats = jnp.asarray(np.random.default_rng(1)
                        .uniform(0, 1, (2, 40, 257)).astype(np.float32))
    _, ref = model.apply({"params": orig["params"]}, feats, train=False)
    _, got = model.apply(
        {"params": jax.tree.map(lambda a: jnp.asarray(a, jnp.float32),
                                slim["params"])}, feats, train=False)
    assert float(jnp.mean(jnp.abs(got - ref))) < 5e-3


def test_slim_rejects_corrupted_cast(tmp_path, monkeypatch):
    """The verification forward must actually gate: a cast that changes
    outputs beyond tolerance exits nonzero."""
    import pytest

    full, conf = _tiny_blstm_checkpoint(tmp_path)
    out = tmp_path / "slim.mdl"
    with pytest.raises(SystemExit):
        pc.main(["--in", str(full), "--out", str(out), "--model", "BLSTM",
                 "--tol", "0"])
