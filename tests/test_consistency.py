"""Cross-window mask-consistency regularizer (--mse-consistency-weight).

Round-2/3 diagnosis: inference-time stitcher errors come from
cross-window mask INCONSISTENCY at the same time region (per-window MVN
+ uncentered analysis edge effects) — unsupervised routing signals
cannot recover what the masks lose (docs/ROADMAP.md stitcher notes).
The regularizer trains the model to emit the same mask for the same
audio under different window croppings.
"""

import jax
import jax.numpy as jnp
import numpy as np

from css_tpu.models.blstm import BLSTM
from css_tpu.objectives.mse import MeanSquaredError
from css_tpu.trainer import LRSchedule, Trainer
from css_tpu.trainer.loop import training_rng


def _batch(b=2, n=16000):
    rng = np.random.default_rng(0)
    s1 = rng.standard_normal((b, n)).astype(np.float32) * 0.05
    s2 = rng.standard_normal((b, n)).astype(np.float32) * 0.05
    return {"mix": s1 + s2, "source1": s1, "source2": s2}


def _trainer(cw=1.0, cf=8):
    model = BLSTM(hidden_dim=16, num_layers=1)
    obj = MeanSquaredError(noise_weight=0.1, consistency_weight=cw,
                           consistency_frames=cf)
    return Trainer(model, obj, LRSchedule(lr=1e-3, warmup=2), optim="adam",
                   grad_thresh=5.0)


def test_featurize_pair_shares_exact_frames():
    """The two crops' shared STFT frames are the SAME audio samples:
    frame j+cf of crop 1 == frame j of crop 2 bit-for-bit."""
    tr = _trainer(cw=1.0, cf=8)
    batch = _batch()
    feats = tr._featurize({k: jnp.asarray(v) for k, v in batch.items()})
    b = batch["mix"].shape[0]
    x = np.asarray(feats["input"])
    assert x.shape[0] == 2 * b
    np.testing.assert_array_equal(x[:b, 8:], x[b:, : x.shape[1] - 8])


def test_consistency_train_step_runs_and_reports():
    tr = _trainer()
    rng = training_rng(0)
    batch = _batch()
    state = tr.init_state(rng, batch)
    state, m = tr._train_step(state, dict(batch), rng)
    assert np.isfinite(float(m["loss"]))
    assert "consistency" in m and float(m["consistency"]) >= 0.0
    # an untrained model's masks DO disagree across croppings
    assert float(m["consistency"]) > 0.0


def test_consistency_disabled_is_single_forward():
    tr = _trainer(cw=0.0)
    batch = _batch()
    feats = tr._featurize({k: jnp.asarray(v) for k, v in batch.items()})
    assert feats["input"].shape[0] == batch["mix"].shape[0]


def test_consistency_weight_moves_loss():
    """The blended loss actually contains the weighted consistency term."""
    batch = _batch()
    rng = training_rng(0)
    tr1 = _trainer(cw=0.5, cf=8)
    state = tr1.init_state(rng, batch)
    feats = jax.jit(tr1._featurize)(
        {k: jnp.asarray(v) for k, v in batch.items()})
    loss1, (aux, _) = tr1._loss_fn(state.params, state.batch_stats, feats,
                                   rng, False)
    tr2 = _trainer(cw=1.5, cf=8)
    loss2, (aux2, _) = tr2._loss_fn(state.params, state.batch_stats, feats,
                                    rng, False)
    np.testing.assert_allclose(float(loss2 - loss1),
                               float(aux["consistency"]), rtol=1e-4)
