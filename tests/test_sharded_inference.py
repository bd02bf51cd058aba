"""Chunk-sharded inference on the 8-device mesh must match single-device."""

import numpy as np

import jax
import jax.numpy as jnp

from css_tpu.executor.separator import Separator
from css_tpu.executor.sharded import ShardedSeparation
from css_tpu.executor.stitcher import Stitcher
from css_tpu.models.blstm import BLSTM
from css_tpu.parallel import make_mesh


def _model_and_vars():
    model = BLSTM(idim=257, num_bins=257, hidden_dim=16, num_layers=1,
                  dropout_rate=0.0)
    f = jnp.zeros((1, 10, 257))
    variables = model.init({"params": jax.random.PRNGKey(0)}, f, train=False)
    return model, variables


def test_sharded_matches_unsharded():
    model, variables = _model_and_vars()
    mesh = make_mesh()  # 8x1
    rng = np.random.default_rng(0)
    wav = rng.standard_normal(16000 * 12).astype(np.float32) * 0.05

    sharded = ShardedSeparation(model, variables, mesh)
    (r1, r2, rn), masks_s, mags_s = sharded.separate(wav)

    sep = Separator(model, variables, batch_size=8)
    masks, mags = sep.separate(wav)
    st = Stitcher()
    r1_ref, r2_ref, rn_ref = [np.asarray(x) for x in st(masks, mags)]

    assert masks_s.shape == masks.shape
    np.testing.assert_allclose(masks_s, masks, atol=1e-5)
    np.testing.assert_allclose(r1[: len(r1_ref)], r1_ref, atol=1e-5)
    np.testing.assert_allclose(r2[: len(r2_ref)], r2_ref, atol=1e-5)
    np.testing.assert_allclose(rn[: len(rn_ref)], rn_ref, atol=1e-5)


def test_sharded_handles_non_divisible_window_counts():
    model, variables = _model_and_vars()
    mesh = make_mesh()
    rng = np.random.default_rng(1)
    # 9.6 s -> 10 windows of 2.4s+256 at hop 0.8 -> not divisible by 8
    wav = rng.standard_normal(16000 * 10).astype(np.float32) * 0.05
    sharded = ShardedSeparation(model, variables, mesh)
    (r1, r2, rn), masks, mags = sharded.separate(wav)
    n_win = (len(wav) - sharded.win) // sharded.hop + 1
    assert masks.shape[0] == n_win
    expected_frames = (n_win - 1) * sharded.stitcher.hop_frames + masks.shape[1]
    assert r1.shape[0] == expected_frames
    assert np.isfinite(r1).all() and np.isfinite(r2).all()
