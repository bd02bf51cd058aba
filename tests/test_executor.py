"""Executor: stitcher vs reference, MVDR vs the mvdr_util oracle,
separator batching, DOA merge, end-to-end pipeline."""

import sys

import numpy as np
import pytest
import torch

import jax.numpy as jnp

sys.path.insert(0, "/root/reference")


# ---------------------------------------------------------------- stitcher
def _ref_stitch(mags_ft, masks_ft3):
    """Run the reference Stitcher (css/executor/stitcher.py)."""
    from css.executor.stitcher import Stitcher as RefStitcher

    st = RefStitcher({"eval_win": 2.4, "eval_hop": 0.8, "hop_size": 256})
    x = [torch.from_numpy(m) for m in mags_ft]  # each (F, T)
    masks = [torch.from_numpy(m) for m in masks_ft3]  # each (F, T, 3)
    perm = st.get_stitch(x, masks)
    res = st.get_connect(perm, masks)
    return perm, [r.numpy() for r in res]


def test_stitcher_matches_reference():
    from css_tpu.executor.stitcher import Stitcher

    rng = np.random.default_rng(0)
    b, t, f = 5, 150, 17
    masks = rng.uniform(0, 1, (b, t, f, 3)).astype(np.float32)
    mags = rng.uniform(0, 2, (b, t, f)).astype(np.float32)

    st = Stitcher(eval_win=2.4, eval_hop=0.8, fft_hop=256)
    perms = np.asarray(st.get_stitch(jnp.asarray(masks), jnp.asarray(mags)))
    r1, r2, rn = [np.asarray(r) for r in st(masks, mags)]

    mags_ft = [mags[i].T for i in range(b)]
    masks_ft3 = [np.transpose(masks[i], (1, 0, 2)) for i in range(b)]
    ref_perm, ref_res = _ref_stitch(mags_ft, masks_ft3)
    assert [list(p) for p in perms] == ref_perm
    np.testing.assert_allclose(r1.T, ref_res[0], atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(r2.T, ref_res[1], atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(rn.T, ref_res[2], atol=1e-5, rtol=1e-4)


def test_stitcher_propagates_flip_state():
    """Synthetic case: two spectrally distinct sources; windows 1..n have
    stream order swapped — the stitcher must un-swap consistently."""
    from css_tpu.executor.stitcher import Stitcher

    b, t, f = 4, 150, 8
    a_mask = np.zeros((t, f), np.float32)
    a_mask[:, : f // 2] = 0.9
    b_mask = np.zeros((t, f), np.float32)
    b_mask[:, f // 2 :] = 0.9
    noise = np.full((t, f), 0.05, np.float32)
    masks = np.zeros((b, t, f, 3), np.float32)
    for i in range(b):
        if i % 2 == 0:
            masks[i, ..., 0], masks[i, ..., 1] = a_mask, b_mask
        else:  # swapped
            masks[i, ..., 0], masks[i, ..., 1] = b_mask, a_mask
        masks[i, ..., 2] = noise
    mags = np.ones((b, t, f), np.float32)
    st = Stitcher(eval_win=2.4, eval_hop=0.8, fft_hop=256)
    perms = np.asarray(st.get_stitch(jnp.asarray(masks), jnp.asarray(mags)))
    assert (perms == [1, 0]).all()  # every boundary swaps
    r1, r2, _ = [np.asarray(r) for r in st(masks, mags)]
    # stream 1 should consistently be the low-band source everywhere
    assert (r1[:, : f // 2] > r1[:, f // 2 :]).mean() > 0.95
    assert (r2[:, f // 2 :] > r2[:, f // 2 :].mean() * 0).mean() > 0.95


# ------------------------------------------------------------------- MVDR
def test_souden_mvdr_matches_mvdr_util_oracle():
    """Cross-check against the reference's in-repo NumPy MVDR math
    (css/utils/mvdr_util.py:45-66)."""
    from css.utils import mvdr_util

    from css_tpu.ops.mvdr import (apply_beamformer, compute_scm,
                                  souden_coefficients)

    rng = np.random.default_rng(1)
    c, f, t = 7, 33, 40
    mix = (rng.standard_normal((c, f, t)) +
           1j * rng.standard_normal((c, f, t))).astype(np.complex64)
    tgt_mask = rng.uniform(0, 1, (f, t)).astype(np.float32)
    noi_mask = rng.uniform(0, 1, (f, t)).astype(np.float32)

    tgt_scm_ref, _ = mvdr_util.get_mask_scm(mix, tgt_mask)
    noi_scm_ref, _ = mvdr_util.get_mask_scm(mix, noi_mask)
    w_ref = mvdr_util.calc_bfcoeffs(noi_scm_ref, tgt_scm_ref)  # (F, C)
    y_ref = mvdr_util.get_bf(mix, w_ref)  # (F, T)

    spec = jnp.asarray(np.transpose(mix, (0, 2, 1)))  # (C, T, F)
    tgt = compute_scm(spec, jnp.asarray(tgt_mask.T))
    noi = compute_scm(spec, jnp.asarray(noi_mask.T))
    np.testing.assert_allclose(np.asarray(tgt), tgt_scm_ref, atol=1e-3,
                               rtol=1e-4)
    w = souden_coefficients(noi, tgt)
    np.testing.assert_allclose(np.asarray(w), w_ref, atol=1e-4, rtol=1e-3)
    y = apply_beamformer(spec, w)  # (T, F)
    np.testing.assert_allclose(np.asarray(y).T, y_ref, atol=1e-3, rtol=1e-3)


def test_mvdr_single_channel_degenerates_to_identity_scale():
    from css_tpu.ops.mvdr import souden_mvdr

    rng = np.random.default_rng(2)
    spec = (rng.standard_normal((2, 1, 20, 9)) +
            1j * rng.standard_normal((2, 1, 20, 9))).astype(np.complex64)
    m = rng.uniform(0, 1, (2, 20, 9)).astype(np.float32)
    out = souden_mvdr(jnp.asarray(spec), jnp.asarray(m), jnp.asarray(1 - m))
    np.testing.assert_allclose(np.asarray(out), spec[:, 0], atol=1e-3,
                               rtol=1e-3)


# -------------------------------------------------------------- separator
def _tiny_model_and_vars(idim=257):
    import jax

    from css_tpu.models.blstm import BLSTM

    model = BLSTM(idim=idim, num_bins=idim, hidden_dim=16, num_layers=1,
                  dropout_rate=0.0)
    f = jnp.zeros((1, 10, idim))
    variables = model.init({"params": jax.random.PRNGKey(0)}, f, train=False)
    return model, variables


def test_separator_windows_and_batching():
    from css_tpu.executor.separator import Separator

    model, variables = _tiny_model_and_vars()
    sep = Separator(model, variables, batch_size=4)
    rng = np.random.default_rng(3)
    wav = rng.standard_normal(16000 * 8).astype(np.float32) * 0.05
    masks, mags = sep.separate(wav)
    expected_windows = (len(wav) - sep.win) // sep.hop + 1
    assert masks.shape[0] == expected_windows == mags.shape[0]
    assert masks.shape[3] == 3
    assert masks.shape[1] == (sep.win - 512) // 256 + 1  # 150 frames
    assert masks.max() <= 1.0 + 1e-6
    # batch padding must not change results: same windows, bigger batch
    sep2 = Separator(model, variables, batch_size=64)
    masks2, _ = sep2.separate(wav)
    np.testing.assert_allclose(masks, masks2, atol=1e-5)


# ------------------------------------------------------------------- DOA
def test_steering_vectors_match_mic_geometry_oracle():
    """Independent oracle: the reference's cosine stack
    (separator.py:129-140) equals delays r*cos(theta - phi_m) for mic
    azimuths phi = [-, -30, 30, 90, 150, 210, 270] deg (center mic first)."""
    from css_tpu.executor.doa import steervec_7ch

    sv, angles = steervec_7ch(nfreqs=257, nvecs=30)
    assert sv.shape == (257, 30, 7)
    np.testing.assert_allclose(angles, np.arange(30) * 12.0, atol=1e-4)

    theta = np.deg2rad(np.arange(30) * 12.0)
    phi = np.deg2rad(np.array([0, -30, 30, 90, 150, 210, 270], float))
    radius, c_snd, sr = 0.0425, 340.0, 16000
    delays = radius * np.cos(theta[:, None] - phi[None, :]) / c_snd * sr
    delays[:, 0] = 0.0  # center mic
    f = np.arange(257)[:, None, None]
    expected = np.exp(1j * delays[None] * np.pi * f / 256) / np.sqrt(7)
    np.testing.assert_allclose(sv, expected, atol=1e-5)


def test_angle_merge_kills_weaker_coincident_mask():
    from css_tpu.executor.doa import SteeringVectors

    sv = SteeringVectors(nfreqs=257)
    rng = np.random.default_rng(4)
    b, c, t, f = 1, 7, 20, 257
    spec = (rng.standard_normal((b, c, t, f)) +
            1j * rng.standard_normal((b, c, t, f))).astype(np.complex64)
    # near-identical masks -> identical DOA -> the weaker one (smaller
    # binarized support, hence lower masked energy) dies
    base = rng.uniform(0.6, 1.0, (b, t, f)).astype(np.float32)
    weak = base.copy()
    weak[:, t // 2 :, :] = 0.1  # below the 0.5 binarization threshold
    mask = np.stack([base, weak], axis=-1)
    merged = np.asarray(sv.angle_merge(jnp.asarray(spec), jnp.asarray(mask)))
    # stream with smaller masked energy killed
    assert (merged[..., 1] <= 1e-11).all()
    np.testing.assert_allclose(merged[..., 0], mask[..., 0])


# --------------------------------------------------------------- pipeline
def test_pipeline_end_to_end(tmp_path):
    from css_tpu.executor.pipeline import CssPipeline

    model, variables = _tiny_model_and_vars()
    config = {
        "sampling_rate": 16000,
        "separation": {"batch_size": 8, "eval_win": 2.4, "eval_hop": 0.8,
                       "frame_length": 512, "frame_shift": 256},
        "stitching": {"eval_win": 2.4, "eval_hop": 0.8, "hop_size": 256},
        "beamforming": {"type": "SoudenMVDRBeamformer", "hop_size": 256,
                        "n_fft": 512, "eval_hop": 0.8, "eval_win": 2.4,
                        "proceed_margin": 2, "wta_thresh": 1e-4},
    }
    pipe = CssPipeline(model, variables, config)
    rng = np.random.default_rng(5)
    wav = rng.standard_normal(16000 * 10).astype(np.float32) * 0.05
    out0, out1 = pipe.process_recording("rec1", wav, tmp_path)
    assert out0.shape == wav.shape and out1.shape == wav.shape
    assert np.isfinite(out0).all() and np.isfinite(out1).all()
    assert np.abs(out0).max() <= 0.91
    assert (tmp_path / "rec1_0.wav").exists()
    assert (tmp_path / "rec1_1.wav").exists()
