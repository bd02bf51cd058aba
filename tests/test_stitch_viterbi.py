"""Skip-window boundary ensemble in the stitcher (VERDICT round-2 next #6).

With skip_weight > 0, boundary permutations are the MAP of a chain with
unary costs from the adjacent overlap (the reference's only evidence,
css/executor/stitcher.py:14-52) plus pairwise costs scoring composed
permutations against the skip-window overlap (windows b and b+2 still
share eval_win - 2*eval_hop seconds). One corrupted boundary region can
no longer flip every downstream window."""

import numpy as np
import jax.numpy as jnp
import pytest

from css_tpu.executor.stitcher import Stitcher


def _band_masks(n_win=5, t=150, f=64, k_lo=(4, 18), k_hi=(36, 52)):
    """Masks/mags for two constant sources in disjoint bands: stream 0 =
    low band, stream 1 = high band, identity routing correct everywhere."""
    masks = np.zeros((n_win, t, f, 3), np.float32)
    masks[..., k_lo[0]:k_lo[1], 0] = 1.0
    masks[..., k_hi[0]:k_hi[1], 1] = 1.0
    mags = np.full((n_win, t, f), 1.0, np.float32)
    return masks, mags


def _corrupt_adjacent_margin(masks, mags, margin=100, margin2=50):
    """Swap the streams at 3x energy in exactly the slice of boundary
    (2,3)'s overlap that is NOT shared with any skip overlap: window 2's
    tail frames [T-margin, T-margin2) and window 3's head frames
    [margin2, margin). The adjacent decision at that boundary then
    prefers the (wrong) swap, while every skip overlap stays clean."""
    t = masks.shape[1]
    for w, sl in ((2, slice(t - margin, t - margin2)),
                  (3, slice(margin2, margin))):
        sw = masks[w, sl].copy()
        masks[w, sl, :, 0] = sw[..., 1]
        masks[w, sl, :, 1] = sw[..., 0]
        mags[w, sl] = 3.0
    return masks, mags


def test_skip_weight_zero_matches_independent_decisions():
    masks, mags = _band_masks()
    masks, mags = _corrupt_adjacent_margin(masks, mags)
    st0 = Stitcher(skip_weight=0.0)
    perms = np.asarray(st0.get_stitch(jnp.asarray(masks), jnp.asarray(mags)))
    # the corrupted boundary (windows 2-3) flips under adjacent-only
    # evidence — this is the failure mode the ensemble fixes
    assert perms[2].tolist() == [1, 0]
    assert perms[0].tolist() == [0, 1] and perms[3].tolist() == [0, 1]


def test_skip_evidence_overrides_corrupted_boundary():
    masks, mags = _band_masks()
    masks, mags = _corrupt_adjacent_margin(masks, mags)
    st = Stitcher(skip_weight=1.0)
    perms = np.asarray(st.get_stitch(jnp.asarray(masks), jnp.asarray(mags)))
    assert perms.tolist() == [[0, 1]] * 4, perms


def test_clean_decisions_unchanged_by_skip_evidence():
    masks, mags = _band_masks()
    # a genuinely flipped window: window 3+ estimates streams swapped
    masks[3:] = masks[3:, :, :, [1, 0, 2]]
    st0 = Stitcher(skip_weight=0.0)
    st1 = Stitcher(skip_weight=1.0)
    p0 = np.asarray(st0.get_stitch(jnp.asarray(masks), jnp.asarray(mags)))
    p1 = np.asarray(st1.get_stitch(jnp.asarray(masks), jnp.asarray(mags)))
    np.testing.assert_array_equal(p0, p1)
    assert p0[2].tolist() == [1, 0]  # real flip detected by both


def test_short_recordings_fall_back():
    masks, mags = _band_masks(n_win=2)
    st = Stitcher(skip_weight=1.0)
    perms = np.asarray(st.get_stitch(jnp.asarray(masks), jnp.asarray(mags)))
    assert perms.shape == (1, 2)


def test_three_speaker_viterbi_runs():
    rng = np.random.default_rng(0)
    masks = rng.uniform(size=(5, 150, 64, 4)).astype(np.float32)
    mags = rng.uniform(size=(5, 150, 64)).astype(np.float32)
    st = Stitcher(num_spk=3, skip_weight=1.0)
    perms = np.asarray(st.get_stitch(jnp.asarray(masks), jnp.asarray(mags)))
    assert perms.shape == (4, 3)
    # each row is a valid permutation of 0..2
    for row in perms:
        assert sorted(row.tolist()) == [0, 1, 2]


def test_full_stitch_call_with_skip_weight():
    masks, mags = _band_masks()
    masks, mags = _corrupt_adjacent_margin(masks, mags)
    st = Stitcher(skip_weight=1.0)
    streams = st(masks, mags)
    assert len(streams) == 3
    # stream 0 keeps the low band dominant (no downstream flip; the
    # corrupted frames themselves still carry swapped mask content, so
    # the ratio is finite rather than huge)
    s0 = np.asarray(streams[0])
    assert s0[:, 4:18].mean() > 2 * s0[:, 36:52].mean()
