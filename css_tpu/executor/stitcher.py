"""Mask stitcher: resolve speaker permutations across sliding windows.

TPU-native counterpart of css/executor/stitcher.py:4-110. The reference
loops over window boundaries in python and propagates the flip state with a
sequential scan (stitcher.py:55-60); here the whole thing is one jitted
program:

  * all boundary 2x2 similarity matrices at once (one vectorized reduction
    over (boundary, margin, freq));
  * the flip-state propagation is cumulative XOR — an ASSOCIATIVE scan,
    computed as prefix-sum mod 2, so it parallelizes (and can be sharded
    across chunked recordings, each shard exchanging only its boundary
    parity — SURVEY.md §5 "long-context" note);
  * winner-take-all and the overlap-average run vectorized.

Hardcoded to 2 speakers + 1 noise stream like the reference
(stitcher.py:31,42-49).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from css_tpu.ops.stft import overlap_add


class Stitcher:
    def __init__(self, eval_win: float = 2.4, eval_hop: float = 0.8,
                 fft_hop: int = 256, sr: int = 16000, wta_floor: float = 1e-4):
        self.margin = int(round((eval_win - eval_hop) * sr / fft_hop))
        self.hop_frames = int(eval_hop * sr / fft_hop)
        self.wta_floor = wta_floor
        self._stitch = jax.jit(self._stitch_impl)

    # masks: (B, T, F, 3) per window, mags: (B, T, F)
    def _stitch_impl(self, masks, mags):
        flips = self.get_stitch(masks, mags)
        return self.get_connect(flips, masks)

    def get_stitch(self, masks, mags):
        """Per-boundary flip decisions (stitcher.py:14-52).

        Returns bool (B-1,): True where streams swap across the boundary.
        """
        e = masks[..., :2] * mags[..., None]  # (B, T, F, 2)
        prev = e[:-1, -self.margin :]  # (B-1, M, F, 2)
        nxt = e[1:, : self.margin]  # (B-1, M, F, 2)
        # d[b, i, j] = sum sqrt|prev_j - next_i|
        d = jnp.sum(
            jnp.sqrt(jnp.abs(prev[..., None, :] - nxt[..., :, None])),
            axis=(1, 2))  # (B-1, i, j)
        sim0 = -(d[:, 0, 0] + d[:, 1, 1])
        sim1 = -(d[:, 0, 1] + d[:, 1, 0])
        return sim0 < sim1  # flip when the swapped pairing matches better

    def get_connect(self, flips, masks, valid=None):
        """Flip-state scan + WTA + overlap-average (stitcher.py:54-110).

        ``valid`` (B,) optionally marks real windows: padded windows (from
        sharded batching) contribute neither mask mass nor coverage count.
        Returns (res1, res2, noise), each (T_total, F) time-major.
        """
        # prefix XOR: state_n = parity of flips before window n
        state = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32),
             jnp.cumsum(flips.astype(jnp.int32)) % 2])  # (B,)
        sel = state[:, None, None].astype(bool)
        res1 = jnp.where(sel, masks[..., 1], masks[..., 0])
        res2 = jnp.where(sel, masks[..., 0], masks[..., 1])
        noise = masks[..., 2]
        # winner-take-all across the 3 streams per TF bin (stitcher.py:77-83)
        m = jnp.stack([res1, res2, noise], axis=-1)
        m_max = jnp.max(m, axis=-1, keepdims=True)
        m = jnp.where(m == m_max, m, jnp.asarray(self.wta_floor, m.dtype))
        if valid is not None:
            m = m * valid[:, None, None, None].astype(m.dtype)
        # overlap-average over windows with hop_frames (stitcher.py:85-110)
        # (B, T, F, 3) -> (F, 3, B, T) frames for overlap_add over T
        frames = jnp.transpose(m, (2, 3, 0, 1))
        summed = overlap_add(frames, self.hop_frames)  # (F, 3, T_total)
        ones = jnp.ones(m.shape[:2], m.dtype)  # (B, T)
        if valid is not None:
            ones = ones * valid[:, None].astype(m.dtype)
        count = overlap_add(ones, self.hop_frames)  # (T_total,)
        count = jnp.maximum(count, 1.0)
        avg = summed / count  # (F, 3, T_total)
        avg = jnp.transpose(avg, (2, 0, 1))  # (T_total, F, 3)
        return avg[..., 0], avg[..., 1], avg[..., 2]

    def __call__(self, masks, mags):
        """masks (B, T, F, 3), mags (B, T, F) -> 3 x (T_total, F)."""
        return self._stitch(jnp.asarray(masks), jnp.asarray(mags))
