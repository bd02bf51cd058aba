"""Mask stitcher: resolve speaker permutations across sliding windows.

TPU-native counterpart of css/executor/stitcher.py:4-110. The reference
loops over window boundaries in python and propagates a 2-speaker flip
state with a sequential scan (stitcher.py:55-60); here the whole thing is
one jitted program, generalized to K speakers (the reference hardcodes 2,
stitcher.py:31,42-49):

  * all boundary K x K energy-distance matrices at once (one vectorized
    reduction over (boundary, margin, freq));
  * the best permutation per boundary is a min over the K! static
    permutation table (the same gather trick as css_tpu.ops.pit);
  * the cross-window stream assignment composes boundary permutations
    with a lax.scan carrying a (K,) index state — for K=2 this reduces
    exactly to the reference's flip-parity propagation;
  * winner-take-all and the overlap-average run vectorized.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from css_tpu.ops.pit import permutations_array
from css_tpu.ops.stft import overlap_add


class Stitcher:
    def __init__(self, eval_win: float = 2.4, eval_hop: float = 0.8,
                 fft_hop: int = 256, sr: int = 16000, wta_floor: float = 1e-4,
                 num_spk: int = 2):
        self.margin = int(round((eval_win - eval_hop) * sr / fft_hop))
        self.hop_frames = int(eval_hop * sr / fft_hop)
        self.wta_floor = wta_floor
        self.num_spk = num_spk
        self._stitch = jax.jit(self._stitch_impl,
                               static_argnames=("soft",))

    # masks: (B, T, F, K+noise) per window, mags: (B, T, F)
    def _stitch_impl(self, masks, mags, soft=False):
        perms = self.get_stitch(masks, mags)
        return self.get_connect(perms, masks, soft=soft)

    def _margin_costs(self, e, margin, gap):
        """Per-boundary permutation costs from a shared overlap region.

        e (B, T, F, K) masked energies; windows b and b+gap share
        ``margin`` frames (window b's tail vs window b+gap's head).
        Returns (B-gap, K!) where entry [b, p] scores routing window
        b+gap's local stream i to window b's local stream p[i].
        """
        k = self.num_spk
        prev = e[:-gap, -margin:]  # (B-gap, M, F, K)
        nxt = e[gap:, :margin]  # (B-gap, M, F, K)
        # d[b, i, j] = sum sqrt|prev_j - next_i| (stitcher.py:34-40)
        d = jnp.sum(
            jnp.sqrt(jnp.abs(prev[..., None, :] - nxt[..., :, None])),
            axis=(1, 2))  # (B-gap, now_i, prev_j)
        table = jnp.asarray(permutations_array(k))  # (K!, K), row 0 identity
        # cost of permutation p: sum_i d[i, p[i]]
        return jnp.sum(
            jnp.take_along_axis(d[:, None], table[None, :, :, None],
                                axis=-1)[..., 0],
            axis=-1)  # (B-gap, K!)

    def get_stitch(self, masks, mags):
        """Per-boundary permutation decisions (stitcher.py:14-52).

        Returns int32 (B-1, K): row b maps window b+1's local stream i to
        window b's local stream perm[b, i]. For K=2 a swap row is [1, 0]
        (the reference's flip).

        (A skip-window Viterbi chain over boundary permutations lived
        here through round 3; it measured no-op-to-negative on the
        failing material — those boundaries have a silent speaker in the
        overlap, so no boundary evidence exists at ANY offset — and was
        deleted per the settle-on-hardware rule. Session-level
        re-anchoring, executor/reanchor.py, is the mechanism that
        actually repairs mis-stitched boundaries.)
        """
        k = self.num_spk
        e = masks[..., :k] * mags[..., None]  # (B, T, F, K)
        costs = self._margin_costs(e, self.margin, 1)  # (B-1, K!)
        table = jnp.asarray(permutations_array(k))
        # argmin with ties resolved toward the earliest row — identity
        # first, matching the reference's >= tie-break (stitcher.py:45)
        return table[jnp.argmin(costs, axis=-1)]  # (B-1, K)

    def get_connect(self, perms, masks, valid=None, soft=False):
        """Permutation composition scan + WTA + overlap-average
        (stitcher.py:54-110).

        ``valid`` (B,) optionally marks real windows: padded windows (from
        sharded batching) contribute neither mask mass nor coverage count.
        ``soft=True`` skips the winner-take-all flooring — routed soft
        masks for consumers that need honest per-bin statistics (e.g.
        MVDR spatial-covariance estimation, where WTA's 1e-4 floors
        corrupt the SCMs).
        Returns K+1 arrays (speaker streams + noise), each (T_total, F)
        time-major.
        """
        k = self.num_spk
        b = masks.shape[0]

        # m_n[s] = local mask index of global stream s at window n;
        # boundary perm p maps now-local i -> prev-local p[i], so
        # m_n = argsort(p_n)[m_{n-1}]
        def step(m_prev, p):
            q = jnp.argsort(p)  # prev-local j -> now-local q[j]
            m_now = q[m_prev]
            return m_now, m_now

        m0 = jnp.arange(k, dtype=jnp.int32)
        _, m_rest = jax.lax.scan(step, m0, perms.astype(jnp.int32))
        assign = jnp.concatenate([m0[None], m_rest], axis=0)  # (B, K)

        # route local masks to global streams: stream s of window n is
        # masks[n, ..., assign[n, s]]
        routed = jnp.take_along_axis(
            masks[..., : k], assign[:, None, None, :], axis=-1)  # (B,T,F,K)
        noise = masks[..., k:]  # (B, T, F, n_noise)
        m = jnp.concatenate([routed, noise], axis=-1)
        if not soft:
            # winner-take-all across streams per TF bin (stitcher.py:77-83)
            m_max = jnp.max(m, axis=-1, keepdims=True)
            m = jnp.where(m == m_max, m, jnp.asarray(self.wta_floor,
                                                     m.dtype))
        if valid is not None:
            m = m * valid[:, None, None, None].astype(m.dtype)
        # overlap-average over windows with hop_frames (stitcher.py:85-110)
        frames = jnp.transpose(m, (2, 3, 0, 1))  # (F, S, B, T)
        summed = overlap_add(frames, self.hop_frames)  # (F, S, T_total)
        ones = jnp.ones(m.shape[:2], m.dtype)  # (B, T)
        if valid is not None:
            ones = ones * valid[:, None].astype(m.dtype)
        count = overlap_add(ones, self.hop_frames)  # (T_total,)
        count = jnp.maximum(count, 1.0)
        avg = jnp.transpose(summed / count, (2, 0, 1))  # (T_total, F, S)
        return tuple(avg[..., s] for s in range(avg.shape[-1]))

    def __call__(self, masks, mags, soft=False):
        """masks (B, T, F, K+noise), mags (B, T, F) -> K+1 x (T_total, F)."""
        return self._stitch(jnp.asarray(masks), jnp.asarray(mags),
                            soft=soft)
