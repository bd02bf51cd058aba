"""Held-out quality probe for checkpoint selection.

BASELINE.md (round 2) measured that validation MSE is ANTI-correlated
with held-out separation quality: the ``--keep-best`` checkpoint picked
by val-MSE ranked worst on the 8-session held-out protocol. The shipped
selection criterion must track what users actually score — SI-SNRi of
the full pipeline on held-out speakers.

This probe is that criterion, cheap enough to run every epoch: a few
short fixed synthetic sessions (held-out corpus seed, disjoint from
every training seed), pushed through the REAL chunked pipeline as ONE
jitted program with the parameters as an argument (so a new checkpoint
never recompiles). Three modes cover every trained model family
(round-3 VERDICT: the val-loss fallback silently selected the worst
checkpoints for exactly the models trained most):

  mask     1ch STFT-mask models (Conformer/BLSTM): windows -> features
           -> forward -> stitcher (permutation scan + WTA + overlap-
           average) -> full-recording masked resynthesis.
  spatial  7ch models (--spatialize-channels): far-field sessions on
           the 7-mic array (data/spatial.py), [ch0 magnitude, IPD]
           features, same stitch, masked resynthesis on channel 0.
  time     waveform models (ConvTasNet): windowed forward + per-window
           PIT SI-SNRi (no stitcher — selection signal, not stitching).

The resynthesis is plain spectral masking on the uncentered
full-recording STFT. Window w's frame j lands at global frame
w*hop_frames + j under the uncentered convention, so the stitched mask
timeline aligns bin-for-bin with the recording STFT — no windowed
proceed-margin assembly needed (that machinery is for the MVDR path,
css/executor/beamformer.py:104-118).

Reference counterpart: none — the reference selects checkpoints by
validation loss only (train.py:297-301) and measures quality out of
repo via an external ASR.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from css_tpu.executor.stitcher import Stitcher
from css_tpu.executor.windowing import unfold
from css_tpu.ops.features import FeatureExtractor
from css_tpu.ops.stft import istft, stft


def _si_snr(est, ref, eps=1e-8):
    """Scale-invariant SNR (dB); est/ref (..., T), mean-centered."""
    est = est - jnp.mean(est, axis=-1, keepdims=True)
    ref = ref - jnp.mean(ref, axis=-1, keepdims=True)
    proj = (jnp.sum(est * ref, -1, keepdims=True)
            / (jnp.sum(ref * ref, -1, keepdims=True) + eps)) * ref
    noise = est - proj
    return 10.0 * jnp.log10(jnp.sum(proj**2, -1)
                            / (jnp.sum(noise**2, -1) + eps) + eps)


def _draw_azimuths(rng, k: int, min_separation_deg: float) -> np.ndarray:
    """(K,) azimuths at least min_separation apart (distinct seats)."""
    while True:
        cand = rng.uniform(0.0, 360.0, k)
        d = np.abs(cand[:, None] - cand[None, :])
        d = np.minimum(d, 360.0 - d)
        if k == 1 or d[np.triu_indices(k, 1)].min() >= min_separation_deg:
            return cand


class HeldOutProbe:
    """Per-epoch held-out SI-SNRi through the separation pipeline.

    Sessions are generated once at construction (fixed material, fixed
    shapes); ``__call__(variables)`` is a single compiled program.
    ``mode`` selects the model family: "mask" (1ch STFT-mask),
    "spatial" (7ch IPD-featured mask models), "time" (waveform models).
    """

    def __init__(self, corpus, *, sessions: int = 4, session_sec: float = 12.0,
                 seed: int = 123, sr: int = 16000, eval_win: float = 2.4,
                 eval_hop: float = 0.8, frame_len: int = 512,
                 frame_hop: int = 256, num_spk: int = 2,
                 wta_floor: float = 1e-4, overlap_frac: float = 0.3,
                 mode: str = "mask", ipd_index: Optional[str] = None,
                 noise_level: float = 0.003,
                 min_separation_deg: float = 20.0,
                 stratify_f0: bool = False):
        from css_tpu.data.sessions import make_session

        if mode not in ("mask", "spatial", "time"):
            raise ValueError(f"unknown probe mode {mode!r}")
        if mode == "spatial" and not ipd_index:
            raise ValueError("spatial probe needs ipd_index")
        rng = np.random.default_rng(seed)
        self.sr = sr
        self.mode = mode
        win = int(eval_win * sr) + 256  # separator window (separator.py:67)
        hop = int(eval_hop * sr)
        # stratify_f0: pick session speaker pairs evenly across the
        # |f0_a - f0_b| spectrum INCLUDING the closest pair — the 8x60 s
        # protocol (scripts/quality_eval.py --stratify-f0) is dominated
        # by close-f0 sessions the random 2-of-6 draw rarely samples;
        # round 4 measured probe/protocol rank INVERSIONS (g2ft probed
        # +9.32 best-ever yet protocolled +1.37 — BASELINE.md) on
        # exactly those. Opt-in (k=2 only) to keep shipped recipes'
        # selection bit-identical.
        pairs = [None] * sessions
        if stratify_f0:
            if num_spk != 2:
                raise ValueError("stratify_f0 probe supports num_spk=2")
            f0 = corpus.f0_by_speaker
            ranked = sorted(
                ((a, b) for i, a in enumerate(corpus.speakers)
                 for b in corpus.speakers[i + 1:]),
                key=lambda p: abs(f0[p[0]] - f0[p[1]]))
            idx = np.linspace(0, len(ranked) - 1, sessions).round()
            pairs = [ranked[int(j)] for j in idx]
        mixes, refs, windows, ref_windows = [], [], [], []
        for si in range(sessions):
            mix, srcs = make_session(corpus, rng, session_sec, sr=sr,
                                     overlap_frac=overlap_frac,
                                     num_spk=num_spk, pair=pairs[si])
            if mode == "spatial":
                from css_tpu.data.spatial import spatial_session

                az = _draw_azimuths(rng, num_spk, min_separation_deg)
                mix = spatial_session(srcs, az, noise_level=noise_level,
                                      seed=int(rng.integers(2**31)))  # (7, T)
            # pad so sliding windows cover the whole session (pipeline.py)
            total = mix.shape[-1]
            n_win = max(1, -(-(total - win) // hop) + 1)
            needed = (n_win - 1) * hop + win
            pad = [(0, 0)] * (mix.ndim - 1) + [(0, max(0, needed - total))]
            mix_p = np.pad(mix, pad)
            mixes.append(mix_p)
            refs.append(srcs)
            windows.append(unfold(mix_p, win, hop))  # (W, [C,] win)
            if mode == "time":
                srcs_p = np.pad(srcs, [(0, 0), (0, max(0, needed - total))])
                ref_windows.append(unfold(srcs_p, win, hop))  # (W, K, win)
        self.total = int(refs[0].shape[-1])
        self.mixes = jnp.asarray(np.stack(mixes))      # (S, Tp) | (S, 7, Tp)
        self.refs = jnp.asarray(np.stack(refs))        # (S, K, T)
        self.windows = jnp.asarray(np.stack(windows))  # (S, W, [C,] win)
        self.ref_windows = (jnp.asarray(np.stack(ref_windows))
                            if mode == "time" else None)
        self.features = FeatureExtractor(
            frame_len, frame_hop,
            ipd_index=ipd_index if mode == "spatial" else None)
        self.stitcher = Stitcher(eval_win=eval_win, eval_hop=eval_hop,
                                 fft_hop=frame_hop, sr=sr,
                                 wta_floor=wta_floor, num_spk=num_spk)
        self.frame_len, self.frame_hop = frame_len, frame_hop
        self.num_spk = num_spk
        self._fn: Optional[callable] = None

    def _session_si_snri(self, model, variables, windows, mix, refs):
        """Masking-pipeline SI-SNRi for one session; ``mix`` is (Tp,) for
        1ch or (7, Tp) for spatial (resynthesis/baseline use channel 0,
        which IS the dry-mixture image — data/spatial.py)."""
        mag, f, _ = self.features(windows)
        out = model.apply(variables, f, train=False)
        masks = out[1] if isinstance(out, tuple) else out
        masks = jnp.minimum(masks, 1.0)
        stitched = self.stitcher._stitch_impl(masks, mag)
        mix0 = mix[0] if mix.ndim == 2 else mix
        spec = stft(mix0[None], self.frame_len, self.frame_hop,
                    center=False)[0]                      # (Tf, F)
        t = min(spec.shape[0], stitched[0].shape[0])
        ests = [istft((stitched[s][:t] * spec[:t])[None], self.frame_len,
                      self.frame_hop, center=False,
                      length=self.total)[0]
                for s in range(self.num_spk)]
        ests = jnp.stack(ests)                            # (K, T)
        refs = refs[:, : self.total]
        # PIT SI-SNR over the K! output/reference assignments
        from css_tpu.ops.pit import permutations_array

        table = permutations_array(self.num_spk)          # (K!, K)
        cand = jnp.stack([
            jnp.mean(_si_snr(ests[np.asarray(p)], refs)) for p in table])
        base = jnp.mean(_si_snr(jnp.broadcast_to(mix0[: self.total],
                                                 refs.shape), refs))
        return jnp.max(cand) - base

    def _session_time_si_snri(self, model, variables, windows, ref_windows):
        """Per-window PIT SI-SNRi for waveform models: forward each
        window, best-permutation SI-SNR vs the aligned reference windows,
        improvement over the unprocessed mixture window."""
        out = model.apply(variables, windows, train=False)
        ests = out[0] if isinstance(out, tuple) else out  # (W, K, win)
        from css_tpu.ops.pit import permutations_array

        table = permutations_array(self.num_spk)
        cand = jnp.stack([
            jnp.mean(_si_snr(ests[:, np.asarray(p)], ref_windows), axis=-1)
            for p in table])                              # (K!, W)
        best = jnp.max(cand, axis=0)                      # (W,)
        base = jnp.mean(_si_snr(
            jnp.broadcast_to(windows[:, None], ref_windows.shape),
            ref_windows), axis=-1)                        # (W,)
        return jnp.mean(best - base)

    def __call__(self, model, variables) -> float:
        """Mean held-out SI-SNRi (dB) of ``variables`` over the sessions."""
        if self._fn is None:
            if self.mode == "time":
                def fn(variables, windows, ref_windows):
                    vals = jax.lax.map(
                        lambda a: self._session_time_si_snri(
                            model, variables, *a),
                        (windows, ref_windows))
                    return jnp.mean(vals)
            else:
                def fn(variables, windows, mixes, refs):
                    vals = jax.lax.map(
                        lambda a: self._session_si_snri(model, variables, *a),
                        (windows, mixes, refs))
                    return jnp.mean(vals)
            self._fn = jax.jit(fn)
        if self.mode == "time":
            return float(self._fn(variables, self.windows, self.ref_windows))
        return float(self._fn(variables, self.windows, self.mixes,
                              self.refs))
