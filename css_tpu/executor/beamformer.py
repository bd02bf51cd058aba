"""Continuous beamformer: stitched masks + waveform -> separated audio.

TPU-native counterpart of css/executor/beamformer.py:7-183. All windows of
a recording are beamformed as ONE jitted XLA program (batched complex
7x7 solves) instead of a python loop over batches; the overlap-add margin
logic is a clean partition of the output timeline, fixing the reference's
double-counted boundary window (beamformer.py:57 ``batch_end+1`` —
SURVEY.md §2.1 notes the shared hop-region is overlap-added twice).

Beamformer types:
  * "souden_mvdr" — masked Souden MVDR (reference default,
    conf/config_1ch.yaml:21). NOTE for D=1 this degenerates to an energy
    rescale of the mixture, exactly like the reference.
  * "masking" — plain spectral masking resynthesis (the sane 1ch path).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from css_tpu.executor.windowing import unfold
from css_tpu.ops import stft as stft_ops
from css_tpu.ops.mvdr import souden_mvdr


class Beamformer:
    def __init__(
        self,
        bf_type: str = "souden_mvdr",
        sr: int = 16000,
        n_fft: int = 512,
        hop_length: int = 256,
        eval_win: float = 2.4,
        eval_hop: float = 0.8,
        proceed_margin: float = 2.0,
        rescale: bool = True,
        dedup_db: float = 15.0,
        dedup_floor_db: float = -40.0,
        extra_samples: int = 256,
        diag_loading: float = 1e-15,
        mask_shift: int = 1,
        mvdr_noise: str = "noise",
    ):
        # accept the reference's asteroid class names (conf/config_1ch.yaml:21)
        # so every entry point — offline pipeline, streaming, sharded —
        # normalizes identically
        if "mvdr" in bf_type.lower():
            bf_type = "souden_mvdr"
        elif "mask" in bf_type.lower():
            bf_type = "masking"
        self.bf_type = bf_type
        self.sr = sr
        self.n_fft = n_fft
        self.hop_length = hop_length
        self.win = int(eval_win * sr) + extra_samples
        self.hop = int(eval_hop * sr)
        self.mask_win = int(eval_win * sr / hop_length)
        self.mask_hop = int(eval_hop * sr / hop_length)
        self.margin = int(proceed_margin * sr)
        self.rescale = rescale
        self.dedup_db = dedup_db
        self.dedup_floor = 10.0 ** (dedup_floor_db / 20.0)
        self.diag_loading = diag_loading
        self.mask_shift = int(mask_shift)
        # distortion-SCM mask for the MVDR path:
        #   "noise"    — the stitched noise stream only (reference
        #                semantics, beamformer.py:59,151-152: both streams
        #                share ONE noise SCM, so the beam never nulls the
        #                competing speaker);
        #   "residual" — noise + every OTHER speaker's mask: the
        #                interferer enters the distortion statistics and
        #                the Souden solve places a spatial null on it.
        if mvdr_noise not in ("noise", "residual"):
            raise ValueError(f"mvdr_noise must be 'noise' or 'residual', "
                             f"got {mvdr_noise!r}")
        self.mvdr_noise = mvdr_noise
        self._process = jax.jit(self._process_impl)

    # ------------------------------------------------------------------ core
    def _align_mask(self, mask, t_spec):
        """Masks were estimated on UNCENTERED frames (conv-STFT,
        separator path); the beamformer STFT is CENTERED, so uncentered
        frame t (centered at sample t*hop + frame/2) corresponds to
        centered frame t+1. Shift by `mask_shift` (default 1) and
        edge-replicate to cover all centered frames. The default is
        quality-validated, not just a shape fix: on oracle-mask far-field
        sessions (scripts/spatial_quality_eval.py) shift 1 beats 0 and 2
        for both the masking and MVDR paths (see BASELINE.md round-2
        table)."""
        t_mask = mask.shape[1]
        s = self.mask_shift
        parts = ([jnp.repeat(mask[:, :1], s, axis=1), mask] if s > 0
                 else [mask])
        if t_spec > t_mask + s:
            parts.append(jnp.repeat(mask[:, -1:], t_spec - t_mask - s,
                                    axis=1))
        return jnp.concatenate(parts, axis=1)[:, :t_spec]

    def _beamform_windows(self, spec, speech_mask, noise_mask):
        """spec (B, D, T', F) complex; masks (B, T, F) -> (B, T', F)."""
        t = spec.shape[2]
        speech_mask = self._align_mask(speech_mask, t)
        noise_mask = self._align_mask(noise_mask, t)
        if self.bf_type == "masking":
            out = speech_mask * spec[:, 0]
        elif self.bf_type == "souden_mvdr":
            out = souden_mvdr(spec, speech_mask, noise_mask,
                              diag_loading=self.diag_loading)
        else:
            raise ValueError(f"unknown beamformer type {self.bf_type!r}")
        if self.rescale:
            # scale output energy to the masked-ch0 energy
            # (beamformer.py:165-183)
            masked = speech_mask * spec[:, 0]
            masked_e = jnp.sqrt(jnp.mean(jnp.abs(masked) ** 2, axis=(1, 2),
                                         keepdims=True))
            out_e = jnp.sqrt(jnp.mean(jnp.abs(out) ** 2, axis=(1, 2),
                                      keepdims=True))
            out = out / jnp.maximum(out_e, 1e-12) * masked_e
        return out

    def _process_impl(self, wav_windows, speaker_masks, noise_mask):
        """wav_windows (B, D, N); speaker_masks (B, K, T, F);
        noise_mask (B, T, F) -> (B, K, N) wavs."""
        n = wav_windows.shape[-1]
        k = speaker_masks.shape[1]
        if self.bf_type == "masking":
            # uncentered analysis: frame t covers [t*hop, t*hop+frame) —
            # EXACTLY the convention the masks were estimated under
            # (separator conv-STFT), so no cross-convention alignment;
            # frame count (N-frame)/hop+1 matches the mask windows and the
            # synthesis length (T+1)*hop == N
            spec = stft_ops.stft(wav_windows, self.n_fft, self.hop_length,
                                 center=False)  # (B, D, T, F)
            t = min(spec.shape[2], speaker_masks.shape[2])
            outs = speaker_masks[:, :, :t] * spec[:, None, 0, :t]  # (B,K,T,F)
            outs = self._dedup(outs)
            b = outs.shape[0]
            wavs = self._masked_istft(
                outs.reshape(b * k, *outs.shape[2:]), n)
            return wavs.reshape(b, k, -1)
        spec = stft_ops.stft(wav_windows, self.n_fft, self.hop_length,
                             center=True)  # (B, D, T', F)
        def _distortion(i):
            if self.mvdr_noise == "residual":
                others = (jnp.sum(speaker_masks, axis=1)
                          - speaker_masks[:, i])
                return jnp.minimum(noise_mask + others, 1.0)
            return noise_mask
        outs = jnp.stack(
            [self._beamform_windows(spec, speaker_masks[:, i],
                                    _distortion(i))
             for i in range(k)], axis=1)  # (B, K, T, F)
        outs = self._dedup(outs)
        b = outs.shape[0]
        wavs = stft_ops.istft(outs.reshape(b * k, *outs.shape[2:]),
                              self.n_fft, self.hop_length, center=True,
                              length=n)
        return wavs.reshape(b, k, -1)

    def _dedup(self, s):
        """Cross-stream dedup: duck streams >dedup_db below the loudest
        (beamformer.py:68-80, pairwise in the 2-stream reference)."""
        pow_db = 10.0 * jnp.log10(
            jnp.sum(jnp.abs(s) ** 2, axis=(2, 3)) + 1e-30)  # (B, K)
        s_abs = jnp.abs(s)
        gain = s_abs / jnp.maximum(jnp.max(s_abs, axis=1, keepdims=True),
                                   1e-30)
        ducked = jnp.maximum(gain, self.dedup_floor) * s
        loudest = jnp.max(pow_db, axis=1, keepdims=True)
        duck = (loudest - pow_db > self.dedup_db)[:, :, None, None]
        return jnp.where(duck, ducked, s)

    def _masked_istft(self, spec, n):
        """Uncentered synthesis; fused Pallas kernel on TPU."""
        import jax

        if (jax.default_backend() in ("tpu", "axon")
                and self.n_fft == 2 * self.hop_length):
            from css_tpu.ops.istft_pallas import istft_pallas

            wav = istft_pallas(spec, self.n_fft, self.hop_length)
        else:
            wav = stft_ops.istft(spec, self.n_fft, self.hop_length,
                                 center=False)
        if wav.shape[-1] < n:
            wav = jnp.pad(wav, [(0, 0)] * (wav.ndim - 1)
                          + [(0, n - wav.shape[-1])])
        return wav[..., :n]

    # ------------------------------------------------------------- assembly
    def _assemble(self, wavs: np.ndarray, total: int) -> np.ndarray:
        """Stitch per-window wavs into the timeline via the proceed-margin
        partition (beamformer.py:104-118, minus the double-count bug)."""
        out = np.zeros(total, np.float32)
        b = wavs.shape[0]
        if b == 1:  # single window covers the whole (short) recording
            n = min(total, wavs.shape[1])
            out[:n] = wavs[0, :n]
            return out
        for i in range(b):
            st = i * self.hop
            if i == 0:
                seg = wavs[0, : self.margin]
                out[: self.margin] = seg[: max(0, min(self.margin, total))]
            elif i == b - 1:
                lo = st + self.margin - self.hop
                seg = wavs[i, self.margin - self.hop :]
                out[lo : lo + len(seg)] = seg[: max(0, total - lo)]
            else:
                lo = st + self.margin - self.hop
                hi = st + self.margin
                out[lo:hi] = wavs[i, self.margin - self.hop : self.margin]
        return out

    def continuous_process(self, wav: np.ndarray, masks):
        """wav (D, T) or (T,); masks: K+1 stitched (T_frames, F) masks
        (K speaker streams, last one noise).

        Returns K waveforms, each (T,), peak-normalized to 0.9
        (beamformer.py:122-123).
        """
        wav = np.asarray(wav, np.float32)
        if wav.ndim == 1:
            wav = wav[None]
        total = wav.shape[-1]
        wav_windows = unfold(wav, self.win, self.hop)  # (B, D, N)
        mask_windows = [
            unfold(np.asarray(m, np.float32).T, self.mask_win, self.mask_hop)
            for m in masks
        ]  # each (B, F, Tw)
        b = min([wav_windows.shape[0]] + [mw.shape[0] for mw in mask_windows])
        wav_windows = wav_windows[:b]
        tw = [np.transpose(mw[:b], (0, 2, 1)) for mw in mask_windows]
        speaker_masks = np.stack(tw[:-1], axis=1)  # (B, K, Tw, F)
        noise_mask = tw[-1]
        wavs = self._process(jnp.asarray(wav_windows),
                             jnp.asarray(speaker_masks),
                             jnp.asarray(noise_mask))  # (B, K, N)
        wavs = np.asarray(wavs)
        outs = []
        for s in range(wavs.shape[1]):
            res = self._assemble(wavs[:, s], total)
            outs.append(res * 0.9 / max(np.abs(res).max(), 1e-12))
        return tuple(outs)
