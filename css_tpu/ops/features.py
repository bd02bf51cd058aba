"""Spectral & spatial feature extraction (magnitude, MVN, IPD).

TPU-native counterpart of css/executor/feature.py:85-175. Feature
extraction runs on-device inside the same jit program as the model forward,
so raw waveforms are all that cross the host->device boundary (the reference
computed features on CPU in dataloader workers / the ONNX driver).

Canonical layout is time-major (..., T, F).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from css_tpu.ops import stft as stft_ops

EPSILON = float(np.finfo(np.float32).eps)


def mvn(x: jax.Array, axis: int = -2, eps: float = EPSILON) -> jax.Array:
    """Mean-variance normalization with torch-parity unbiased std.

    The reference normalizes with torch.std (Bessel-corrected, ddof=1):
    models normalize over time (conformer.py:95, blstm.py:80), the feature
    extractor over the frame axis (feature.py:171).
    """
    mean = jnp.mean(x, axis=axis, keepdims=True)
    n = x.shape[axis]
    var = jnp.sum(jnp.square(x - mean), axis=axis, keepdims=True) / max(n - 1, 1)
    return (x - mean) / (jnp.sqrt(var) + eps)


def cumulative_mvn(x: jax.Array, carry=None, eps: float = EPSILON):
    """Causal MVN over the time axis (-2): frame t is normalized by the
    running per-bin statistics of frames [0..t] — the streamable
    counterpart of `mvn` (same Bessel-corrected ddof=1 variance; the
    reference's only causal normalizer is ConvTasNet's CumulativeLayerNorm,
    conv_tasnet.py:200-222).

    ``carry`` is ``(count, sum, sumsq)`` from a previous chunk (count
    scalar; sum/sumsq shaped like one frame) or None to start fresh.
    Returns ``(normalized, new_carry)`` so chained chunk calls equal one
    full-utterance call.
    """
    t = x.shape[-2]
    if carry is None:
        count0 = jnp.zeros((), x.dtype)
        zeros = jnp.zeros(x.shape[:-2] + x.shape[-1:], x.dtype)
        carry = (count0, zeros, zeros)
    count0, sum0, sumsq0 = carry
    n = count0 + jnp.arange(1, t + 1, dtype=x.dtype)  # (T,)
    n = n.reshape((1,) * (x.ndim - 2) + (t, 1))
    csum = sum0[..., None, :] + jnp.cumsum(x, axis=-2)
    csumsq = sumsq0[..., None, :] + jnp.cumsum(jnp.square(x), axis=-2)
    mean = csum / n
    var = jnp.maximum(csumsq - n * jnp.square(mean), 0.0) / jnp.maximum(
        n - 1.0, 1.0)
    out = (x - mean) / (jnp.sqrt(var) + eps)
    new_carry = (count0 + t, csum[..., -1, :], csumsq[..., -1, :])
    return out, new_carry


def parse_ipd_index(ipd_index: str) -> Tuple[np.ndarray, np.ndarray]:
    """'1,0;2,0;...' -> (left_idx, right_idx) arrays (feature.py:95-103)."""
    pairs = [tuple(map(int, p.split(","))) for p in ipd_index.split(";")]
    left = np.asarray([p[0] for p in pairs], np.int32)
    right = np.asarray([p[1] for p in pairs], np.int32)
    return left, right


def ipd(phase: jax.Array, left: np.ndarray, right: np.ndarray) -> jax.Array:
    """Inter-channel phase difference with mean normalization.

    phase: (..., C, T, F) -> ipd: (..., M, T, F), mirroring feature.py:105-134
    (mean re-centering in the cos/sin domain over the time axis).
    """
    dif = jnp.take(phase, left, axis=-3) - jnp.take(phase, right, axis=-3)
    yr = jnp.cos(dif)
    yi = jnp.sin(dif)
    yrm = jnp.mean(yr, axis=-2, keepdims=True)
    yim = jnp.mean(yi, axis=-2, keepdims=True)
    return jnp.arctan2(yi - yim, yr - yrm)


class FeatureExtractor:
    """STFT magnitude (+MVN) and optional IPD features.

    Mirrors css/executor/feature.py:137-175: STFT per channel; magnitude of
    the first channel, clamped at eps, MVN over frames; IPD features from
    the multi-channel phase concatenated on the feature axis.
    """

    def __init__(
        self,
        frame_len: int = 512,
        frame_hop: int = 256,
        round_pow_of_two: bool = True,
        ipd_index: Optional[str] = None,
    ):
        self.frame_len = frame_len
        self.frame_hop = frame_hop
        self.round_pow_of_two = round_pow_of_two
        self.num_bins = stft_ops.num_fft_bins(frame_len, round_pow_of_two)
        if ipd_index:
            self.ipd_left, self.ipd_right = parse_ipd_index(ipd_index)
            self.feature_dim = self.num_bins * (1 + len(self.ipd_left))
        else:
            self.ipd_left = self.ipd_right = None
            self.feature_dim = self.num_bins

    def __call__(self, x: jax.Array) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """x: (B, T) or (B, C, T) waveform.

        Returns (mag, feats, spec):
          mag:   (B, T_frames, F) first-channel magnitude
          feats: (B, T_frames, F') MVN magnitude [+ IPD]
          spec:  (B[, C], T_frames, F) complex spectrum

        (A fused Pallas framing+rDFT+magnitude kernel lived here through
        round 2; the round-3 hardware sweep measured it at 0.88x the XLA
        matmul formulation, which now wins outright — deleted per the
        no-dead-kernel rule. The fused masked-iSTFT kernel, which wins
        2.7x, remains in ops/istft_pallas.py.)
        """
        spec = stft_ops.stft(
            x, self.frame_len, self.frame_hop,
            center=False, round_pow_of_two=self.round_pow_of_two,
        )
        multi = spec.ndim == 4
        mag = jnp.abs(spec[:, 0] if multi else spec)
        f = jnp.maximum(mag, EPSILON)
        f = mvn(f, axis=-2)
        if self.ipd_left is not None:
            if not multi:
                raise ValueError("IPD features need multi-channel input")
            phase = jnp.arctan2(spec.imag, spec.real)
            ip = ipd(phase, self.ipd_left, self.ipd_right)  # (B, M, T, F)
            b, m, t, fbins = ip.shape
            # (B, T, M*F): frequency-major per pair, matching the reference's
            # N x (M F) x T flatten (feature.py:133).
            ip = jnp.transpose(ip, (0, 2, 1, 3)).reshape(b, t, m * fbins)
            f = jnp.concatenate([f, ip], axis=-1)
        return mag, f, spec
