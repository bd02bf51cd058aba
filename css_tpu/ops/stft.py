"""STFT / iSTFT as MXU matmuls.

The reference computes the analysis STFT as a conv1d with an rDFT kernel
(css/executor/feature.py:13-30: ``K = rfft(eye(N))[:frame_len] * hann``) and
uses torch.stft/istft (center=True) in the beamformer
(css/executor/beamformer.py:83-102,137-145). On TPU the natural formulation
is framing + a single (frame_len, 2*bins) matmul that rides the MXU; XLA
fuses the windowing into the matmul. Both centered (torch.stft-compatible)
and uncentered (conv-STFT-compatible) variants are provided so each call
site matches the reference numerics.

Canonical array layout in this framework is time-major ``(..., T, F)``;
callers that need the reference's ``(F, T)`` layout transpose at the edge.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def hann_window(n: int, periodic: bool = True, dtype=np.float32) -> np.ndarray:
    """Hann window matching torch.hann_window (periodic by default)."""
    if n == 1:
        return np.ones((1,), dtype)
    denom = n if periodic else n - 1
    i = np.arange(n)
    return (0.5 - 0.5 * np.cos(2.0 * math.pi * i / denom)).astype(dtype)


def num_fft_bins(frame_len: int, round_pow_of_two: bool = True) -> int:
    n_fft = 2 ** math.ceil(math.log2(frame_len)) if round_pow_of_two else frame_len
    return n_fft // 2 + 1


@functools.lru_cache(maxsize=None)
def stft_analysis_kernel(
    frame_len: int,
    round_pow_of_two: bool = True,
    window: str = "hann",
) -> np.ndarray:
    """(frame_len, 2*bins) real rDFT-analysis matrix, [real | imag] halves.

    frames @ kernel reproduces the reference conv-STFT
    (css/executor/feature.py:13-30): real[k] = sum_n w[n] x[n] cos(2pi nk/N),
    imag[k] = -sum_n w[n] x[n] sin(2pi nk/N).
    """
    n_fft = 2 ** math.ceil(math.log2(frame_len)) if round_pow_of_two else frame_len
    bins = n_fft // 2 + 1
    n = np.arange(frame_len, dtype=np.float64)[:, None]
    k = np.arange(bins, dtype=np.float64)[None, :]
    ang = -2.0 * math.pi * n * k / n_fft
    if window == "hann":
        w = hann_window(frame_len, dtype=np.float64)[:, None]
    elif window in (None, "rect", "ones"):
        w = np.ones((frame_len, 1), np.float64)
    else:
        raise ValueError(f"unknown window {window!r}")
    real = np.cos(ang) * w
    imag = np.sin(ang) * w  # == -sin(2pi nk/N) * w
    return np.concatenate([real, imag], axis=1).astype(np.float32)


@functools.lru_cache(maxsize=None)
def _istft_synthesis_kernel(frame_len: int, n_fft: int) -> np.ndarray:
    """(2*bins, n_fft) matrix: [real | imag] spectrum -> irfft time frame."""
    bins = n_fft // 2 + 1
    k = np.arange(bins, dtype=np.float64)[:, None]
    n = np.arange(n_fft, dtype=np.float64)[None, :]
    ang = 2.0 * math.pi * k * n / n_fft
    # irfft: x[n] = (1/N) * sum_k c_k * (re[k] cos - im[k] sin), c_k = 1 for
    # k in {0, N/2} else 2 (hermitian symmetry fold).
    scale = np.full((bins, 1), 2.0 / n_fft)
    scale[0] = 1.0 / n_fft
    if n_fft % 2 == 0:
        scale[-1] = 1.0 / n_fft
    real_part = np.cos(ang) * scale
    imag_part = -np.sin(ang) * scale
    kern = np.concatenate([real_part, imag_part], axis=0)  # (2*bins, n_fft)
    return kern[:, :frame_len].astype(np.float32)


def frame_signal(x: jax.Array, frame_len: int, hop: int) -> jax.Array:
    """(..., T) -> (..., num_frames, frame_len) sliding frames, no padding.

    Fast path when hop divides frame_len: build frame_len//hop shifted
    strided views and concatenate (pure reshapes/slices for XLA to fuse).
    """
    t = x.shape[-1]
    num_frames = (t - frame_len) // hop + 1
    if num_frames <= 0:
        raise ValueError(f"signal length {t} < frame_len {frame_len}")
    if frame_len % hop == 0:
        r = frame_len // hop
        usable = (num_frames + r - 1) * hop
        seg = x[..., :usable].reshape(*x.shape[:-1], num_frames + r - 1, hop)
        parts = [
            jax.lax.slice_in_dim(seg, i, i + num_frames, axis=seg.ndim - 2)
            for i in range(r)
        ]
        return jnp.concatenate(parts, axis=-1)
    idx = np.arange(num_frames)[:, None] * hop + np.arange(frame_len)[None, :]
    return x[..., idx]


def overlap_add(frames: jax.Array, hop: int, out_len: Optional[int] = None) -> jax.Array:
    """(..., num_frames, frame_len) -> (..., T) overlap-add synthesis."""
    num_frames, frame_len = frames.shape[-2], frames.shape[-1]
    total = (num_frames - 1) * hop + frame_len
    if frame_len % hop == 0:
        r = frame_len // hop
        # Split each frame into r hop-sized chunks; chunk j of frame i lands
        # at hop-slot i+j. Accumulate r shifted "diagonal" streams.
        chunks = frames.reshape(*frames.shape[:-1], r, hop)
        slots = num_frames + r - 1
        out = jnp.zeros((*frames.shape[:-2], slots, hop), frames.dtype)
        for j in range(r):
            out = out.at[..., j : j + num_frames, :].add(chunks[..., j, :])
        out = out.reshape(*frames.shape[:-2], slots * hop)
        out = out[..., :total]
    else:
        idx = np.arange(num_frames)[:, None] * hop + np.arange(frame_len)[None, :]
        out = jnp.zeros((*frames.shape[:-2], total), frames.dtype)
        out = out.at[..., idx.reshape(-1)].add(frames.reshape(*frames.shape[:-2], -1))
    if out_len is not None:
        if out_len > out.shape[-1]:
            out = jnp.pad(out, [(0, 0)] * (out.ndim - 1) + [(0, out_len - out.shape[-1])])
        else:
            out = out[..., :out_len]
    return out


def stft(
    x: jax.Array,
    frame_len: int = 512,
    hop: int = 256,
    *,
    center: bool = False,
    round_pow_of_two: bool = True,
    window: str = "hann",
    pad_mode: str = "reflect",
) -> jax.Array:
    """STFT of (..., T) -> complex64 (..., num_frames, bins), time-major.

    center=False matches the reference conv-STFT (feature.py:45-82);
    center=True matches torch.stft(center=True, pad_mode='reflect').
    """
    n_fft = 2 ** math.ceil(math.log2(frame_len)) if round_pow_of_two else frame_len
    if center:
        pad = n_fft // 2
        x = jnp.pad(
            x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)],
            mode=pad_mode if pad_mode != "zeros" else "constant",
        )
    frames = frame_signal(x, frame_len, hop)
    kern = jnp.asarray(stft_analysis_kernel(frame_len, round_pow_of_two, window))
    spec = frames @ kern  # (..., T, 2*bins)
    bins = spec.shape[-1] // 2
    return jax.lax.complex(spec[..., :bins], spec[..., bins:])


def stft_mag(x: jax.Array, frame_len: int = 512, hop: int = 256, **kw) -> jax.Array:
    s = stft(x, frame_len, hop, **kw)
    return jnp.abs(s)


def istft(
    spec: jax.Array,
    frame_len: int = 512,
    hop: int = 256,
    *,
    center: bool = False,
    length: Optional[int] = None,
    round_pow_of_two: bool = True,
    window: str = "hann",
) -> jax.Array:
    """Inverse STFT of complex (..., num_frames, bins) -> (..., T).

    torch.istft-compatible: per-frame irfft * window, overlap-add, divide by
    the summed squared-window envelope (NOLA normalization;
    css/executor/beamformer.py:83-102 relies on these semantics).
    """
    n_fft = 2 ** math.ceil(math.log2(frame_len)) if round_pow_of_two else frame_len
    num_frames = spec.shape[-2]
    ri = jnp.concatenate([spec.real, spec.imag], axis=-1)  # (..., T, 2*bins)
    kern = jnp.asarray(_istft_synthesis_kernel(frame_len, n_fft))
    if window == "hann":
        w = jnp.asarray(hann_window(frame_len))
    else:
        w = jnp.ones((frame_len,), jnp.float32)
    frames = (ri @ kern) * w  # (..., T, frame_len)
    sig = overlap_add(frames, hop)
    # window-envelope normalization
    env_frames = jnp.broadcast_to(w * w, (num_frames, frame_len))
    env = overlap_add(env_frames, hop)
    # guard partial-coverage edges: where the squared-window envelope is
    # near zero, reconstruction is undefined — output silence rather than
    # dividing masked-spectrum noise by ~0 (the reference relies on
    # torch.istft trimming these regions away)
    sig = jnp.where(env >= 1e-2, sig / jnp.maximum(env, 1e-2), 0.0)
    if center:
        # torch.istft semantics: trim the pad from BOTH sides first (the
        # tail beyond it has partial window coverage and a vanishing
        # envelope — keeping it produces huge division spikes on
        # OLA-inconsistent, e.g. masked, spectra), then zero-pad/truncate
        # to the requested length.
        pad = n_fft // 2
        sig = sig[..., pad : sig.shape[-1] - pad]
        if length is not None:
            if length > sig.shape[-1]:
                sig = jnp.pad(sig, [(0, 0)] * (sig.ndim - 1)
                              + [(0, length - sig.shape[-1])])
            else:
                sig = sig[..., :length]
    elif length is not None:
        if length > sig.shape[-1]:
            # the frame grid covers (T-1)*hop + frame_len samples, which
            # undershoots `length` whenever (length - frame_len) is not a
            # hop multiple (e.g. 3.0 s windows at 512/256) — pad the
            # remainder with silence like the centered branch does
            sig = jnp.pad(sig, [(0, 0)] * (sig.ndim - 1)
                          + [(0, length - sig.shape[-1])])
        else:
            sig = sig[..., :length]
    return sig
