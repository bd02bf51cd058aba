"""Fused Pallas masked-iSTFT kernel for TPU.

The masked resynthesis hot path (mask x spectrum -> irfft -> windowed
overlap-add; css/executor/beamformer.py:83-102 semantics) in one
VMEM-resident pass per batch row: the (T, 2*bins) masked spectrum hits the
MXU against the (2*bins, frame) synthesis matrix, frames are windowed and
overlap-added into a full-signal VMEM accumulator, and the precomputed
squared-window-envelope reciprocal is applied on the way out — no
intermediate frame matrix ever reaches HBM.

Uncentered analysis convention (matching css_tpu.ops.stft.stft
center=False); requires hop*2 == frame_len. The envelope guard mirrors
css_tpu.ops.stft.istft: samples with near-zero window coverage emit 0.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from css_tpu.ops.stft import _istft_synthesis_kernel, hann_window


@functools.lru_cache(maxsize=None)
def _synthesis_matrix(frame_len: int, n_fft: int) -> np.ndarray:
    """(2*bins, frame_len) [re|im] -> windowed time frame."""
    kern = _istft_synthesis_kernel(frame_len, n_fft)  # (2*bins, frame_len)
    return (kern * hann_window(frame_len)[None, :]).astype(np.float32)


@functools.lru_cache(maxsize=None)
def _envelope_recip(frame_len: int, hop: int, num_frames: int) -> np.ndarray:
    # pure numpy (called at trace time): summed squared-window envelope
    w2 = hann_window(frame_len).astype(np.float64) ** 2
    total = (num_frames - 1) * hop + frame_len
    env = np.zeros(total)
    for i in range(num_frames):
        env[i * hop : i * hop + frame_len] += w2
    return np.where(env >= 1e-2, 1.0 / np.maximum(env, 1e-2), 0.0).astype(
        np.float32)


_ROWS = 8  # batch rows per grid step (Mosaic sublane constraint)


def _istft_kernel(spec_ref, k_ref, env_ref, out_ref, *, t: int, hop: int):
    """spec_ref (ROWS, T, 2*bins); k_ref (2*bins, frame);
    env_ref (1, total); out_ref (ROWS, total)."""
    two_bins = spec_ref.shape[-1]
    frames = jnp.dot(spec_ref[:].reshape(_ROWS * t, two_bins), k_ref[:],
                     preferred_element_type=jnp.float32)  # (R*T, frame)
    # overlap-add for hop = frame/2: half j of frame i lands at slot i+j.
    # Expressed as zero-extended concats + one add (Mosaic has no
    # scatter-add lowering for .at[].add).
    half = frames.reshape(_ROWS, t, 2, hop)
    zero = jnp.zeros((_ROWS, 1, hop), jnp.float32)
    a = jnp.concatenate([half[:, :, 0], zero], axis=1)  # (R, t+1, hop)
    b = jnp.concatenate([zero, half[:, :, 1]], axis=1)
    acc = a + b
    out_ref[:] = acc.reshape(_ROWS, (t + 1) * hop) * env_ref[0][None]


@functools.partial(jax.jit, static_argnames=("frame_len", "hop", "interpret"))
def istft_pallas(spec: jax.Array, frame_len: int = 512, hop: int = 256,
                 interpret: bool = False) -> jax.Array:
    """Complex (B, T, bins) -> (B, (T+1)*hop) waveform (uncentered OLA)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if frame_len != 2 * hop:
        raise ValueError("pallas istft requires frame_len == 2*hop")
    b, t, bins = spec.shape
    n_fft = (bins - 1) * 2
    total = (t - 1) * hop + frame_len
    ri = jnp.concatenate([spec.real, spec.imag], axis=-1)  # (B, T, 2*bins)
    pad_b = (-b) % _ROWS
    if pad_b:
        ri = jnp.concatenate(
            [ri, jnp.zeros((pad_b, t, 2 * bins), ri.dtype)], axis=0)
    bp = b + pad_b
    kern = jnp.asarray(_synthesis_matrix(frame_len, n_fft))
    env = jnp.asarray(_envelope_recip(frame_len, hop, t))[None]  # (1, total)

    out = pl.pallas_call(
        functools.partial(_istft_kernel, t=t, hop=hop),
        out_shape=jax.ShapeDtypeStruct((bp, total), jnp.float32),
        grid=(bp // _ROWS,),
        in_specs=[
            pl.BlockSpec((_ROWS, t, 2 * bins), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * bins, frame_len), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, total), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_ROWS, total), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(ri, kern, env)
    return out[:b]
