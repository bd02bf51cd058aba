"""Fused Pallas STFT-magnitude kernel for TPU.

The XLA formulation (css_tpu.ops.stft) materializes the overlapped frame
matrix in HBM (2x the signal size for hop = frame/2) before the rDFT
matmul. This kernel fuses framing + windowed-rDFT matmul + magnitude into
one VMEM-resident pass per tile: the raw signal block is loaded once, the
frame matrix is built in-register from two shifted views, the
(8*frames, 512) x (512, 2*bins) dot rides the MXU, and only the
(frames, bins) magnitude is written back — the hot feature-extraction
path of both training (Trainer._featurize) and chunked inference
(separator.py:92 analogue).

Tiling: 8 batch rows per grid step (Mosaic requires the second-to-last
block dim to be a multiple of 8 or the full array dim); the batch is
padded to a multiple of 8 and sliced back.

Requires hop * 2 == frame_len (the 512/256 CSS configuration,
conf/config_1ch.yaml:9-10). Falls back to the XLA path otherwise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from css_tpu.ops.stft import num_fft_bins, stft_analysis_kernel

_ROWS = 8  # batch rows per grid step


def _stft_mag_kernel(x_ref, k_ref, out_ref, *, t: int, hop: int, bins: int):
    """x_ref (ROWS, (t+1)*hop) raw samples, k_ref (2*hop, 2*bins) analysis
    matrix, out_ref (ROWS, t, bins) magnitudes.

    Frame t = [seg_t | seg_{t+1}] (hop = frame/2), so instead of
    materializing overlapped frames (a sublane-offset concat Mosaic cannot
    lower), the rDFT splits into two half-frame matmuls:
      spec_t = seg_t @ K[:hop] + seg_{t+1} @ K[hop:]
    with both operand loads taken as lane-aligned static ref slices.
    """
    first = x_ref[:, : t * hop].reshape(_ROWS * t, hop)
    second = x_ref[:, hop : (t + 1) * hop].reshape(_ROWS * t, hop)
    spec = jnp.dot(first, k_ref[:hop], preferred_element_type=jnp.float32)
    spec += jnp.dot(second, k_ref[hop:], preferred_element_type=jnp.float32)
    re = spec[:, :bins]
    im = spec[:, bins:]
    out_ref[:] = jnp.sqrt(re * re + im * im).reshape(_ROWS, t, bins)


@functools.partial(jax.jit, static_argnames=("frame_len", "hop", "interpret"))
def stft_mag_pallas(x: jax.Array, frame_len: int = 512, hop: int = 256,
                    interpret: bool = False) -> jax.Array:
    """|STFT| of (B, N) -> (B, T, bins); fused framing+rDFT+magnitude."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if frame_len != 2 * hop:
        raise ValueError("pallas kernel requires frame_len == 2*hop")
    b, n = x.shape
    bins = num_fft_bins(frame_len)
    t = (n - frame_len) // hop + 1
    usable = (t + 1) * hop
    x = x[:, :usable]
    pad_b = (-b) % _ROWS
    if pad_b:
        x = jnp.concatenate(
            [x, jnp.zeros((pad_b, usable), x.dtype)], axis=0)
    bp = b + pad_b
    kern = jnp.asarray(stft_analysis_kernel(frame_len))  # (512, 2*bins)

    out = pl.pallas_call(
        functools.partial(_stft_mag_kernel, t=t, hop=hop, bins=bins),
        out_shape=jax.ShapeDtypeStruct((bp, t, bins), jnp.float32),
        grid=(bp // _ROWS,),
        in_specs=[
            pl.BlockSpec((_ROWS, usable), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((frame_len, 2 * bins), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_ROWS, t, bins), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        # the (ROWS*t, 2*bins) spec intermediate pushes past the default
        # 16M scoped-vmem budget; v5e VMEM comfortably fits 2-3x that
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024),
        interpret=interpret,
    )(x, kern)
    return out[:b]


def stft_mag(x: jax.Array, frame_len: int = 512, hop: int = 256) -> jax.Array:
    """|STFT| with automatic backend choice: Pallas on TPU, XLA elsewhere."""
    on_tpu = jax.default_backend() in ("tpu", "axon")
    if on_tpu and frame_len == 2 * hop and x.ndim == 2:
        return stft_mag_pallas(x, frame_len, hop)
    from css_tpu.ops import stft as stft_ops

    return jnp.abs(stft_ops.stft(x, frame_len, hop, center=False))
