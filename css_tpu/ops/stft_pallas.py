"""Fused Pallas STFT-magnitude kernel for TPU.

The XLA formulation (css_tpu.ops.stft) materializes the overlapped frame
matrix in HBM (2x the signal size for hop = frame/2) before the rDFT
matmul. This kernel fuses framing + windowed-rDFT matmul + magnitude into
one VMEM-resident pass per tile: the raw signal block is loaded once, the
frame matrix is built in-register from two shifted views, the (frames, 512)
x (512, 2*bins) dot rides the MXU, and only the (frames, bins) magnitude is
written back — the hot feature-extraction path of both training
(Trainer._featurize) and chunked inference (separator.py:92 analogue).

Requires hop * 2 == frame_len (the 512/256 CSS configuration,
conf/config_1ch.yaml:9-10). Falls back to the XLA path otherwise.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from css_tpu.ops.stft import num_fft_bins, stft_analysis_kernel


def _stft_mag_kernel(x_ref, k_ref, out_ref, *, tile_t: int, hop: int,
                     bins: int):
    """One (batch row, frame tile): x_ref (1, (tile_t+1)*hop) raw samples,
    k_ref (2*hop, 2*bins) analysis matrix, out_ref (1, tile_t, bins)."""
    x = x_ref[0]  # ((tile_t+1)*hop,)
    seg = x.reshape(tile_t + 1, hop)
    frames = jnp.concatenate([seg[:-1], seg[1:]], axis=1)  # (tile_t, 2*hop)
    spec = jnp.dot(frames, k_ref[:], preferred_element_type=jnp.float32)
    re = spec[:, :bins]
    im = spec[:, bins:]
    out_ref[0] = jnp.sqrt(re * re + im * im)


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
    # tile over frames; each tile needs (tile_t+1) hop-segments of signal
    tile_t = t  # windows are short (<=~240 frames); one tile per row
    usable = (t + 1) * hop
    x = x[:, :usable]
    kern = jnp.asarray(stft_analysis_kernel(frame_len))  # (512, 2*bins)

    grid = (b,)
    return pl.pallas_call(
        functools.partial(_stft_mag_kernel, tile_t=tile_t, hop=hop,
                          bins=bins),
        out_shape=jax.ShapeDtypeStruct((b, t, bins), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, usable), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((frame_len, 2 * bins), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t, bins), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, kern)


def stft_mag(x: jax.Array, frame_len: int = 512, hop: int = 256) -> jax.Array:
    """|STFT| with automatic backend choice: Pallas on TPU, XLA elsewhere."""
    on_tpu = jax.default_backend() in ("tpu", "axon")
    if on_tpu and frame_len == 2 * hop and x.ndim == 2:
        return stft_mag_pallas(x, frame_len, hop)
    from css_tpu.ops import stft as stft_ops

    return jnp.abs(stft_ops.stft(x, frame_len, hop, center=False))
