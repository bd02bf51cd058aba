"""Fused Pallas LSTM recurrence (SURVEY §7 hard part 2).

The scan-based LSTM (css_tpu.models.blstm.lstm_scan) already hoists the
input projections into one big matmul, but the recurrence itself is an
XLA while-loop: one (B, h) x (h, 4h) matmul per step with loop overhead
and a fresh read of the recurrent weights every iteration. This kernel
runs the ENTIRE time loop inside one Pallas program using the
sequential-grid trick: grid=(T,), the carried h/c states live in VMEM
scratch (persistent across grid steps on TPU), and the recurrent weight
matrix is loaded into VMEM once and reused for all T steps.

Per-step math matches lstm_scan bit-for-bit (same dtype, same gate
order i,f,g,o): gates = xw[t] + h @ w_hh; c = sig(f)*c + sig(i)*tanh(g);
h = sig(o)*tanh(c).

Used for the eval/inference path (no autodiff through pallas here);
training keeps the XLA scan whose VJP is free.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _lstm_kernel(hidden, xw_ref, whh_ref, out_ref, h_scr, c_scr):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        h_scr[:] = jnp.zeros_like(h_scr)
        c_scr[:] = jnp.zeros_like(c_scr)

    gates = xw_ref[0] + jnp.dot(
        h_scr[:], whh_ref[:],
        preferred_element_type=jnp.float32).astype(xw_ref.dtype)
    h = hidden
    i = jax.nn.sigmoid(gates[:, :h])
    f = jax.nn.sigmoid(gates[:, h : 2 * h])
    g = jnp.tanh(gates[:, 2 * h : 3 * h])
    o = jax.nn.sigmoid(gates[:, 3 * h : 4 * h])
    c = f * c_scr[:] + i * g
    hs = o * jnp.tanh(c)
    c_scr[:] = c
    h_scr[:] = hs
    out_ref[0] = hs


def supported(batch: int, hidden: int, dtype) -> bool:
    """Shapes the kernel tiles cleanly: gate slices must be lane-aligned
    (hidden % 128) and the batch a full sublane tile."""
    sublane = 16 if dtype == jnp.bfloat16 else 8
    return hidden % 128 == 0 and batch % sublane == 0


def lstm_fused(xw: jax.Array, w_hh: jax.Array, hidden: int,
               reverse: bool = False, interpret: bool = False) -> jax.Array:
    """xw: (B, T, 4h) precomputed input projections (+ biases);
    w_hh: (h, 4h). Returns hs (B, T, h)."""
    b, t, h4 = xw.shape
    assert h4 == 4 * hidden and w_hh.shape == (hidden, h4)
    xw_tm = jnp.swapaxes(xw, 0, 1)  # (T, B, 4h) time-major blocks

    if reverse:
        idx = lambda i: (t - 1 - i, 0, 0)  # noqa: E731
    else:
        idx = lambda i: (i, 0, 0)  # noqa: E731

    out = pl.pallas_call(
        functools.partial(_lstm_kernel, hidden),
        grid=(t,),
        in_specs=[
            pl.BlockSpec((1, b, h4), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, h4), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, b, hidden), idx,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t, b, hidden), xw.dtype),
        scratch_shapes=[
            pltpu.VMEM((b, hidden), xw.dtype),
            pltpu.VMEM((b, hidden), xw.dtype),
        ],
        interpret=interpret,
    )(xw_tm, w_hh)
    return jnp.swapaxes(out, 0, 1)  # (B, T, h)
