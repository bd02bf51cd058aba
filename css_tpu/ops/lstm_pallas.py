"""Fused Pallas LSTM recurrence (SURVEY §7 hard part 2).

The scan-based LSTM (css_tpu.models.blstm.lstm_scan) already hoists the
input projections into one big matmul, but the recurrence itself is an
XLA while-loop: one (B, h) x (h, 4h) matmul per step with loop overhead
and a fresh read of the recurrent weights every iteration. This kernel
runs the ENTIRE time loop inside one Pallas program using the
sequential-grid trick: grid=(T,), the carried h/c states live in VMEM
scratch (persistent across grid steps on TPU), and the recurrent weight
matrix is loaded into VMEM once and reused for all T steps.

Per-step math matches lstm_scan (same gate order i,f,g,o):
gates = xw[t] + h @ w_hh; c = sig(f)*c + sig(i)*tanh(g);
h = sig(o)*tanh(c). Gate/cell elementwise math runs in f32 regardless of
the input dtype — Mosaic cannot lower bf16 transcendentals (f32-constant
broadcasts into bf16 vectors fail verification), and f32 cell-state
accumulation is better numerics; bit-exact vs the scan in f32, within
bf16 tolerance otherwise.

Used for the eval/inference path only (measured 1.85x bf16 / 4.9x f32
over the XLA while-loop at the BLSTM-large bench shape). A custom-VJP
training variant with a reverse-time backward kernel shipped behind an
env flag through round 2; the round-3 hardware bench measured its
value_and_grad at 0.49x (f32) / 0.62x (bf16) of the XLA scan's free VJP
(scripts/lstm_kernel_bench.py), so the training path was deleted —
training keeps the scan.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gate_dot(h, whh):
    """(B,h) x (h,4h) -> f32 gates, MXU-native under Mosaic.

    The package pins jax_default_matmul_precision=highest (parity tests
    need it), but Mosaic's tpu.matmul rejects fp32 contract precision on
    bf16 operands ('Bad lhs type') AND a non-32-bit accumulator
    ('Expected matmul acc to be 32-bit'). The supported bf16 form is the
    hardware-native one: DEFAULT precision (bf16 multiply) with an f32
    accumulator. f32 operands keep HIGHEST (true f32 passes) — matching
    the scan outside the kernel, which sees the global pin; DEFAULT there
    would let the recurrence amplify bf16-pass rounding into real drift.
    """
    prec = (jax.lax.Precision.DEFAULT if h.dtype == jnp.bfloat16
            else jax.lax.Precision.HIGHEST)
    return jax.lax.dot_general(
        h, whh, dimension_numbers=(((1,), (0,)), ((), ())),
        precision=prec, preferred_element_type=jnp.float32)


def _lstm_kernel(hidden, xw_ref, whh_ref, out_ref, h_scr, c_scr):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        h_scr[:] = jnp.zeros_like(h_scr)
        c_scr[:] = jnp.zeros_like(c_scr)

    # gate math stays in f32: Mosaic cannot lower bf16 transcendentals
    # (sigmoid/tanh broadcast f32 constants into bf16 vectors), and f32
    # accumulation of the cell state is better numerics anyway; only the
    # h state (the next step's MXU input) and the output are downcast
    gates = xw_ref[0].astype(jnp.float32) + _gate_dot(h_scr[:], whh_ref[:])
    h = hidden
    i = jax.nn.sigmoid(gates[:, :h])
    f = jax.nn.sigmoid(gates[:, h : 2 * h])
    g = jnp.tanh(gates[:, 2 * h : 3 * h])
    o = jax.nn.sigmoid(gates[:, 3 * h : 4 * h])
    c = f * c_scr[:] + i * g
    hs = o * jnp.tanh(c)
    c_scr[:] = c
    h_scr[:] = hs.astype(h_scr.dtype)
    out_ref[0] = hs.astype(out_ref.dtype)


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
            pltpu.VMEM((b, hidden), jnp.float32),
        ],
        interpret=interpret,
    )(xw_tm, w_hh)
    return jnp.swapaxes(out, 0, 1)  # (B, T, h)

