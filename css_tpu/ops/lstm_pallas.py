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

Used for the eval/inference path (no autodiff through pallas here);
training keeps the XLA scan whose VJP is free.
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


def train_fused_enabled() -> bool:
    """Opt-in for the differentiable fused path in TRAINING
    (CSS_TPU_FUSED_LSTM_TRAIN=1). Grad parity vs the scan is test-enforced
    in interpret mode; flip the default once the backward kernel has a
    measured win on real hardware."""
    import os

    return os.environ.get("CSS_TPU_FUSED_LSTM_TRAIN", "0") == "1"


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


# ------------------------------------------------------------- training path
# custom-VJP variant: the forward additionally emits the cell states (the
# backward residuals); the backward is a second Pallas kernel running the
# time loop in reverse with the gradient carries (dh, dc) and the
# recurrent-weight gradient accumulator living in VMEM scratch. Gates are
# recomputed from (xw, h_prev) in the backward — one extra matmul per step
# instead of materializing (B, T, 4h) activations.


def _lstm_fwd_kernel(hidden, xw_ref, whh_ref, h_ref, c_ref, h_scr, c_scr):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        h_scr[:] = jnp.zeros_like(h_scr)
        c_scr[:] = jnp.zeros_like(c_scr)

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
    h_ref[0] = hs.astype(h_ref.dtype)
    c_ref[0] = c.astype(c_ref.dtype)


def _lstm_bwd_kernel(hidden, t_total, xw_ref, whh_ref, hprev_ref, c_ref,
                     cprev_ref, gout_ref, dxw_ref, dwhh_ref,
                     dh_scr, dc_scr, dwhh_scr, dgates_scr):
    idx = pl.program_id(0)  # 0 .. T-1, processing t = T-1-idx

    @pl.when(idx == 0)
    def _():
        dh_scr[:] = jnp.zeros_like(dh_scr)
        dc_scr[:] = jnp.zeros_like(dc_scr)
        dwhh_scr[:] = jnp.zeros_like(dwhh_scr)

    h = hidden
    f32 = jnp.float32
    h_prev = hprev_ref[0]
    # recompute the forward's gates in f32 (the fwd kernel also keeps
    # gate math in f32; bf16 transcendentals don't lower under Mosaic)
    gates = xw_ref[0].astype(f32) + _gate_dot(h_prev, whh_ref[:])
    i = jax.nn.sigmoid(gates[:, :h])
    f = jax.nn.sigmoid(gates[:, h : 2 * h])
    g = jnp.tanh(gates[:, 2 * h : 3 * h])
    o = jax.nn.sigmoid(gates[:, 3 * h : 4 * h])
    c = c_ref[0].astype(f32)
    tc = jnp.tanh(c)
    dh = gout_ref[0].astype(f32) + dh_scr[:]
    do = dh * tc
    dc = dh * o * (1.0 - tc * tc) + dc_scr[:]
    di = dc * g
    df = dc * cprev_ref[0].astype(f32)
    dg = dc * i
    # pre-activation gate grads, written slice-wise (lane-aligned)
    dgates_scr[:, :h] = di * i * (1.0 - i)
    dgates_scr[:, h : 2 * h] = df * f * (1.0 - f)
    dgates_scr[:, 2 * h : 3 * h] = dg * (1.0 - g * g)
    dgates_scr[:, 3 * h : 4 * h] = do * o * (1.0 - o)
    dgates = dgates_scr[:]
    dxw_ref[0] = dgates.astype(dxw_ref.dtype)
    # dW_hh += h_prev^T @ dgates   (contract the batch dim)
    dwhh_scr[:] += jax.lax.dot_general(
        h_prev.astype(f32), dgates,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=f32)
    # carries for step t-1
    dh_scr[:] = jax.lax.dot_general(
        dgates, whh_ref[:].astype(f32),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=f32)
    dc_scr[:] = dc * f

    @pl.when(idx == t_total - 1)
    def _():
        dwhh_ref[:] = dwhh_scr[:].astype(dwhh_ref.dtype)


def _fwd_states(xw, w_hh, hidden, reverse, interpret):
    b, t, h4 = xw.shape
    xw_tm = jnp.swapaxes(xw, 0, 1)
    if reverse:
        idx = lambda i: (t - 1 - i, 0, 0)  # noqa: E731
    else:
        idx = lambda i: (i, 0, 0)  # noqa: E731
    hs, cs = pl.pallas_call(
        functools.partial(_lstm_fwd_kernel, hidden),
        grid=(t,),
        in_specs=[
            pl.BlockSpec((1, b, h4), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, h4), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, b, hidden), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b, hidden), idx, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((t, b, hidden), xw.dtype),
            jax.ShapeDtypeStruct((t, b, hidden), xw.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((b, hidden), xw.dtype),
            pltpu.VMEM((b, hidden), jnp.float32),
        ],
        interpret=interpret,
    )(xw_tm, w_hh)
    return hs, cs  # time-major


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def lstm_fused_train(xw, w_hh, hidden, reverse=False, interpret=False):
    """Differentiable fused LSTM: same result as ``lstm_scan`` with a
    Pallas forward AND backward (reverse-time kernel, recomputed gates)."""
    hs, _ = _fwd_states(xw, w_hh, hidden, reverse, interpret)
    return jnp.swapaxes(hs, 0, 1)


def _train_fwd(xw, w_hh, hidden, reverse, interpret):
    hs, cs = _fwd_states(xw, w_hh, hidden, reverse, interpret)
    return jnp.swapaxes(hs, 0, 1), (xw, w_hh, hs, cs)


def _train_bwd(hidden, reverse, interpret, res, gout):
    xw, w_hh, hs, cs = res  # hs/cs time-major in PROCESSING order
    b, t, h4 = xw.shape
    xw_tm = jnp.swapaxes(xw, 0, 1)
    gout_tm = jnp.swapaxes(gout, 0, 1)
    zeros = jnp.zeros((1, b, hidden), xw.dtype)
    # hs/cs are stored BY INPUT INDEX (the fwd kernel writes block t for
    # the step that consumed input t, in both directions). The "previous
    # processing step" for input index k is k-1 going forward, k+1 going
    # in reverse:
    if reverse:
        h_prev = jnp.concatenate([hs[1:], zeros], axis=0)
        c_prev = jnp.concatenate([cs[1:], zeros], axis=0)
        # backward iteration j re-visits processing step T-1-j, which
        # consumed input index j in the reverse direction
        idx = lambda j: (j, 0, 0)  # noqa: E731
    else:
        h_prev = jnp.concatenate([zeros, hs[:-1]], axis=0)
        c_prev = jnp.concatenate([zeros, cs[:-1]], axis=0)
        idx = lambda j: (t - 1 - j, 0, 0)  # noqa: E731

    dxw_tm, dwhh = pl.pallas_call(
        functools.partial(_lstm_bwd_kernel, hidden, t),
        grid=(t,),
        in_specs=[
            pl.BlockSpec((1, b, h4), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, h4), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b, hidden), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b, hidden), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b, hidden), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b, hidden), idx, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, b, h4), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, h4), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((t, b, h4), xw.dtype),
            jax.ShapeDtypeStruct((hidden, h4), w_hh.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((b, hidden), jnp.float32),
            pltpu.VMEM((b, hidden), jnp.float32),
            pltpu.VMEM((hidden, h4), jnp.float32),
            pltpu.VMEM((b, h4), jnp.float32),
        ],
        interpret=interpret,
    )(xw_tm, w_hh, h_prev, cs, c_prev, gout_tm)
    return jnp.swapaxes(dxw_tm, 0, 1), dwhh


lstm_fused_train.defvjp(_train_fwd, _train_bwd)
