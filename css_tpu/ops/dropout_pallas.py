"""Fused dropout: in-kernel PRNG + mask + scale in one Pallas pass.

Round-4 step attribution (`scripts/ablate_step.py`, BASELINE.md) measured
dropout at ~17% of the Conformer train step (3.7 ms of 21.8 ms at batch
32 x 2.5 s) — the largest single non-matmul cost. The stock
``nn.Dropout`` path materializes a uniform f32 tensor from the rbg PRNG,
compares, and selects; per step that is ~80 encoder-wide dropout
applications over (B, T, {256, 1024, T}) tensors. This kernel:

  * generates the random bits WITH ``pltpu.prng_random_bits`` inside the
    kernel (no separate PRNG HLO, no f32 uniform materialization — one
    uint32 compare per element);
  * applies mask and 1/keep scaling in the same VMEM pass;
  * backward REGENERATES the identical mask from the same seed instead
    of storing it (custom VJP) — no mask residual travels fwd->bwd.

Drop probability is quantized to 1/2^32 (exact for any float rate).
The RNG stream differs from ``nn.Dropout``'s (hardware PRNG vs rbg) —
same Bernoulli(rate) law, different draws — so this is an opt-in speed
path (`CSS_TPU_FAST_DROPOUT=1`), OFF by default in quality recipes
until A/B'd at flagship scale.

Reference counterpart: torch dropout inside the reference encoder
(css/models/conformer.py:128,254,302,326); the fusion itself has no
reference analogue.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _dropout_kernel(seed_ref, x_ref, o_ref, *, threshold: int, scale: float):
    from jax.experimental.pallas import tpu as pltpu
    import jax.experimental.pallas as pl

    # decorrelate grid blocks: fold the block id into the seed
    pltpu.prng_seed(seed_ref[0, 0], pl.program_id(0))
    bits = pltpu.bitcast(pltpu.prng_random_bits(x_ref.shape), jnp.uint32)
    keep = bits >= jnp.uint32(threshold)
    x = x_ref[:]
    o_ref[:] = jnp.where(keep, x * jnp.asarray(scale, x.dtype),
                         jnp.zeros((), x.dtype))


def _run(x: jax.Array, seed: jax.Array, rate: float,
         interpret: bool) -> jax.Array:
    if interpret:
        # Off-TPU fallback: pltpu.prng_seed has no CPU lowering (even in
        # interpret mode), so use the same threshold semantics over
        # jax.random bits — deterministic in (seed, shape), which is all
        # the backward pass needs. The kernel path is validated on real
        # TPU by scripts/dropout_kernel_bench.py.
        threshold = min(int(round(rate * (1 << 32))), (1 << 32) - 1)
        key = jax.random.PRNGKey(seed.astype(jnp.uint32))
        bits = jax.random.bits(key, x.shape, jnp.uint32)
        keep = bits >= jnp.uint32(threshold)
        return jnp.where(keep, x * jnp.asarray(1.0 / (1.0 - rate), x.dtype),
                         jnp.zeros((), x.dtype))
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    shape = x.shape
    c = shape[-1]
    x2 = x.reshape(-1, c)
    m = x2.shape[0]
    # ~2 MB blocks of full rows (sublane-aligned)
    block_m = max(8, min(m, (2 << 20) // max(1, c * x2.dtype.itemsize)))
    block_m = max(8, block_m // 8 * 8)
    pm = -(-m // block_m) * block_m
    if pm != m:
        x2 = jnp.pad(x2, ((0, pm - m), (0, 0)))
    threshold = min(int(round(rate * (1 << 32))), (1 << 32) - 1)
    out = pl.pallas_call(
        functools.partial(_dropout_kernel, threshold=threshold,
                          scale=1.0 / (1.0 - rate)),
        out_shape=jax.ShapeDtypeStruct(x2.shape, x2.dtype),
        grid=(pm // block_m,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((block_m, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(seed.reshape(1, 1).astype(jnp.int32), x2)
    return out[:m].reshape(shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def fused_dropout(x: jax.Array, seed: jax.Array, rate: float,
                  interpret: bool = False) -> jax.Array:
    """Dropout(x) with Bernoulli(rate) zeros and 1/(1-rate) scaling.

    ``seed`` is an int32 scalar; identical (seed, shape, dtype-width)
    reproduce the identical mask — the backward pass relies on this.
    """
    return _run(x, seed, rate, interpret)


def _fwd(x, seed, rate, interpret):
    return _run(x, seed, rate, interpret), seed


def _bwd(rate, interpret, seed, g):
    # same seed + same shape -> same mask; dropout is linear in x
    return _run(g, seed, rate, interpret), None


fused_dropout.defvjp(_fwd, _bwd)


def dropout_reference(x, seed, rate):
    """NumPy oracle for tests: NOT bit-matching (different PRNG), used
    only for statistics; exact parity is checked kernel-vs-kernel."""
    rng = np.random.default_rng(int(seed))
    keep = rng.random(x.shape) >= rate
    return np.where(keep, np.asarray(x) / (1.0 - rate), 0.0)
