"""Dropout factory: stock ``nn.Dropout`` or the fused Pallas kernel.

``CSS_TPU_FAST_DROPOUT=1`` switches every encoder dropout to
``ops.dropout_pallas.fused_dropout`` (in-kernel PRNG + mask + scale,
seed-recompute backward) — dropout measured at ~17% of the train step
(BASELINE.md round 4). Same Bernoulli(rate) law, different PRNG stream
than ``nn.Dropout``, so this is an opt-in THROUGHPUT path; quality
recipes keep the default until the A/B settles it. No parameters either
way, so checkpoints are interchangeable across the flag.
"""

from __future__ import annotations

import os

import flax.linen as nn
import jax
import jax.numpy as jnp


class FastDropout(nn.Module):
    """Drop-in ``nn.Dropout`` replacement backed by the Pallas kernel."""

    rate: float

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if deterministic or self.rate == 0.0:
            return x
        from css_tpu.ops.dropout_pallas import fused_dropout

        key = self.make_rng("dropout")
        # one int32 seed per module call; the kernel folds block ids in
        seed = jax.random.bits(key, (), jnp.uint32).astype(jnp.int32)
        interpret = jax.devices()[0].platform != "tpu"
        return fused_dropout(x, seed, float(self.rate), interpret)


def make_dropout(rate: float):
    if os.environ.get("CSS_TPU_FAST_DROPOUT"):
        return FastDropout(rate=rate)
    return nn.Dropout(rate)
