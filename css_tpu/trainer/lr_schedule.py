"""Three-phase LR schedule: linear warmup -> hold -> exponential decay.

Pure function of the global step, numerically matching the reference's
stateful scheduler (css/trainer/lr_scheduler.py:33-46): after the n-th
update,
  n <= warmup:           min_lr + (lr - min_lr) * n / warmup
  n <= warmup + fixed:   lr
  else:                  lr * exp(-decay * (n - warmup - fixed))

Being a pure schedule(step) -> lr function makes it trivially
checkpointable (the step lives in the optimizer state) and jit-friendly.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp


@dataclass(frozen=True)
class LRSchedule:
    lr: float
    warmup: int = 0
    fixed: int = 0
    decay: float = 0.0
    min_lr: float = 1e-9

    @staticmethod
    def add_args(parser):
        parser.add_argument("--warmup", type=int, default=0)
        parser.add_argument("--decay", type=float, default=0.0)
        parser.add_argument("--fixed", type=int, default=0)
        parser.add_argument("--min-lr", type=float, default=1e-9)

    @classmethod
    def from_conf(cls, conf):
        return cls(
            lr=float(conf.get("lr", 1e-3)),
            warmup=int(conf.get("warmup", 0)),
            fixed=int(conf.get("fixed", 0)),
            decay=float(conf.get("decay", 0.0)),
            min_lr=float(conf.get("min_lr", 1e-9)),
        )

    def __call__(self, step):
        """step: 0-based count of COMPLETED updates; returns the lr the
        reference would apply to the NEXT update (it steps the scheduler
        after each update, so update n+1 uses the value set after update n;
        with warmup>0 the very first update runs at min_lr)."""
        n = jnp.asarray(step, jnp.float32)
        decay_n = jnp.maximum(n - self.warmup - self.fixed, 0.0)
        decayed = self.lr * jnp.exp(-self.decay * decay_n)
        hold = jnp.where(n <= self.warmup + self.fixed,
                         jnp.asarray(self.lr, jnp.float32), decayed)
        if self.warmup <= 0:
            return hold
        warm = self.min_lr + (self.lr - self.min_lr) * n / self.warmup
        return jnp.where(n <= self.warmup, warm, hold)
