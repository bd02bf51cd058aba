"""Permutation-invariant MSE on masked spectrograms.

Counterpart of css/objectives/mse.py:6-37, with the per-example python
loop replaced by the fully vectorized batch PIT (css_tpu.ops.pit).
"""

from __future__ import annotations

import jax.numpy as jnp

from css_tpu.objectives.base import OBJECTIVES
from css_tpu.ops.pit import batch_pit_loss, mse_pairwise


@OBJECTIVES.register("MSE")
class MeanSquaredError:
    @staticmethod
    def add_args(parser):
        pass

    @classmethod
    def build_objective(cls, conf):
        return cls()

    @classmethod
    def add_state_dict(cls, s1, s2, fraction, iteration=None):
        """Averaging hook (mse.py:15-17) — stateless, identity."""
        return s1

    def state_dict(self):
        return {}

    def load_state_dict(self, state):
        pass

    def __call__(self, y_pred, batch):
        """y_pred: (B, K, T, F); batch has source1/source2 (B, T, F)."""
        y_true = jnp.stack([batch["source1"], batch["source2"]], axis=1)
        loss, perms = batch_pit_loss(y_pred, y_true, loss_fn=mse_pairwise)
        return loss, {"perms": perms}
