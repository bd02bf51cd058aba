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
    """PIT-MSE on masked spectrograms, with optional noise-mask supervision.

    The reference's MSE never constrains the third (noise) mask — only
    masks[:num_spk] enter y_pred (conformer.py:103) — so an in-framework-
    trained model emits an arbitrary noise mask that can dominate the
    stitcher's winner-take-all (stitcher.py:77-83). ``noise_weight`` adds
    mean((noise_mask*mag - relu(mag_mix - mag_s1 - mag_s2))^2), teaching
    the noise mask to capture the non-speech residual.
    """

    def __init__(self, noise_weight: float = 0.0):
        self.noise_weight = noise_weight

    @staticmethod
    def add_args(parser):
        # 0.0 preserves reference parity (the reference objective has no
        # noise term); enable explicitly for in-framework training so the
        # noise mask learns the non-speech residual
        parser.add_argument("--mse-noise-weight", type=float, default=0.0)

    @classmethod
    def build_objective(cls, conf):
        return cls(noise_weight=float(conf.get("mse_noise_weight", 0.0)))

    @classmethod
    def add_state_dict(cls, s1, s2, fraction, iteration=None):
        """Averaging hook (mse.py:15-17) — stateless, identity."""
        return s1

    def state_dict(self):
        return {}

    def load_state_dict(self, state):
        pass

    def __call__(self, outputs, batch):
        """outputs: y_pred (B, K, T, F) or (y_pred, masks (B, T, F, S));
        batch has input/source1/source2 magnitudes (B, T, F)."""
        if isinstance(outputs, tuple):
            y_pred, masks = outputs[0], outputs[1]
        else:
            y_pred, masks = outputs, None
        src_keys = sorted(
            (k for k in batch if k.startswith("source") and k[6:].isdigit()),
            key=lambda k: int(k[6:]))
        y_true = jnp.stack([batch[k] for k in src_keys], axis=1)
        loss, perms = batch_pit_loss(y_pred, y_true, loss_fn=mse_pairwise)
        aux = {"perms": perms}
        if self.noise_weight and masks is not None and "input" in batch:
            # multichannel features are [ch0 magnitude, IPD...]; the mask
            # contract applies to the first num_bins (= target width)
            mag = batch["input"][..., : y_true.shape[-1]]
            residual = jnp.maximum(
                mag - sum(batch[k] for k in src_keys), 0.0)
            noise_pred = masks[..., -1] * mag
            noise_loss = jnp.mean(jnp.square(noise_pred - residual))
            aux["noise_loss"] = noise_loss
            loss = loss + self.noise_weight * noise_loss
        return loss, aux
