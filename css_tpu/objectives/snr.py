"""Scale-invariant SNR objective for time-domain models.

Fills the reference's declared-but-unimplemented "SNR" objective slot
(scripts/python/train.py:66, css/objectives/__init__.py:19). Standard
SI-SNR (Conv-TasNet, arXiv:1809.07454) with PIT over speakers.
"""

from __future__ import annotations

import jax.numpy as jnp

from css_tpu.objectives.base import OBJECTIVES
from css_tpu.ops.pit import batch_pit_loss

EPS = 1e-8


def si_snr(est: jnp.ndarray, ref: jnp.ndarray, eps: float = EPS) -> jnp.ndarray:
    """SI-SNR in dB over the last axis; inputs (..., N)."""
    est = est - jnp.mean(est, axis=-1, keepdims=True)
    ref = ref - jnp.mean(ref, axis=-1, keepdims=True)
    dot = jnp.sum(est * ref, axis=-1, keepdims=True)
    energy = jnp.sum(ref * ref, axis=-1, keepdims=True)
    proj = dot * ref / (energy + eps)
    noise = est - proj
    ratio = jnp.sum(proj * proj, axis=-1) / (jnp.sum(noise * noise, axis=-1) + eps)
    return 10.0 * jnp.log10(ratio + eps)


def neg_si_snr_pairwise(est, ref):
    """Mean negative SI-SNR over all leading axes (a PIT loss_fn)."""
    return -jnp.mean(si_snr(est, ref))


@OBJECTIVES.register("SNR")
class SiSnrObjective:
    @staticmethod
    def add_args(parser):
        pass

    @classmethod
    def build_objective(cls, conf):
        return cls()

    @classmethod
    def add_state_dict(cls, s1, s2, fraction, iteration=None):
        return s1

    def state_dict(self):
        return {}

    def load_state_dict(self, state):
        pass

    def __call__(self, outputs, batch):
        """outputs: (B, K, N) waveforms (or (y_pred, ...) tuple);
        sources (B, N) in the batch."""
        y_pred = outputs[0] if isinstance(outputs, tuple) else outputs
        src_keys = sorted(
            (k for k in batch if k.startswith("source") and k[6:].isdigit()),
            key=lambda k: int(k[6:]))
        n = min(y_pred.shape[-1], batch[src_keys[0]].shape[-1])
        y_true = jnp.stack([batch[k][..., :n] for k in src_keys], axis=1)
        loss, perms = batch_pit_loss(
            y_pred[..., :n], y_true, loss_fn=neg_si_snr_pairwise)
        return loss, {"perms": perms, "si_snr": -loss}
