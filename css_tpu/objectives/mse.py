"""Permutation-invariant MSE on masked spectrograms.

Counterpart of css/objectives/mse.py:6-37, with the per-example python
loop replaced by the fully vectorized batch PIT (css_tpu.ops.pit).
"""

from __future__ import annotations

import jax
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

    def __init__(self, noise_weight: float = 0.0, order_weight: float = 0.0,
                 consistency_weight: float = 0.0,
                 consistency_frames: int = 25):
        self.noise_weight = noise_weight
        self.order_weight = order_weight
        self.consistency_weight = consistency_weight
        self.consistency_frames = int(consistency_frames)

    @staticmethod
    def add_args(parser):
        # 0.0 preserves reference parity (the reference objective has no
        # noise term); enable explicitly for in-framework training so the
        # noise mask learns the non-speech residual
        parser.add_argument("--mse-noise-weight", type=float, default=0.0)
        parser.add_argument(
            "--mse-order-weight", type=float, default=0.0,
            help="canonical slot-ordering pressure: blend the PIT loss "
                 "with the loss under a FIXED assignment (slot 0 = lower "
                 "spectral-centroid speaker). A model that emits speakers "
                 "in a canonical order keeps its slot assignment stable "
                 "across inference windows, so the stitcher's boundary "
                 "decisions (which fail when the overlap region has one "
                 "silent speaker — no evidence either way) become "
                 "near-trivial. PIT alone leaves the per-window slot "
                 "convention arbitrary (css/objectives/pit.py:5)")

        parser.add_argument(
            "--mse-consistency-weight", type=float, default=0.0,
            help="cross-window mask-consistency regularizer: each batch "
                 "window is featurized TWICE as two crops offset by "
                 "--mse-consistency-frames STFT frames (one extra forward "
                 "per step), and the masks' disagreement on the shared "
                 "frames is penalized. The shared frames are IDENTICAL "
                 "audio — any disagreement is per-window MVN/context edge "
                 "effect, the measured source of inference-time stitcher "
                 "errors (cross-window mask inconsistency at the same "
                 "time region, docs/ROADMAP.md stitcher notes)")
        parser.add_argument(
            "--mse-consistency-frames", type=int, default=25,
            help="crop offset in STFT frames (25 = 0.4 s at hop 256)")

    @classmethod
    def build_objective(cls, conf):
        return cls(noise_weight=float(conf.get("mse_noise_weight", 0.0)),
                   order_weight=float(conf.get("mse_order_weight", 0.0)),
                   consistency_weight=float(
                       conf.get("mse_consistency_weight", 0.0)),
                   consistency_frames=int(
                       conf.get("mse_consistency_frames", 25)))

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
        aux_cons = None
        mag_in = batch.get("input")
        b = y_true.shape[0]
        if (self.consistency_weight and masks is not None
                and masks.shape[0] == 2 * b):
            # the trainer featurized each window twice as crops offset by
            # consistency_frames; rows [b:] are the shifted crops. The
            # shared frames are the SAME audio samples — penalize the
            # masks' disagreement there, then train PIT on crop 1 only
            sf = self.consistency_frames
            m1, m2 = masks[:b], masks[b:]
            aux_cons = jnp.mean(
                jnp.square(m1[:, sf:] - m2[:, : m1.shape[1] - sf]))
            y_pred, masks = y_pred[:b], m1
            if mag_in is not None:
                mag_in = mag_in[:b]
        conf = None
        if self.order_weight:
            # canonical target order: slot k = k-th lowest energy-weighted
            # spectral centroid. Sorting the TARGETS is permutation book-
            # keeping, not a gradient path — the model still learns via
            # the blended losses below.
            f_idx = jnp.arange(y_true.shape[-1], dtype=y_true.dtype)
            power = jnp.sum(y_true, axis=(2, 3))  # (B, K)
            centroid = (jnp.sum(y_true * f_idx, axis=(2, 3))
                        / jnp.maximum(power, 1e-6))  # (B, K)
            order = jnp.argsort(centroid, axis=1)  # (B, K)
            y_canon = jnp.take_along_axis(
                y_true, order[:, :, None, None], axis=1)
            # confidence gate: pairs whose canonical key is ambiguous
            # (adjacent centroids close, in bin units) keep pure PIT —
            # measured at smoke scale that ungated ordering pressure
            # HURTS close-centroid pairs while helping distinct ones
            sorted_c = jnp.take_along_axis(centroid, order, axis=1)
            gap = jnp.min(jnp.diff(sorted_c, axis=1), axis=1)  # (B,)
            conf = jax.nn.sigmoid((gap - 4.0) / 2.0)  # ~0 below 2 bins
            per_ex_canon = jnp.mean(
                jnp.square(y_pred - y_canon), axis=(1, 2, 3))  # (B,)
            y_true = y_canon  # PIT over canonical order: same minimum
        loss, perms = batch_pit_loss(y_pred, y_true, loss_fn=mse_pairwise)
        aux = {"perms": perms}
        if self.order_weight:
            # clamp: order_weight > 1 would give the PIT term negative
            # weight (rewarding misordered outputs)
            w = jnp.clip(self.order_weight * conf, 0.0, 1.0)  # (B,) blend
            canon_loss = jnp.mean(per_ex_canon)
            # canon >= pit per example; the gap is exactly the cost of
            # emitting speakers out of canonical order
            aux["order_gap"] = canon_loss - loss
            # per-example blend; perms permute the ESTIMATE (pit_loss
            # semantics), and jnp.mean of per-example PIT == `loss`
            # under mse_pairwise's uniform mean
            per_ex_pit = jnp.mean(
                jnp.square(jnp.take_along_axis(
                    y_pred, perms[:, :, None, None], axis=1) - y_true),
                axis=(1, 2, 3))
            loss = jnp.mean((1.0 - w) * per_ex_pit + w * per_ex_canon)
        if self.noise_weight and masks is not None and mag_in is not None:
            # multichannel features are [ch0 magnitude, IPD...]; the mask
            # contract applies to the first num_bins (= target width)
            mag = mag_in[..., : y_true.shape[-1]]
            residual = jnp.maximum(
                mag - sum(batch[k] for k in src_keys), 0.0)
            noise_pred = masks[..., -1] * mag
            noise_loss = jnp.mean(jnp.square(noise_pred - residual))
            aux["noise_loss"] = noise_loss
            loss = loss + self.noise_weight * noise_loss
        if aux_cons is not None:
            aux["consistency"] = aux_cons
            loss = loss + self.consistency_weight * aux_cons
        return loss, aux
