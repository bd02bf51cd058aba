"""Time-domain SI-SNR objective for spectrogram-mask models.

Trains mask estimators (Conformer/BLSTM) THROUGH the masked-iSTFT
resynthesis: est_k = iSTFT(mask_k * STFT(mix)), loss = PIT(-SI-SNR).
This optimizes exactly what the separation pipeline outputs are scored
on (SI-SNRi), unlike the magnitude-MSE proxy — the mask gradient sees
phase-consistency and overlap-add effects the MSE objective cannot.

The reference declares an "SNR" objective choice but never implements
it (scripts/python/train.py:66, css/objectives/__init__.py:19); the
framework's "SNR" objective covers time-domain models (Conv-TasNet),
and this one extends the slot to the mask-model families. Everything
is differentiable XLA (framing matmul + rFFT-as-matmul + overlap-add),
so the backward pass is one fused program on TPU.

Typical use: pretrain with MSE, then fine-tune with MaskSNR
(``--init pretrained.mdl --objective MaskSNR``); an optional
``--masksnr-mag-weight`` keeps a magnitude-MSE anchor during the
switch.
"""

from __future__ import annotations

import jax.numpy as jnp

from css_tpu.objectives.base import OBJECTIVES
from css_tpu.objectives.snr import si_snr
from css_tpu.ops.pit import batch_pit_loss, mse_pairwise
from css_tpu.ops.stft import istft, stft


@OBJECTIVES.register("MaskSNR")
class MaskSiSnr:
    """PIT SI-SNR on masked-iSTFT resynthesis of mask-model outputs."""

    # Trainer._featurize keeps time-domain waveforms in the batch for
    # objectives that declare this (mix_wav + sourceK as waveforms).
    needs_waveforms = True

    def __init__(self, frame_len: int = 512, frame_hop: int = 256,
                 mag_weight: float = 0.0, clamp_db: float = 30.0):
        self.frame_len = frame_len
        self.frame_hop = frame_hop
        self.mag_weight = mag_weight
        self.clamp_db = clamp_db

    @staticmethod
    def add_args(parser):
        parser.add_argument(
            "--masksnr-mag-weight", type=float, default=0.0,
            help="auxiliary magnitude-MSE weight (anchor when fine-tuning "
                 "from an MSE-pretrained checkpoint)")
        parser.add_argument(
            "--masksnr-clamp-db", type=float, default=30.0,
            help="clamp per-stream SI-SNR to +-this many dB: CSS training "
                 "windows routinely contain a near-silent speaker whose "
                 "unbounded SI-SNR (-60 dB and below) would dominate the "
                 "batch loss")

    @classmethod
    def build_objective(cls, conf):
        return cls(frame_len=int(conf.get("frame_len", 512)),
                   frame_hop=int(conf.get("frame_hop", 256)),
                   mag_weight=float(conf.get("masksnr_mag_weight", 0.0)),
                   clamp_db=float(conf.get("masksnr_clamp_db", 30.0)))

    @classmethod
    def add_state_dict(cls, s1, s2, fraction, iteration=None):
        """Averaging hook (reference mse.py:15-17 semantics) — stateless."""
        return s1

    def state_dict(self):
        return {}

    def load_state_dict(self, state):
        pass

    def __call__(self, outputs, batch):
        """outputs: (y_pred, masks (B, T, F, S)) from a mask model;
        batch: mix_wav (B, N) + source1..K waveforms (B, N)."""
        if not (isinstance(outputs, tuple) and len(outputs) >= 2):
            raise ValueError(
                "MaskSNR needs a mask model returning (y_pred, masks); "
                "use objective SNR for time-domain models")
        masks = outputs[1]
        src_keys = sorted(
            (k for k in batch if k.startswith("source") and k[6:].isdigit()),
            key=lambda k: int(k[6:]))
        k = len(src_keys)
        mix = batch["mix_wav"]
        n = mix.shape[-1]
        spec = stft(mix, self.frame_len, self.frame_hop)  # (B, T, F) complex
        # (B, K, T, F): masked spectra for the K speaker streams (the
        # trailing mask slots are noise streams, same contract as
        # conformer.py:101-103)
        est_spec = masks[..., :k].transpose(0, 3, 1, 2) * spec[:, None]
        est = istft(est_spec, self.frame_len, self.frame_hop, length=n)
        y_true = jnp.stack([batch[sk][..., :n] for sk in src_keys], axis=1)

        def neg_clamped_si_snr(e, r):
            s = si_snr(e, r)
            return -jnp.mean(jnp.clip(s, -self.clamp_db, self.clamp_db))

        loss, perms = batch_pit_loss(est, y_true,
                                     loss_fn=neg_clamped_si_snr)
        aux = {"perms": perms, "si_snr": -loss}
        if self.mag_weight:
            mag = jnp.abs(spec)
            y_pred_mag = masks[..., :k].transpose(0, 3, 1, 2) * mag[:, None]
            true_mag = jnp.abs(stft(y_true, self.frame_len, self.frame_hop))
            # reuse the SI-SNR winner's permutation: an independent PIT can
            # pick the OPPOSITE assignment on ambiguous windows, and the two
            # terms would then pull each mask toward different speakers
            sel = jnp.take_along_axis(y_pred_mag, perms[:, :, None, None],
                                      axis=1)
            mag_loss = mse_pairwise(sel, true_mag)
            aux["mag_loss"] = mag_loss
            loss = loss + self.mag_weight * mag_loss
        return loss, aux
