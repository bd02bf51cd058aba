"""Host-side waveform augmentations: RIR reverb and additive noise.

Semantics follow the reference's Lhotse transforms
(css/datasets/separation.py:136-158): reverb with a random impulse response
at p=0.5 with output energy normalization, and noise mixing at a uniform
SNR in [min_snr, max_snr] at p=0.5 — both applied to the MIXTURE windows
only (targets stay clean, separation.py:233-236).
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
from scipy.signal import fftconvolve


class ReverbWithImpulseResponse:
    def __init__(self, rir_pool: List[np.ndarray], p: float = 0.5,
                 normalize_output: bool = True):
        self.rir_pool = rir_pool
        self.p = p
        self.normalize_output = normalize_output

    def __call__(self, wav: np.ndarray, rng: np.random.Generator) -> np.ndarray:
        if rng.uniform() >= self.p:
            return wav
        rir = self.rir_pool[rng.integers(len(self.rir_pool))]
        out = fftconvolve(wav, rir)[: len(wav)].astype(np.float32)
        if self.normalize_output:
            in_e = np.sqrt(np.mean(wav ** 2)) + 1e-8
            out_e = np.sqrt(np.mean(out ** 2)) + 1e-8
            out = out * (in_e / out_e)
        return out


class NoiseMix:
    """Additive noise at a random SNR (lhotse CutMix semantics)."""

    def __init__(self, noise_pool: List[np.ndarray], p: float = 0.5,
                 min_snr: float = 5.0, max_snr: float = 20.0):
        self.noise_pool = noise_pool
        self.p = p
        self.min_snr = min_snr
        self.max_snr = max_snr

    def __call__(self, wav: np.ndarray, rng: np.random.Generator) -> np.ndarray:
        if rng.uniform() >= self.p:
            return wav
        noise = self.noise_pool[rng.integers(len(self.noise_pool))]
        n = len(wav)
        if len(noise) >= n:
            start = rng.integers(0, len(noise) - n + 1)
            noise = noise[start : start + n]
        else:
            reps = -(-n // len(noise))
            noise = np.tile(noise, reps)[:n]
        snr = rng.uniform(self.min_snr, self.max_snr)
        sig_p = np.mean(wav ** 2) + 1e-12
        noi_p = np.mean(noise ** 2) + 1e-12
        scale = np.sqrt(sig_p / (noi_p * 10.0 ** (snr / 10.0)))
        return (wav + scale * noise).astype(np.float32)
