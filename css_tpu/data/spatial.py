"""Far-field spatialization for the 7-mic circular array.

Synthesizes multichannel recordings whose inter-channel phase matches the
analytic steering vectors of ``css_tpu.executor.doa.steervec_7ch``
(radius-4.25 cm circle, 6 mics + center — the LibriCSS capture geometry,
css/executor/separator.py:113-163): a plane wave from azimuth θ reaches
mic m with a fractional delay radius·cos(θ − φ_m)/c, applied exactly in
the rFFT domain. Channel 0 (center) is delay-free, so the channel-0
image IS the dry source — convenient as the SI-SNR reference.

This gives the framework something the reference never had: a
self-contained way to exercise the 7ch pipeline (IPD features, DOA
merge, MVDR beamforming) on material with KNOWN geometry and sources,
both for quality measurement and for multichannel training data.
"""

from __future__ import annotations

import math

import numpy as np

# mic azimuth offsets of the 7-mic circular array, matching the distance
# rows of executor/doa.steervec_7ch (mic 0 = center)
MIC_OFFSETS = (None, math.pi / 6, -math.pi / 6, -math.pi / 2,
               -5 * math.pi / 6, 5 * math.pi / 6, math.pi / 2)


def mic_delays(azimuth_deg: float, radius: float = 0.0425,
               snd_velocity: float = 340.0, sr: int = 16000) -> np.ndarray:
    """Per-mic plane-wave delays in SAMPLES for a source at ``azimuth_deg``.

    Sign convention matches steervec_7ch: the steering vector for angle θ
    applies phase exp(+j·ω·δ_m) with δ_m = radius·cos(θ + offset_m)/c·sr,
    so a source synthesized with these delays projects maximally onto the
    steering vector at its own azimuth.
    """
    a = math.radians(azimuth_deg)
    d = np.array([0.0] + [radius * math.cos(a + o) for o in MIC_OFFSETS[1:]])
    return (d / snd_velocity * sr).astype(np.float64)


def spatialize_7ch(wav: np.ndarray, azimuth_deg: float,
                   radius: float = 0.0425, snd_velocity: float = 340.0,
                   sr: int = 16000) -> np.ndarray:
    """(N,) dry source -> (7, N) far-field array image via exact
    fractional delays (rFFT phase ramps)."""
    wav = np.asarray(wav, np.float64)
    n = wav.shape[-1]
    nfft = 1 << (n - 1).bit_length()
    spec = np.fft.rfft(wav, nfft)
    deltas = mic_delays(azimuth_deg, radius, snd_velocity, sr)
    k = np.arange(spec.shape[-1])
    # phase ADVANCE of delta samples: exp(+j·2πk·delta/nfft), the phase the
    # steering table expects at its own azimuth
    ramp = np.exp(1j * 2.0 * np.pi * k[None, :] * deltas[:, None] / nfft)
    chans = np.fft.irfft(spec[None, :] * ramp, nfft)[:, :n]
    return chans.astype(np.float32)


def spatial_session(srcs: np.ndarray, azimuths_deg, noise_level: float = 0.0,
                    seed: int = 0, **kw) -> np.ndarray:
    """(K, N) dry sources at the given azimuths -> (7, N) array mixture,
    optionally plus white sensor noise."""
    out = np.zeros((7, srcs.shape[-1]), np.float32)
    for s, az in zip(srcs, azimuths_deg):
        out += spatialize_7ch(s, az, **kw)
    if noise_level > 0:
        rng = np.random.default_rng(seed)
        out += noise_level * rng.standard_normal(out.shape).astype(np.float32)
    return out


def _spatialize_batch(waves: np.ndarray, azimuths_deg: np.ndarray,
                      radius: float = 0.0425, snd_velocity: float = 340.0,
                      sr: int = 16000) -> np.ndarray:
    """(B, N) windows, (B,) azimuths -> (B, 7, N), vectorized rFFT ramps."""
    b, n = waves.shape
    nfft = 1 << (n - 1).bit_length()
    spec = np.fft.rfft(waves, nfft)  # (B, F)
    a = np.deg2rad(azimuths_deg)[:, None]
    offs = np.array([o for o in MIC_OFFSETS[1:]])[None, :]
    d = np.concatenate([np.zeros((b, 1)), radius * np.cos(a + offs)], axis=1)
    deltas = d / snd_velocity * sr  # (B, 7) samples
    k = np.arange(spec.shape[-1])
    ramp = np.exp(1j * 2.0 * np.pi * k[None, None, :]
                  * deltas[:, :, None] / nfft)  # (B, 7, F)
    return np.fft.irfft(spec[:, None, :] * ramp, nfft)[..., :n].astype(
        np.float32)


class SpatialMixer:
    """Wraps a MixtureSynthesizer into a 7ch far-field batch stream.

    Each emitted window's K sources get independent azimuths on the
    DOA grid's circle (continuous uniform); the multichannel mixture is
    the sum of their array images plus optional white sensor noise. The
    targets stay the DRY sources — which ARE the channel-0 images (the
    center mic has zero delay), so the mask contract (masks x ch0
    magnitude) is unchanged.

    This is a capability the reference never had: its 7ch models were
    trained elsewhere and imported as ONNX (conf/config_7ch.yaml); here
    `cli.train --spatialize-channels 7` trains the 7ch (IPD-featured)
    model in-framework on synthesized spatial mixtures.

    The wrapped mixer must carry no mixture transforms (reverb/noise act
    on a mono mixture, which has no single spatial image); sensor noise
    is added per channel here instead.
    """

    def __init__(self, mixer, noise_level: float = 0.003, seed: int = 0,
                 min_separation_deg: float = 20.0):
        if mixer.transforms:
            raise ValueError(
                "SpatialMixer needs a transform-free mixer (reverb/noise "
                "on a mono mixture has no spatial image); use its "
                "noise_level for sensor noise")
        self.mixer = mixer
        self.noise_level = noise_level
        self.min_separation = min_separation_deg
        self.rng = np.random.default_rng(seed)

    def __iter__(self):
        return self

    def _draw_azimuths(self, b: int, k: int) -> np.ndarray:
        """(B, K) azimuths, speakers within a window at least
        min_separation apart (LibriCSS talkers sit at distinct seats)."""
        az = np.empty((b, k), np.float64)
        for bi in range(b):
            while True:
                cand = self.rng.uniform(0.0, 360.0, k)
                d = np.abs(cand[:, None] - cand[None, :])
                d = np.minimum(d, 360.0 - d)
                if k == 1 or d[np.triu_indices(k, 1)].min() >= self.min_separation:
                    az[bi] = cand
                    break
        return az

    def spatialize_batch(self, batch, az=None):
        """Render an already-mixed mono batch's sources on the array."""
        srcs = [batch[f"source{i + 1}"]
                for i in range(self.mixer.num_speakers)]
        b, n = srcs[0].shape
        if az is None:
            az = self._draw_azimuths(b, len(srcs))
        mix = np.zeros((b, 7, n), np.float32)
        for ki, s in enumerate(srcs):
            mix += _spatialize_batch(s, az[:, ki], sr=self.mixer.sr)
        if self.noise_level > 0:
            mix += (self.noise_level
                    * self.rng.standard_normal(mix.shape).astype(np.float32))
        out = dict(batch)
        out["mix"] = mix
        return out

    def __next__(self):
        return self.spatialize_batch(next(self.mixer))
