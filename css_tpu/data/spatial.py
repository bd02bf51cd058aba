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


def mic_delays(azimuth_deg, radius: float = 0.0425,
               snd_velocity: float = 340.0, sr: int = 16000) -> np.ndarray:
    """Per-mic plane-wave delays in SAMPLES; azimuth scalar -> (7,),
    azimuths (B,) -> (B, 7).

    Sign convention matches steervec_7ch: the steering vector for angle θ
    applies phase exp(+j·ω·δ_m) with δ_m = radius·cos(θ + offset_m)/c·sr,
    so a source synthesized with these delays projects maximally onto the
    steering vector at its own azimuth.
    """
    a = np.deg2rad(np.asarray(azimuth_deg, np.float64))[..., None]
    offs = np.array(MIC_OFFSETS[1:])
    d = np.concatenate(
        [np.zeros(a.shape), radius * np.cos(a + offs)], axis=-1)
    return d / snd_velocity * sr


def _phase_ramps(azimuths_deg: np.ndarray, n_bins: int, nfft: int,
                 radius: float, snd_velocity: float, sr: int) -> np.ndarray:
    """(B,) azimuths -> (B, 7, n_bins) complex rFFT ramps: a phase ADVANCE
    of delta samples, exp(+j·2πk·delta/nfft) — the phase the steering
    table expects at its own azimuth. The ONE implementation of the
    geometry/sign convention; the device path (device_mixer.materialize)
    mirrors it and is pinned equal by test."""
    deltas = mic_delays(azimuths_deg, radius, snd_velocity, sr)  # (B, 7)
    k = np.arange(n_bins)
    return np.exp(1j * 2.0 * np.pi * k[None, None, :]
                  * deltas[:, :, None] / nfft)


def spatialize_7ch(wav: np.ndarray, azimuth_deg: float,
                   radius: float = 0.0425, snd_velocity: float = 340.0,
                   sr: int = 16000) -> np.ndarray:
    """(N,) dry source -> (7, N) far-field array image via exact
    fractional delays (rFFT phase ramps)."""
    wav = np.asarray(wav, np.float64)
    return _spatialize_batch(wav[None], np.atleast_1d(azimuth_deg),
                             radius, snd_velocity, sr)[0]


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
    n = waves.shape[-1]
    nfft = 1 << (n - 1).bit_length()
    spec = np.fft.rfft(waves, nfft)  # (B, F)
    ramp = _phase_ramps(azimuths_deg, spec.shape[-1], nfft,
                        radius, snd_velocity, sr)  # (B, 7, F)
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
        """Render an already-mixed mono batch's sources on the array.

        Sums the K phase-ramped source spectra and inverts ONCE — the
        irfft dominates the cost, so this is ~K times cheaper than
        spatializing each source to the time domain separately (and it
        is exactly what the device path does).
        """
        srcs = [batch[f"source{i + 1}"]
                for i in range(self.mixer.num_speakers)]
        b, n = srcs[0].shape
        if az is None:
            az = self._draw_azimuths(b, len(srcs))
        nfft = 1 << (n - 1).bit_length()
        acc = None
        for ki, s in enumerate(srcs):
            spec = np.fft.rfft(s, nfft)  # (B, F)
            ramp = _phase_ramps(az[:, ki], spec.shape[-1], nfft,
                                0.0425, 340.0, self.mixer.sr)
            term = spec[:, None, :] * ramp
            acc = term if acc is None else acc + term
        mix = np.fft.irfft(acc, nfft)[..., :n].astype(np.float32)
        if self.noise_level > 0:
            mix += (self.noise_level
                    * self.rng.standard_normal(mix.shape).astype(np.float32))
        out = dict(batch)
        out["mix"] = mix
        return out

    def __next__(self):
        return self.spatialize_batch(next(self.mixer))
