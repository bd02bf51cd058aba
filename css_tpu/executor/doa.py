"""Direction-of-arrival utilities for the 7-mic circular array.

TPU-native counterpart of css/executor/separator.py:113-250: analytic
steering vectors for a radius-4.25 cm circular array (6 mics + center),
masked DOA likelihoods via einsum power projections over the 80-2000 Hz
band, and the "angle merge" that kills the weaker of two masks whose DOA
estimates coincide within a threshold.

Fixes the reference's double-indexing bug at separator.py:195
(``masked_magnitude[b]`` on an already-indexed tensor): the masked energy
is summed over (freq, time) per output stream.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def steervec_7ch(nfreqs: int = 257, nvecs: int = 30, radius: float = 0.0425,
                 snd_velocity: float = 340.0, sr: int = 16000,
                 reference: int = 0, inverse_shift: bool = False):
    """(nfreqs, nvecs, 7) complex steering vectors + angles in degrees."""
    angles = 2.0 * math.pi * np.arange(nvecs) / nvecs
    distances = radius * np.stack([
        np.zeros(nvecs),
        np.cos(angles + math.pi / 6),
        np.cos(angles - math.pi / 6),
        np.cos(angles - math.pi / 2),
        np.cos(angles - 5 * math.pi / 6),
        np.cos(angles + 5 * math.pi / 6),
        np.cos(angles + math.pi / 2),
    ], axis=1)  # (nvecs, 7)
    if reference != 0:
        distances = distances - distances[:, reference:reference + 1]
    deltas = distances / snd_velocity * sr
    f = np.arange(nfreqs)[:, None, None]
    sign = -1.0 if inverse_shift else 1.0
    sv = np.exp(sign * 1j * deltas[None] * math.pi * f / (nfreqs - 1))
    sv = (sv / math.sqrt(7)).astype(np.complex64)
    return sv, (angles * 180.0 / math.pi).astype(np.float32)


class SteeringVectors:
    def __init__(self, nfreqs: int = 257, nvecs: int = 30, sr: int = 16000,
                 lowcut: float = 80.0, highcut: float = 2000.0):
        self.sv, self.angles = steervec_7ch(nfreqs, nvecs, sr=sr)
        freq_step = (sr // 2) / (nfreqs - 1)
        self.lo = int(math.floor(lowcut / freq_step))
        self.hi = int(math.ceil(highcut / freq_step))

    def doa_likelihood(self, spec, mask, compression: float = 0.5,
                       epsilon: float = 1e-12, softmax: bool = False):
        """spec (B, C, T, F) complex; mask (B, T, F, S) -> (B, S, nangles).

        Power-projection likelihood restricted to [lowcut, highcut]
        (separator.py:202-250).
        """
        x = spec[..., self.lo : self.hi]  # (B, C, T, F')
        sv = jnp.asarray(self.sv[self.lo : self.hi])  # (F', A, C)
        xpow = jnp.abs(jnp.einsum("bctf,bctf->btf", x, jnp.conj(x)))
        xh = jnp.abs(jnp.einsum("bctf,fac->btfa", jnp.conj(x), sv)) ** 2
        if compression <= 0:
            tf_lik = -jnp.log(xpow[..., None] - xh / (1 + epsilon))
        else:
            tf_lik = -jnp.power(
                jnp.maximum(xpow[..., None] - xh / (1 + epsilon), 0.0),
                compression)
        m = mask[:, :, self.lo : self.hi, :]  # (B, T, F', S)
        ret = jnp.einsum("btfs,btfa->bsa", m, tf_lik)
        if softmax:
            ret = jax.nn.softmax(ret, axis=-1)
        return ret

    def angle_merge(self, spec, mask, thresh: float = 16.0,
                    binarize: float = 0.5, compression: float = 0.5):
        """Kill the weaker of two masks when their DOAs coincide
        (separator.py:165-200).

        spec (B, C, T, F); mask (B, T, F, 2) -> merged mask, same shape.
        """
        binmask = (mask > binarize).astype(jnp.float32)
        lik = self.doa_likelihood(spec, binmask, compression=compression)
        angles = jnp.asarray(self.angles)
        doa = angles[jnp.argmax(lik, axis=-1)]  # (B, 2)
        diff = jnp.minimum((doa[:, 0] - doa[:, 1]) % 360.0,
                           (doa[:, 1] - doa[:, 0]) % 360.0)
        same_doa = diff <= thresh  # (B,)
        masked_mag = binmask * jnp.abs(spec[:, 0])[..., None]  # (B, T, F, 2)
        energy = jnp.sum(masked_mag, axis=(1, 2))  # (B, 2)
        kill = jnp.argmin(energy, axis=-1)  # (B,)
        stream_ids = jnp.arange(mask.shape[-1])[None, :]  # (1, 2)
        kill_mask = same_doa[:, None] & (stream_ids == kill[:, None])  # (B, 2)
        return jnp.where(kill_mask[:, None, None, :],
                         jnp.asarray(1e-12, mask.dtype), mask)
