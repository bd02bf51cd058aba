"""Mask/STFT alignment in the MVDR path (VERDICT r1 weak item 8).

``Beamformer._align_mask`` bridges the uncentered analysis convention the
masks are estimated under (separator conv-STFT: frame t covers
[t*hop, t*hop+frame)) and the centered STFT the beamformer uses (frame t
centered at t*hop, i.e. covers [t*hop - frame/2, t*hop + frame/2)): the
uncentered frame t has its center at t*hop + frame/2, which is the
centered frame t+1 — hence shift-by-one. This test checks shift-1 is the
QUALITY-maximizing alignment, not just shape-correct: oracle IRM masks on
a synthetic 2-source / 3-channel scene beamform to better PIT SI-SNR with
shift 1 than with shift 0 or 2.
"""

import numpy as np

import jax.numpy as jnp

from css_tpu.executor.beamformer import Beamformer
from css_tpu.ops import stft as stft_ops
from css_tpu.utils.metrics import pit_si_snr_db


def bandlimited(rng, n, lo, hi, sr=16000):
    spec = np.fft.rfft(rng.standard_normal(n))
    freqs = np.fft.rfftfreq(n, 1 / sr)
    spec[(freqs < lo) | (freqs > hi)] = 0
    x = np.fft.irfft(spec, n).astype(np.float32)
    return x / (np.abs(x).max() + 1e-9)


def shifted_align(shift):
    def align(self, mask, t_spec):
        parts = [mask[:, :1]] * shift + [mask]
        out = jnp.concatenate(parts, axis=1) if shift else mask
        if out.shape[1] < t_spec:
            out = jnp.concatenate(
                [out, jnp.repeat(out[:, -1:], t_spec - out.shape[1], axis=1)],
                axis=1)
        return out[:, :t_spec]
    return align


def test_shift_one_alignment_maximizes_quality(monkeypatch):
    rng = np.random.default_rng(0)
    sr = 16000
    bf = Beamformer(bf_type="souden_mvdr", rescale=True)
    n = bf.win  # one analysis window
    # two spectrally-disjoint sources, spatially separated via per-channel
    # integer delays (a crude far-field array)
    s1 = bandlimited(rng, n, 200, 1500)
    s2 = bandlimited(rng, n, 2000, 5000)
    delays = [(0, 0), (3, 9), (8, 2)]  # (d1, d2) per channel
    chans = []
    for d1, d2 in delays:
        chans.append(np.roll(s1, d1) + np.roll(s2, d2))
    wav = np.stack(chans)  # (D, N)

    # oracle IRM masks in the SEPARATOR's (uncentered) convention on ch0
    m1 = np.abs(np.asarray(stft_ops.stft(s1[None], 512, 256)))[0]
    m2 = np.abs(np.asarray(stft_ops.stft(s2[None], 512, 256)))[0]
    tot = m1 + m2 + 1e-8
    t = bf.mask_win
    irm = np.stack([m1 / tot, m2 / tot])[:, :t]  # (K, T, F)
    noise = np.full_like(irm[0], 1e-4)

    scores = {}
    for shift in (0, 1, 2):
        monkeypatch.setattr(Beamformer, "_align_mask", shifted_align(shift))
        b = Beamformer(bf_type="souden_mvdr", rescale=True)
        wavs = np.asarray(b._process(
            jnp.asarray(wav[None]), jnp.asarray(irm[None]),
            jnp.asarray(noise[None])))[0]  # (K, N)
        scores[shift] = pit_si_snr_db(list(wavs), [s1, s2])
    # shift-1 must clearly beat the neighbors (measured: ~3.2 dB vs ~0.6)
    assert scores[1] > scores[0] + 1.0 and scores[1] > scores[2] + 1.0, scores
    # and it should actually separate (mixture baseline is ~0 dB here)
    assert scores[1] > 2.5, scores
