"""Native (C++) data-pipeline core vs numpy/scipy references."""

import numpy as np
import pytest
from scipy.signal import fftconvolve

from css_tpu import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native mixcore not built")


def test_fft_convolve_matches_scipy():
    rng = np.random.default_rng(0)
    x = rng.standard_normal(38656).astype(np.float32)
    h = rng.standard_normal(3001).astype(np.float32) * 0.1
    ref = fftconvolve(x, h)[: len(x)]
    got = native.fft_convolve_trunc(x, h, normalize=False)
    # float32 radix-2 FFT at 64k points: error scales with signal magnitude
    scale = np.abs(ref).max()
    assert np.abs(got - ref).max() < 2e-3 * scale


def test_fft_convolve_normalized_energy():
    rng = np.random.default_rng(1)
    x = rng.standard_normal(16000).astype(np.float32)
    h = (rng.standard_normal(800) * np.exp(-np.arange(800) / 200)).astype(
        np.float32)
    out = native.fft_convolve_trunc(x, h, normalize=True)
    np.testing.assert_allclose(np.mean(out ** 2), np.mean(x ** 2), rtol=1e-3)


def test_add_noise_snr_achieves_target():
    rng = np.random.default_rng(2)
    wav = rng.standard_normal(32000).astype(np.float32)
    noise = rng.standard_normal(48000).astype(np.float32) * 3.0
    out = native.add_noise_snr(wav, noise, start=100, snr_db=10.0)
    added = out - wav
    snr = 10 * np.log10(np.mean(wav ** 2) / np.mean(added ** 2))
    np.testing.assert_allclose(snr, 10.0, atol=0.05)
    # matches the numpy fallback exactly
    sl = noise[100 : 100 + len(wav)]
    sig_p = np.mean(wav.astype(np.float64) ** 2) + 1e-12
    noi_p = np.mean(sl.astype(np.float64) ** 2) + 1e-12
    scale = np.sqrt(sig_p / (noi_p * 10.0))
    np.testing.assert_allclose(out, wav + scale * sl, atol=1e-4)


def test_mix_and_window_matches_numpy():
    rng = np.random.default_rng(3)
    w1 = rng.standard_normal(50000).astype(np.float32)
    w2 = rng.standard_normal(30000).astype(np.float32)
    off, win = 12345, 16000
    num = 3
    mix, s1, s2 = native.mix_and_window(w1, w2, off, win, num)
    mix_len = max(len(w1), off + len(w2))
    src1 = np.zeros(max(mix_len, num * win), np.float32)
    src1[: len(w1)] = w1
    src2 = np.zeros_like(src1)
    src2[off : off + len(w2)] = w2
    ref_mix = (src1 + src2)[: num * win].reshape(num, win)
    np.testing.assert_array_equal(mix, ref_mix)
    np.testing.assert_array_equal(s1, src1[: num * win].reshape(num, win))
    np.testing.assert_array_equal(s2, src2[: num * win].reshape(num, win))


def test_mixer_native_vs_numpy_paths_identical():
    from css_tpu.data import SyntheticCorpus
    from css_tpu.data.mixer import MixtureSynthesizer

    c = SyntheticCorpus(num_speakers=4, utts_per_speaker=2)
    a = next(MixtureSynthesizer(c, batch_size=6, seed=7, use_native=True))
    b = next(MixtureSynthesizer(c, batch_size=6, seed=7, use_native=False))
    np.testing.assert_allclose(a["mix"], b["mix"], atol=1e-6)
    np.testing.assert_allclose(a["source1"], b["source1"], atol=1e-6)
    np.testing.assert_allclose(a["source2"], b["source2"], atol=1e-6)


def test_mix_and_window_k_matches_numpy():
    rng = np.random.default_rng(5)
    waves = [rng.standard_normal(n).astype(np.float32)
             for n in (50000, 30000, 20000)]
    offs = [0, 12345, 23456]
    win, num = 16000, 3
    mix, srcs = native.mix_and_window_k(waves, offs, win, num)
    total = num * win
    pads = []
    for o, w in zip(offs, waves):
        s = np.zeros(max(total, o + len(w)), np.float32)
        s[o : o + len(w)] = w
        pads.append(s[:total])
    np.testing.assert_array_equal(mix, np.sum(pads, 0).reshape(num, win))
    for i in range(3):
        np.testing.assert_array_equal(srcs[i], pads[i].reshape(num, win))


def test_mixer_native_vs_numpy_three_speakers():
    from css_tpu.data import SyntheticCorpus
    from css_tpu.data.mixer import MixtureSynthesizer

    c = SyntheticCorpus(num_speakers=5, utts_per_speaker=2)
    a = next(MixtureSynthesizer(c, batch_size=6, seed=7, use_native=True,
                                num_speakers=3))
    b = next(MixtureSynthesizer(c, batch_size=6, seed=7, use_native=False,
                                num_speakers=3))
    for key in ("mix", "source1", "source2", "source3"):
        np.testing.assert_allclose(a[key], b[key], atol=1e-6)
