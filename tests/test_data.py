"""Mixture synthesis semantics (css/datasets/separation.py:163-267)."""

import numpy as np

from css_tpu.data import Corpus, SyntheticCorpus
from css_tpu.data.corpus import (
    read_wav,
    synthetic_noise_pool,
    synthetic_rir_pool,
    write_wav,
)
from css_tpu.data.mixer import MixtureSynthesizer


def test_synthetic_corpus_structure():
    c = SyntheticCorpus(num_speakers=4, utts_per_speaker=3)
    assert len(c) == 12
    assert len(c.speakers) == 4
    for u in c.utterances:
        assert u.load().dtype == np.float32
        assert abs(len(u.load()) / 16000 - u.duration) < 1e-3


def test_mixer_batch_shapes_and_mixture_sum():
    c = SyntheticCorpus(num_speakers=4, utts_per_speaker=3)
    ds = MixtureSynthesizer(c, batch_size=8, min_window=2.0, max_window=4.0,
                            seed=3)
    b = next(ds)
    assert b["mix"].shape == b["source1"].shape == b["source2"].shape
    assert b["mix"].shape[0] == 8
    win = b["mix"].shape[1]
    assert win in {int(w * 16000) for w in ds.window_buckets}
    # no augmentation configured -> mixture is exactly the sum of sources
    np.testing.assert_allclose(b["mix"], b["source1"] + b["source2"], atol=1e-6)
    assert 0.0 <= float(b["ovl"]) <= 1.0


def test_mixer_augmentation_keeps_targets_clean():
    c = SyntheticCorpus(num_speakers=4, utts_per_speaker=3)
    rirs = synthetic_rir_pool(4)
    noises = synthetic_noise_pool(2, dur=2.0)
    ds = MixtureSynthesizer(c, batch_size=8, rir_pool=rirs, noise_pool=noises,
                            reverb_p=1.0, noise_p=1.0, seed=4)
    b = next(ds)
    # mixture is augmented, targets stay the clean sources: mix != s1+s2
    assert np.abs(b["mix"] - (b["source1"] + b["source2"])).max() > 1e-4
    # targets are untouched clean signals (finite, bounded)
    assert np.isfinite(b["source1"]).all() and np.isfinite(b["source2"]).all()


def test_wav_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    x = (rng.standard_normal(1000).astype(np.float32) * 0.1)
    p = tmp_path / "x.wav"
    write_wav(p, x, 16000)
    y, sr = read_wav(p)
    assert sr == 16000
    np.testing.assert_allclose(y, x, atol=1e-4)
    # multichannel
    x2 = rng.standard_normal((3, 500)).astype(np.float32) * 0.1
    p2 = tmp_path / "x2.wav"
    write_wav(p2, x2, 16000)
    y2, _ = read_wav(p2)
    assert y2.shape == (3, 500)
    np.testing.assert_allclose(y2, x2, atol=1e-4)


def test_manifest_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    utts = []
    for i in range(4):
        x = rng.standard_normal(8000).astype(np.float32) * 0.1
        p = tmp_path / f"u{i}.wav"
        write_wav(p, x)
        from css_tpu.data.corpus import Utterance

        utts.append(Utterance(f"u{i}", f"spk{i % 2}", 0.5, path=str(p)))
    c = Corpus(utts)
    c.to_manifest(tmp_path / "manifest.jsonl")
    c2 = Corpus.from_manifest(tmp_path / "manifest.jsonl")
    assert len(c2) == 4 and c2.speakers == ["spk0", "spk1"]
    np.testing.assert_allclose(c2.utterances[0].load(),
                               c.utterances[0].load(), atol=1e-4)


def test_mixer_raises_when_window_exceeds_all_utterances():
    import pytest

    c = SyntheticCorpus(num_speakers=3, utts_per_speaker=2,
                        min_dur=1.0, max_dur=1.5)
    ds = MixtureSynthesizer(c, batch_size=4, min_window=10.0,
                            max_window=10.0, seed=0)
    with pytest.raises(RuntimeError, match="window"):
        next(ds)


def test_stitcher_single_window():
    import jax.numpy as jnp

    from css_tpu.executor.stitcher import Stitcher

    rng = np.random.default_rng(0)
    masks = rng.uniform(0, 1, (1, 150, 9, 3)).astype(np.float32)
    mags = rng.uniform(0, 1, (1, 150, 9)).astype(np.float32)
    st = Stitcher()
    r1, r2, rn = [np.asarray(x) for x in st(masks, mags)]
    assert r1.shape == (150, 9)
    assert np.isfinite(r1).all()


def test_formant_voice_timbre_signature():
    """voice="formant" gives each speaker a persistent spectral envelope.

    Speaker identity must be carried by timbre (vocal-tract resonances),
    not just f0 — the cue that makes close-f0 speaker pairs separable
    (the catastrophic sessions of the held-out quality protocol,
    BASELINE.md). Checks: determinism, finite audio, and that the
    long-term log-spectral envelope is far more similar within a speaker
    than across speakers.
    """
    import itertools

    c1 = SyntheticCorpus(num_speakers=4, utts_per_speaker=3, seed=7,
                         min_dur=2.0, max_dur=3.0, voice="formant",
                         f0_max=400)
    c2 = SyntheticCorpus(num_speakers=4, utts_per_speaker=3, seed=7,
                         min_dur=2.0, max_dur=3.0, voice="formant",
                         f0_max=400)
    for ua, ub in zip(c1.utterances, c2.utterances):
        assert np.array_equal(ua.array, ub.array)
        assert np.isfinite(ua.array).all()

    def envelope(x):
        frames = (np.lib.stride_tricks.sliding_window_view(x, 512)[::256]
                  * np.hanning(512))
        e = np.log(np.abs(np.fft.rfft(frames, axis=-1)).mean(0) + 1e-8)
        return np.convolve(e, np.ones(9) / 9, mode="same")

    def dist(x, y):
        x, y = x - x.mean(), y - y.mean()
        return 1 - x @ y / (np.linalg.norm(x) * np.linalg.norm(y))

    envs = {u.utt_id: envelope(u.array) for u in c1.utterances}
    within, across = [], []
    for u1, u2 in itertools.combinations(c1.utterances, 2):
        d = dist(envs[u1.utt_id], envs[u2.utt_id])
        (within if u1.speaker == u2.speaker else across).append(d)
    assert np.mean(across) > 3 * np.mean(within), (
        f"across {np.mean(across):.3f} vs within {np.mean(within):.3f}")


def test_voice_models_rng_isolation():
    """The legacy harmonic corpus is unchanged by the formant code path."""
    a = SyntheticCorpus(num_speakers=2, utts_per_speaker=2, seed=5,
                        min_dur=1.0, max_dur=1.5)
    b = SyntheticCorpus(num_speakers=2, utts_per_speaker=2, seed=5,
                        min_dur=1.0, max_dur=1.5, voice="harmonic")
    for ua, ub in zip(a.utterances, b.utterances):
        assert np.array_equal(ua.array, ub.array)


def test_window_bucket_frame_alignment():
    """--align-window-frames snaps buckets to lane-tile frame counts
    (T=155 pads attention to 256 lanes; measured 13% step throughput,
    scripts/step_shapes.py)."""
    from css_tpu.data.mixer import default_window_buckets

    raw = default_window_buckets(2.0, 4.0, 0.5)
    assert raw == [2.0, 2.5, 3.0, 3.5, 4.0]
    aligned = default_window_buckets(2.0, 4.0, 0.5, frame_align=128)
    for w in aligned:
        frames = (int(w * 16000) - 512) // 256 + 1
        assert frames % 128 == 0, (w, frames)
    # alignment dedupes collapsed buckets but keeps the range covered
    assert aligned[0] <= 2.1 and aligned[-1] >= 4.0
