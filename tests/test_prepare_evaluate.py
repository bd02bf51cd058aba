"""prepare + evaluate CLIs."""

import json

import numpy as np

from css_tpu.cli import evaluate, prepare
from css_tpu.data import Corpus
from css_tpu.data.corpus import write_wav


def _librispeech_layout(root, rng):
    """speaker/chapter/utt.wav with LibriSpeech-style names."""
    for spk in ("19", "26"):
        for chap in ("198", "495"):
            d = root / spk / chap
            d.mkdir(parents=True)
            for i in range(2):
                wav = rng.standard_normal(16000).astype(np.float32) * 0.1
                write_wav(d / f"{spk}-{chap}-{i:04d}.wav", wav)


def test_prepare_utterances_librispeech_layout(tmp_path):
    rng = np.random.default_rng(0)
    corpus_dir = tmp_path / "LibriSpeech"
    _librispeech_layout(corpus_dir, rng)
    out = tmp_path / "train.jsonl"
    prepare.main(["utterances", "--corpus-dir", str(corpus_dir),
                  "--speaker-component", "-1", "--output", str(out)])
    recs = [json.loads(l) for l in open(out)]
    assert len(recs) == 8
    assert {r["speaker"] for r in recs} == {"19", "26"}
    assert all(abs(r["duration"] - 1.0) < 1e-3 for r in recs)
    corpus = Corpus.from_manifest(out)
    assert corpus.speakers == ["19", "26"]
    assert corpus.utterances[0].load().shape == (16000,)


def test_prepare_recordings_and_speaker_component(tmp_path):
    rng = np.random.default_rng(1)
    corpus_dir = tmp_path / "sessions"
    (corpus_dir / "OV10").mkdir(parents=True)
    write_wav(corpus_dir / "OV10" / "session0.wav",
              rng.standard_normal(8000).astype(np.float32) * 0.1)
    out = tmp_path / "recs.jsonl"
    prepare.main(["recordings", "--corpus-dir", str(corpus_dir),
                  "--output", str(out)])
    recs = [json.loads(l) for l in open(out)]
    assert recs[0]["utt_id"] == "OV10_session0"


def test_evaluate_cli_perfect_separation(tmp_path):
    rng = np.random.default_rng(2)
    est = tmp_path / "est"
    ref = tmp_path / "ref"
    mix_d = tmp_path / "mix"
    for d in (est, ref, mix_d):
        d.mkdir()
    u1 = rng.standard_normal(16000).astype(np.float32) * 0.1
    u2 = rng.standard_normal(16000).astype(np.float32) * 0.1
    write_wav(mix_d / "s0.wav", u1 + u2)
    write_wav(ref / "s0_src0.wav", u1)
    write_wav(ref / "s0_src1.wav", u2)
    # estimates = refs but swapped order: PIT must resolve it
    write_wav(est / "s0_0.wav", u2)
    write_wav(est / "s0_1.wav", u1)
    out = tmp_path / "results.jsonl"
    evaluate.main(["--estimates", str(est), "--references", str(ref),
                   "--mixtures", str(mix_d), "--output", str(out)])
    recs = [json.loads(l) for l in open(out)]
    assert recs[0]["si_snr_db"] > 30  # 16-bit quantization limited
    assert recs[0]["si_snri_db"] > 30
    assert recs[-1]["num_recordings"] == 1
