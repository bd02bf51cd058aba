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


def test_prepare_libricss_layout(tmp_path):
    """Official LibriCSS release tree -> manifest + WER references
    (lhotse.prepare_libricss contract, separate_libricss.py:29)."""
    import json

    import numpy as np

    from css_tpu.cli import prepare
    from css_tpu.data.corpus import write_wav

    root = tmp_path / "for_release"
    rng = np.random.default_rng(0)
    sessions = [
        ("OV10", "overlap_ratio_10.0_sil0.1_1.0_session0_actual10.1"),
        ("0L", "overlap_ratio_0.0_sil2.9_3.0_session1_actual0.0"),
    ]
    for cond, name in sessions:
        d = root / cond / name
        (d / "record").mkdir(parents=True)
        (d / "transcription").mkdir()
        write_wav(d / "record" / "raw_recording.wav",
                  rng.standard_normal(1600).astype(np.float32) * 0.1)
        (d / "transcription" / "meeting_info.txt").write_text(
            "start\tend\tspeaker\tutterance_id\ttranscription\n"
            "0.0\t1.0\tspk1\tutt1\thello world\n"
            "1.0\t2.0\tspk2\tutt2\tgood morning\n")

    manifest = tmp_path / "recordings.jsonl"
    refs = tmp_path / "refs.jsonl"
    prepare.main(["libricss", "--corpus-dir", str(root),
                  "--output", str(manifest),
                  "--transcripts-output", str(refs)])
    recs = {json.loads(l)["utt_id"]: json.loads(l)["path"]
            for l in open(manifest)}
    assert set(recs) == {"session0_OV10", "session1_0L"}
    assert all(p.endswith("record/raw_recording.wav")
               for p in recs.values())
    ref_lines = {json.loads(l)["key"]: json.loads(l)["texts"]
                 for l in open(refs)}
    assert ref_lines["session0_OV10"] == ["hello world", "good morning"]
