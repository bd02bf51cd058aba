"""Manifest preparation CLI.

Replaces the reference's Lhotse manifest preparation (train.sh:27-38 and
lhotse's prepare_libricss used at separate_libricss.py:29) with a
dependency-free walker: scans a directory tree of wav files and writes the
jsonl manifests this framework consumes.

Two modes:
  utterances  -> training manifest {utt_id, speaker, duration, path};
                 speaker is taken from a path component or filename prefix
                 (LibriSpeech layout: .../<speaker>/<chapter>/<utt>.wav)
  recordings  -> separation manifest {utt_id, path} for cli.separate
                 (LibriCSS sessions: any wav tree; keys from relative path)
"""

from __future__ import annotations

import argparse
import json
import wave
from pathlib import Path

from css_tpu.utils.logging import get_logger

log = get_logger(__name__)


def wav_duration(path: Path) -> float:
    with wave.open(str(path), "rb") as w:
        return w.getnframes() / w.getframerate()


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("mode", choices=["utterances", "recordings"])
    parser.add_argument("--corpus-dir", required=True)
    parser.add_argument("--output", required=True)
    parser.add_argument("--speaker-component", type=int, default=0,
                        help="path component index (relative to corpus dir) "
                             "holding the speaker id; -1 = filename prefix "
                             "before the first '-' (LibriSpeech style)")
    args = parser.parse_args(argv)

    corpus = Path(args.corpus_dir)
    n = 0
    with open(args.output, "w") as out:
        for wav_path in sorted(corpus.rglob("*.wav")):
            rel = wav_path.relative_to(corpus)
            utt_id = str(rel.with_suffix("")).replace("/", "_")
            if args.mode == "recordings":
                rec = {"utt_id": utt_id, "path": str(wav_path)}
            else:
                if args.speaker_component == -1:
                    speaker = wav_path.stem.split("-")[0]
                else:
                    speaker = rel.parts[args.speaker_component]
                rec = {
                    "utt_id": utt_id,
                    "speaker": speaker,
                    "duration": round(wav_duration(wav_path), 3),
                    "path": str(wav_path),
                }
            out.write(json.dumps(rec) + "\n")
            n += 1
    log.info("Wrote %d entries to %s", n, args.output)


if __name__ == "__main__":
    main()
