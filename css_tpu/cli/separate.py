"""Continuous separation CLI.

Counterpart of scripts/python/separate_libricss.py:27-132: loads a trained
checkpoint (no ONNX export step — the same model definition serves), runs
the separator -> stitcher -> beamformer pipeline over each recording, and
writes {key}_0.wav / {key}_1.wav. ``--session`` filters recordings for
embarrassingly-parallel sharding across hosts (separate_libricss.py:32-33,
run.sh:20-35).

Recordings come from a directory of wavs or a jsonl manifest
({utt_id, path} per line). LibriCSS layouts (session directories of
wav files) work via --corpus-dir.
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

import numpy as np
import yaml

from css_tpu.data.corpus import read_wav
from css_tpu.executor.pipeline import CssPipeline
from css_tpu.models import MODELS
from css_tpu.trainer import checkpoint
from css_tpu.utils.logging import get_logger

log = get_logger(__name__)


def iter_recordings(args):
    if args.corpus_dir:
        for wav_path in sorted(Path(args.corpus_dir).rglob("*.wav")):
            key = wav_path.stem
            if args.session and args.session not in str(wav_path):
                continue
            yield key, wav_path
    elif args.manifest:
        for line in open(args.manifest):
            rec = json.loads(line)
            if args.session and args.session not in rec["utt_id"]:
                continue
            yield rec["utt_id"], rec["path"]
    else:
        raise SystemExit("need --corpus-dir or --manifest")


def main(argv=None):
    from css_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True,
                        help="pipeline YAML (conf/config_1ch.yaml schema)")
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--model", default="Conformer",
                        choices=sorted(MODELS.keys()))
    parser.add_argument("--corpus-dir", default=None)
    parser.add_argument("--manifest", default=None)
    parser.add_argument("--out-dir", required=True)
    parser.add_argument("--session", default=None,
                        help="only process recordings matching this "
                             "substring (per-session sharding)")
    parser.add_argument("--streaming", action="store_true",
                        help="use the incremental streaming executor "
                             "(bounded-latency; output matches offline "
                             "within float tolerance, modulo the global "
                             "peak normalization a causal system cannot do)")
    parser.add_argument("--stream-mode", choices=("window", "hop"),
                        default="window",
                        help="window: any model, CSS-algorithm latency "
                             "(~4.5 s); hop: causal model (--blstm-causal "
                             "checkpoint), frame-level latency (~48 ms + "
                             "dispatch granularity), no stitcher")
    parser.add_argument("--push-sec", type=float, default=0.8,
                        help="streaming push granularity in seconds")
    parser.add_argument("--stream-chunk-frames", type=int, default=8,
                        help="hop mode: STFT frames advanced per device "
                             "program — the latency/throughput knob "
                             "(chunk chaining is exact, so output is "
                             "identical at any value; 8 = 128 ms added "
                             "latency; raise to ~64 on high-dispatch-"
                             "latency backends for realtime throughput)")
    args = parser.parse_args(argv)

    config = yaml.safe_load(open(args.config))
    ckpt = checkpoint.load_checkpoint(args.checkpoint)
    conf = dict(ckpt.get("conf", {}))
    model = MODELS[args.model].build_model(conf)
    variables = {"params": ckpt["params"]}
    if ckpt.get("batch_stats"):
        variables["batch_stats"] = ckpt["batch_stats"]

    pipe = CssPipeline(model, variables, config)
    total_audio = 0.0
    t0 = time.perf_counter()
    for key, path in iter_recordings(args):
        wav, sr = read_wav(path)
        log.info("Separating %s (%.1fs)", key, np.shape(wav)[-1] / sr)
        if args.streaming:
            from css_tpu.executor.pipeline import write_streams

            push = int(args.push_sec * pipe.sr)
            wav2 = np.atleast_2d(np.asarray(wav, np.float32))
            if args.stream_mode == "hop":
                from css_tpu.executor.hop_streaming import HopStreamingPipeline

                stream = HopStreamingPipeline(
                    model, variables, config,
                    chunk_frames=args.stream_chunk_frames)
                outs = [stream.push(wav2[0, i : i + push])
                        for i in range(0, wav2.shape[-1], push)]
            else:
                from css_tpu.executor.streaming import StreamingCssPipeline

                stream = StreamingCssPipeline(model, variables, config)
                outs = [stream.push(wav2[:, i : i + push])
                        for i in range(0, wav2.shape[-1], push)]
            outs.append(stream.flush())
            full = np.concatenate(outs, axis=-1)
            write_streams(key, full, args.out_dir, pipe.sr)
        else:
            pipe.process_recording(key, wav, args.out_dir)
        total_audio += np.shape(wav)[-1] / sr
    dt = time.perf_counter() - t0
    if total_audio:
        log.info("Processed %.1fs of audio in %.1fs (%.2fx realtime)",
                 total_audio, dt, total_audio / dt)


if __name__ == "__main__":
    main()
