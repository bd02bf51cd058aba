"""Warm hop-streaming throughput/latency (VERDICT r3 next #4).

The one-shot CLI number is compile-dominated on this backend (first
chunk program ~2-4 min remote compile); the capability claim is the
WARM rate: process one session to compile, then time fresh sessions.

  python scripts/hop_bench.py --checkpoint exp/c2/best.1.mdl --model BLSTM \
      [--chunk-frames 8 64] [--session-sec 30]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--model", default="BLSTM")
    ap.add_argument("--chunk-frames", type=int, nargs="+", default=[8, 64])
    ap.add_argument("--session-sec", type=float, default=30.0)
    ap.add_argument("--push-sec", type=float, default=1.2)
    args = ap.parse_args()

    from css_tpu.data import SyntheticCorpus
    from css_tpu.data.sessions import make_session
    from css_tpu.executor.hop_streaming import HopStreamingPipeline
    from css_tpu.models import MODELS
    from css_tpu.trainer import checkpoint as ckpt_io

    ckpt = ckpt_io.load_checkpoint(args.checkpoint)
    model = MODELS[args.model].build_model(dict(ckpt.get("conf", {})))
    variables = {"params": ckpt["params"]}
    if ckpt.get("batch_stats"):
        variables["batch_stats"] = ckpt["batch_stats"]
    config = {"sampling_rate": 16000,
              "separation": {"frame_length": 512, "frame_shift": 256},
              "beamforming": {"wta_thresh": 1e-4}}

    corpus = SyntheticCorpus(num_speakers=6, utts_per_speaker=4, seed=321,
                             voice="formant", f0_max=400.0)
    rng = np.random.default_rng(321)
    sessions = [make_session(corpus, rng, args.session_sec)[0]
                for _ in range(3)]
    push = int(args.push_sec * 16000)

    for cf in args.chunk_frames:
        def run(wav):
            stream = HopStreamingPipeline(model, variables, config,
                                          chunk_frames=cf)
            t0 = time.perf_counter()
            for i in range(0, wav.shape[-1], push):
                stream.push(wav[i : i + push])
            stream.flush()
            return time.perf_counter() - t0

        t_cold = run(sessions[0])  # compiles the cf-frame + 1-frame programs
        t_warm = min(run(s) for s in sessions[1:])
        print(json.dumps({
            "chunk_frames": cf,
            "added_latency_ms": round(cf * 256 / 16.0, 1),
            "cold_s": round(t_cold, 1),
            "warm_s": round(t_warm, 2),
            "warm_realtime_x": round(args.session_sec / t_warm, 2),
        }), flush=True)


if __name__ == "__main__":
    main()
