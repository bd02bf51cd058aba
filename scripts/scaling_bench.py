"""Weak-scaling benchmark harness: DP training throughput vs device count.

Per BASELINE.md the target is >=80% weak-scaling efficiency from 1 chip to
1 host to 2+ hosts. Run on a real slice:

  python scripts/scaling_bench.py                     # all local devices
  python scripts/scaling_bench.py --devices 1 4 8     # specific points
  (multi-host: launch with jax.distributed via --multihost on every host)

On a single chip (or the CPU-simulated mesh) the numbers are not
meaningful across points, but the harness is the same one a pod slice
runs. Per point: fixed PER-DEVICE batch, growing global batch; efficiency
= throughput(n) / (n * throughput(1)).
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
    parser = argparse.ArgumentParser()
    parser.add_argument("--devices", type=int, nargs="+", default=None)
    parser.add_argument("--per-device-batch", type=int, default=8)
    parser.add_argument("--window-sec", type=float, default=2.5)
    parser.add_argument("--iters", type=int, default=10)
    parser.add_argument("--model", default="Conformer")
    parser.add_argument("--bf16", action="store_true", default=True)
    parser.add_argument("--multihost", action="store_true")
    args = parser.parse_args()

    import jax

    if args.multihost:
        jax.distributed.initialize()

    from css_tpu.models import MODELS
    from css_tpu.objectives.mse import MeanSquaredError
    from css_tpu.parallel import DataParallel, make_mesh
    from css_tpu.trainer import LRSchedule, Trainer
    from css_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    all_devices = jax.devices()
    points = args.devices or sorted({1, len(all_devices)} |
                                    {2 ** i for i in range(
                                        int(np.log2(len(all_devices))) + 1)})
    sr = 16000
    win = int(args.window_sec * sr)
    results = []
    base = None
    for n in points:
        if n > len(all_devices):
            continue
        model = MODELS[args.model].build_model({"bf16": args.bf16})
        trainer = Trainer(model, MeanSquaredError(noise_weight=0.3),
                          LRSchedule(lr=1e-4, warmup=1000), optim="adam",
                          weight_decay=1e-2, grad_thresh=5.0)
        mesh = make_mesh(data=n, model=1, devices=all_devices[:n])
        dp = DataParallel(trainer, mesh)
        gbatch = args.per_device_batch * n
        rng = np.random.default_rng(0)
        batch = {
            "mix": rng.standard_normal((gbatch, win)).astype(np.float32) * 0.1,
            "source1": rng.standard_normal((gbatch, win)).astype(np.float32) * 0.05,
            "source2": rng.standard_normal((gbatch, win)).astype(np.float32) * 0.05,
        }
        key = jax.random.PRNGKey(0)
        state = dp.init_state(key, batch)
        state, m = dp.train_step(state, dict(batch), key)  # compile
        float(m["loss"])
        t0 = time.perf_counter()
        for _ in range(args.iters):
            state, m = dp.train_step(state, dict(batch), key)
        float(m["loss"])
        dt = (time.perf_counter() - t0) / args.iters
        thr = gbatch * args.window_sec / dt
        if base is None:
            base = thr / n
        eff = thr / (n * base)
        results.append({"devices": n, "audio_sec_per_s": round(thr, 1),
                        "per_chip": round(thr / n, 1),
                        "weak_scaling_eff": round(eff, 3)})
        print(json.dumps(results[-1]))
    print(json.dumps({"scaling": results}))


if __name__ == "__main__":
    main()
