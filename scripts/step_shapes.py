"""Train-step shape/dtype sensitivity: where does the 19%-MFU step lose?

The round-4 ablation (exp/ablate_r4.log) shows per-block time perfectly
linear (16 blocks ~1.36 ms each) — the whole encoder runs at ~19% MFU
uniformly rather than one op being pathological. Hypotheses this probe
separates, all judged by audio-sec/s/chip (the north star), honest
device_get flush:

  * lane padding: T=156 frames pads to 256 lanes inside attention
    (scores are (B, H, T, T)); a window whose frame count is a
    128-multiple (2.064 s -> T=128) wastes nothing;
  * small-matmul overhead: batch 64/128 amortizes per-op fixed cost;
  * MXU vs overhead bound: if fp32 time ~= bf16 time the step is NOT
    MXU-bound and bigger tiles won't help;
  * dropout PRNG: rbg vs threefry cost at today's runtime.

  python scripts/step_shapes.py [--iters 20]
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
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--only", default="base,dtype,ladder,micro",
                    help="comma list of config groups to run "
                         "(base,dtype,ladder,micro) — lets a rerun skip "
                         "groups a tunnel RPC failure already measured")
    args = ap.parse_args()
    groups = set(args.only.split(","))

    import jax
    import jax.numpy as jnp

    from css_tpu.models.conformer import Conformer
    from css_tpu.objectives.mse import MeanSquaredError
    from css_tpu.trainer import LRSchedule, Trainer
    from css_tpu.trainer.loop import training_rng
    from css_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    sr = 16000
    host = np.random.default_rng(0)
    dev = jax.devices()[0]

    def run(batch_size, win_sec, dtype="bf16", prng="rbg"):
        win = int(win_sec * sr)
        batch = jax.device_put(
            {k: (host.standard_normal((batch_size, win)) * s).astype(
                np.float32)
             for k, s in (("mix", 0.1), ("source1", 0.05),
                          ("source2", 0.05))}, dev)
        model = Conformer(compute_dtype=jnp.bfloat16 if dtype == "bf16"
                          else jnp.float32)
        trainer = Trainer(model, MeanSquaredError(noise_weight=0.3),
                          LRSchedule(lr=1e-4, warmup=1000), optim="adam",
                          weight_decay=1e-2, grad_thresh=5.0)
        rng = training_rng(0, prng)
        state = trainer.init_state(rng, batch)
        state, m = trainer._train_step(state, dict(batch), rng)
        jax.device_get(m["loss"])
        best = float("inf")
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            for _ in range(args.iters):
                state, m = trainer._train_step(state, dict(batch), rng)
            jax.device_get(m["loss"])
            best = min(best, (time.perf_counter() - t0) / args.iters)
        n_frames = (win - 512) // 256 + 1
        out = {
            "batch": batch_size, "win_sec": win_sec, "frames": n_frames,
            "dtype": dtype, "prng": prng,
            "ms_per_step": round(best * 1e3, 2),
            "audio_sec_per_s": round(batch_size * win_sec / best, 1),
        }
        print(json.dumps(out), flush=True)
        return out

    def safe(*a, **kw):
        # a single tunnel RPC failure must not kill the whole sweep
        # (round 5: a remote_compile body-closed error did exactly that)
        try:
            run(*a, **kw)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"config": [a, kw], "error": str(e)[:200]}),
                  flush=True)

    if "base" in groups:
        safe(32, 2.5)                  # baseline (BENCH workload)
        safe(32, 2.064)                # T=128: no lane padding anywhere
        safe(64, 2.5)                  # amortize small-op overhead
        safe(64, 2.064)
        safe(128, 2.064)
    if "dtype" in groups:
        safe(32, 2.5, dtype="f32")     # MXU-bound test: f32 ~2x => MXU
        safe(32, 2.5, prng="threefry2x32")  # dropout PRNG cost today
    if "ladder" in groups:
        # round 5: can a 3-bucket ALIGNED ladder {2.064, 3.088, 4.112}s
        # (T=128/192/256, frame_align=64) recover most of the alignment
        # speedup without round 4's 2-bucket distribution collapse?
        safe(32, 3.088)                # T=192 (scores pad 192->256)
        safe(64, 3.088)
        safe(32, 4.112)                # T=256 fully aligned long bucket
    if "micro" not in groups:
        return

    # micro: is padding the 257-bin feature dim to 384 worth it?
    # prediction: NO — ceil(257/128)=3 K-tiles, same as 384/128=3, so
    # the MXU does identical work either way (docs/ROADMAP.md item)
    import jax.numpy as jnp2

    def micro_matmul(k):
        a = jnp2.asarray(host.standard_normal((4960, k)), jnp2.bfloat16)
        b = jnp2.asarray(host.standard_normal((k, 256)), jnp2.bfloat16)
        f = jax.jit(lambda a, b: a @ b)
        jax.device_get(f(a, b))
        best = float("inf")
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            for _ in range(200):
                out = f(a, b)
            jax.device_get(out)
            best = min(best, time.perf_counter() - t0)
        print(json.dumps({"micro_matmul_k": k,
                          "us": round(best / 200 * 1e6, 1)}), flush=True)

    for k in (256, 257, 384):
        micro_matmul(k)


if __name__ == "__main__":
    main()
