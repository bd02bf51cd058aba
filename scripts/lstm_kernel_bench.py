"""Fused-LSTM kernel bench (VERDICT round-2 weak #5 — SETTLED).

Measured 2026-08-19 on 1x v5e at the BLSTM-large bench shape (batch 32 x
150 frames x hidden 512/direction):

  fwd : fused Pallas 4.90x (f32) / 1.85x (bf16) over the XLA scan — KEPT
        (eval/inference path, models/blstm.py lstm_scan use_pallas).
  grad: fused custom-VJP 0.49x (f32) / 0.62x (bf16) of the scan's free
        VJP — the training kernel + env flag were DELETED.

This bench now measures the surviving forward path only (regression
guard for the keep decision).
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root

import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from css_tpu.models.blstm import lstm_scan
from css_tpu.ops.lstm_pallas import lstm_fused, supported


def timeit(fn, *args, iters=50, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3  # ms


def main():
    b, t, h = 32, 150, 512
    dtypes = [("f32", jnp.float32), ("bf16", jnp.bfloat16)]
    rng = np.random.default_rng(0)
    results = {}
    for name, dt in dtypes:
        if not supported(b, h, dt):
            print(f"{name}: shape unsupported, skipped")
            continue
        xw = jnp.asarray(rng.standard_normal((b, t, 4 * h)) * 0.1, dt)
        whh = jnp.asarray(rng.standard_normal((h, 4 * h)) * 0.1, dt)

        fwd_scan = jax.jit(functools.partial(
            lstm_scan, hidden=h, use_pallas=False))
        fwd_fused = jax.jit(functools.partial(
            lstm_fused, hidden=h))
        ms_scan = timeit(fwd_scan, xw, whh)
        ms_fused = timeit(fwd_fused, xw, whh)

        # numerics cross-check at bench shape (not just interpret mode)
        o1 = fwd_scan(xw, whh).astype(jnp.float32)
        o2 = fwd_fused(xw, whh).astype(jnp.float32)
        err = float(jnp.max(jnp.abs(o1 - o2))
                    / (float(jnp.max(jnp.abs(o1))) + 1e-9))
        tol = 1e-4 if dt == jnp.float32 else 0.12
        results[name] = {
            "fwd_scan_ms": round(ms_scan, 3),
            "fwd_fused_ms": round(ms_fused, 3),
            "fwd_speedup": round(ms_scan / ms_fused, 2),
            "max_rel_err": err,
            "numerics_ok": err < tol,
        }
        print(f"{name}: fwd scan {ms_scan:.3f} ms / fused {ms_fused:.3f} ms "
              f"({ms_scan/ms_fused:.2f}x) | numerics ok="
              f"{results[name]['numerics_ok']}")

    speedups = [r["fwd_speedup"] for r in results.values()
                if r["numerics_ok"]]
    verdict = "keep" if speedups and min(speedups) > 1.1 else "re-evaluate"
    print(json.dumps({"backend": jax.default_backend(),
                      "shape": {"batch": b, "frames": t, "hidden": h},
                      "results": results, "verdict": verdict}))


if __name__ == "__main__":
    main()
