"""Settle the fused-LSTM training kernel (VERDICT round-2 weak #5).

`ops/lstm_pallas.py` ships a custom-VJP fused LSTM (forward + backward
Pallas kernels) behind CSS_TPU_FUSED_LSTM_TRAIN=1, grad-parity-tested in
interpret mode but never measured on hardware. This bench measures, at
the BLSTM-large bench shape (reference blstm.py CLI defaults: hidden 1024
bidirectional -> 512 per direction; batch 32 x 2.4 s windows = 150
frames):

  fwd : lstm_fused (Pallas)   vs lstm_scan (XLA while-loop)
  train: value_and_grad through lstm_fused_train vs through the scan

Decision rule (printed): flip the training default if the fused VJP wins
by >10%; delete the env flag if it loses. Run on the real TPU.
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
from css_tpu.ops.lstm_pallas import lstm_fused, lstm_fused_train, supported


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

        def loss_scan(xw, whh):
            return jnp.sum(lstm_scan(xw, whh, h, use_pallas=False) ** 2)

        def loss_fused(xw, whh):
            return jnp.sum(lstm_fused_train(xw, whh, h) ** 2)

        g_scan = jax.jit(jax.value_and_grad(loss_scan, argnums=(0, 1)))
        g_fused = jax.jit(jax.value_and_grad(loss_fused, argnums=(0, 1)))
        ms_gscan = timeit(g_scan, xw, whh)
        ms_gfused = timeit(g_fused, xw, whh)

        # numerics cross-check at bench shape (not just interpret mode)
        v1, (d1, w1) = g_scan(xw, whh)
        v2, (d2, w2) = g_fused(xw, whh)
        tol = 1e-3 if dt == jnp.float32 else 0.12
        rel = float(jnp.abs(v1 - v2) / (jnp.abs(v1) + 1e-9))
        gerr = float(jnp.max(jnp.abs(d1.astype(jnp.float32)
                                     - d2.astype(jnp.float32)))
                     / (float(jnp.max(jnp.abs(d1.astype(jnp.float32))))
                        + 1e-9))
        results[name] = {
            "fwd_scan_ms": round(ms_scan, 3),
            "fwd_fused_ms": round(ms_fused, 3),
            "fwd_speedup": round(ms_scan / ms_fused, 2),
            "grad_scan_ms": round(ms_gscan, 3),
            "grad_fused_ms": round(ms_gfused, 3),
            "grad_speedup": round(ms_gscan / ms_gfused, 2),
            "loss_rel_err": rel,
            "grad_max_rel_err": gerr,
            "numerics_ok": rel < tol and gerr < tol,
        }
        print(f"{name}: fwd scan {ms_scan:.3f} ms / fused {ms_fused:.3f} ms "
              f"({ms_scan/ms_fused:.2f}x) | grad scan {ms_gscan:.3f} ms / "
              f"fused {ms_gfused:.3f} ms ({ms_gscan/ms_gfused:.2f}x) | "
              f"numerics ok={results[name]['numerics_ok']}")

    speedups = [r["grad_speedup"] for r in results.values()
                if r["numerics_ok"]]
    verdict = "keep-flag-off"
    if speedups and min(speedups) > 1.1:
        verdict = "flip-default-on"
    elif speedups and max(speedups) < 1.0:
        verdict = "delete-flag"
    print(json.dumps({"backend": jax.default_backend(),
                      "shape": {"batch": b, "frames": t, "hidden": h},
                      "results": results, "verdict": verdict}))


if __name__ == "__main__":
    main()
