"""Fused-dropout kernel: real-TPU validation + step-level A/B.

The CPU tests (tests/test_dropout_pallas.py) exercise the off-TPU
fallback (pltpu.prng_* has no CPU lowering); this script validates the
KERNEL path on hardware and measures the end-to-end train-step win:

  1. statistics + determinism + fwd/bwd mask identity of fused_dropout
     on the TPU;
  2. Conformer-large train step (batch 32 x 2.5 s AND 64 x 2.064 s,
     honest device_get flush) with stock nn.Dropout vs
     CSS_TPU_FAST_DROPOUT=1 — dropout measured at ~17% of the step
     (BASELINE.md round 4), so the ceiling here is ~+20%.

The timing harness deliberately mirrors scripts/step_shapes.py
(staged `_train_step`, best-of-repeats, device_get flush) — NOT
bench.py's loop-level bench — so the A/B deltas are directly comparable
to the step_shapes shape-sensitivity numbers they extend.

  python scripts/dropout_kernel_bench.py [--iters 20]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root

import argparse
import json
import os
import time

import numpy as np


def validate_kernel():
    import jax
    import jax.numpy as jnp

    from css_tpu.ops.dropout_pallas import fused_dropout

    on_tpu = jax.devices()[0].platform == "tpu"
    interp = not on_tpu
    x = jnp.ones((1024, 256), jnp.bfloat16)
    rate = 0.1
    y = np.asarray(jax.jit(
        lambda v: fused_dropout(v, jnp.int32(7), rate, interp))(x),
        np.float32)
    kept = float((y != 0).mean())
    y2 = np.asarray(jax.jit(
        lambda v: fused_dropout(v, jnp.int32(7), rate, interp))(x),
        np.float32)
    det = bool((y == y2).all())
    g = jax.jit(jax.grad(
        lambda v: fused_dropout(v, jnp.int32(7), rate,
                                interp).astype(jnp.float32).sum()))(x)
    g = np.asarray(g, np.float32)
    mask_match = bool(((g != 0) == (y != 0)).all())
    out = {"platform": "tpu" if on_tpu else "fallback",
           "keep_frac": round(kept, 4), "expect_keep": 1 - rate,
           "deterministic": det, "bwd_mask_matches_fwd": mask_match}
    print(json.dumps(out), flush=True)
    assert abs(kept - (1 - rate)) < 0.01 and det and mask_match


def step_ab(iters: int, repeats: int):
    import jax
    import jax.numpy as jnp

    sr = 16000
    host = np.random.default_rng(0)
    dev = jax.devices()[0]

    def run(batch_size, win_sec, tag):
        # make_dropout reads the env at trace time, so a fresh Trainer
        # (fresh jit trace) is enough to flip the dropout implementation
        import css_tpu.models.conformer as conf_mod
        from css_tpu.objectives.mse import MeanSquaredError
        from css_tpu.trainer import LRSchedule, Trainer
        from css_tpu.trainer.loop import training_rng

        win = int(win_sec * sr)
        batch = jax.device_put(
            {k: (host.standard_normal((batch_size, win)) * s).astype(
                np.float32)
             for k, s in (("mix", 0.1), ("source1", 0.05),
                          ("source2", 0.05))}, dev)
        trainer = Trainer(conf_mod.Conformer(compute_dtype=jnp.bfloat16),
                          MeanSquaredError(noise_weight=0.3),
                          LRSchedule(lr=1e-4, warmup=1000), optim="adam",
                          weight_decay=1e-2, grad_thresh=5.0)
        rng = training_rng(0)
        state = trainer.init_state(rng, batch)
        state, m = trainer._train_step(state, dict(batch), rng)
        jax.device_get(m["loss"])
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            for _ in range(iters):
                state, m = trainer._train_step(state, dict(batch), rng)
            jax.device_get(m["loss"])
            best = min(best, (time.perf_counter() - t0) / iters)
        out = {"config": tag, "batch": batch_size, "win_sec": win_sec,
               "fast_dropout": bool(os.environ.get("CSS_TPU_FAST_DROPOUT")),
               "ms_per_step": round(best * 1e3, 2),
               "audio_sec_per_s": round(batch_size * win_sec / best, 1)}
        print(json.dumps(out), flush=True)

    for batch_size, win_sec in ((32, 2.5), (64, 2.064)):
        os.environ.pop("CSS_TPU_FAST_DROPOUT", None)
        run(batch_size, win_sec, "stock")
        os.environ["CSS_TPU_FAST_DROPOUT"] = "1"
        run(batch_size, win_sec, "fast")
    os.environ.pop("CSS_TPU_FAST_DROPOUT", None)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--validate-only", action="store_true")
    args = ap.parse_args()

    from css_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    validate_kernel()
    if not args.validate_only:
        step_ab(args.iters, args.repeats)


if __name__ == "__main__":
    main()
