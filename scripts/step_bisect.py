"""Settle the 4x train-step contradiction (VERDICT r3 next #1).

BENCH_r03 measured the real loop at 19.16 ms/step while mfu_bench
reports 4.88 ms/step (73.8% MFU). The two measurements differ in ONE
load-bearing detail: mfu_bench flushes its timing loop with
``jax.block_until_ready(state.params)`` where ``state`` is the output of
a step jitted with ``donate_argnums=(0,)`` — and dispatch_probe.py
already observed that on the axon backend "blocking on donated outputs
returns early, which makes enqueue look like execution".

This probe times the IDENTICAL step program under different flushes:
  a) block_until_ready(new_state.params)   [mfu_bench's method]
  b) jax.device_get(metrics["loss"])       [forces real execution]
  c) per-call device_get (serial)          [upper bound, no pipelining]
  d) donate=False trainer + block_until_ready  [donation out of the picture]
and attributes the honest step time: forward-only, value_and_grad only,
full step (grads + clip + adam + where-guards).

  python scripts/step_bisect.py [--iters 30] [--batch 32] [--win-sec 2.5]
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
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--win-sec", type=float, default=2.5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from css_tpu.models.conformer import Conformer
    from css_tpu.objectives.mse import MeanSquaredError
    from css_tpu.trainer import LRSchedule, Trainer
    from css_tpu.trainer.loop import training_rng
    from css_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    sr = 16000
    win = int(args.win_sec * sr)
    host = np.random.default_rng(0)
    dev = jax.devices()[0]
    batch = jax.device_put(
        {k: (host.standard_normal((args.batch, win)) * s).astype(np.float32)
         for k, s in (("mix", 0.1), ("source1", 0.05), ("source2", 0.05))},
        dev)
    rng = training_rng(0)

    def make_trainer(donate):
        model = Conformer(compute_dtype=jnp.bfloat16)
        return Trainer(model, MeanSquaredError(noise_weight=0.3),
                       LRSchedule(lr=1e-4, warmup=1000), optim="adam",
                       weight_decay=1e-2, grad_thresh=5.0, donate=donate)

    def best_of(fn):
        best = float("inf")
        for _ in range(args.repeats):
            best = min(best, fn())
        return best

    results = {}

    # ---- donated trainer (the shipped configuration)
    tr = make_trainer(True)
    state = tr.init_state(rng, batch)
    state, m = tr._train_step(state, dict(batch), rng)
    jax.device_get(m["loss"])  # compile + real flush

    def run_block_params():
        nonlocal state
        t0 = time.perf_counter()
        for _ in range(args.iters):
            state, m = tr._train_step(state, dict(batch), rng)
        jax.block_until_ready(state.params)
        return (time.perf_counter() - t0) / args.iters

    def run_get_loss():
        nonlocal state
        t0 = time.perf_counter()
        for _ in range(args.iters):
            state, m = tr._train_step(state, dict(batch), rng)
        jax.device_get(m["loss"])
        return (time.perf_counter() - t0) / args.iters

    def run_serial():
        nonlocal state
        t0 = time.perf_counter()
        for _ in range(args.iters):
            state, m = tr._train_step(state, dict(batch), rng)
            jax.device_get(m["loss"])
        return (time.perf_counter() - t0) / args.iters

    results["a_block_params_ms"] = round(best_of(run_block_params) * 1e3, 2)
    print(json.dumps({"a_block_params_ms": results["a_block_params_ms"]}),
          flush=True)
    results["b_get_loss_ms"] = round(best_of(run_get_loss) * 1e3, 2)
    print(json.dumps({"b_get_loss_ms": results["b_get_loss_ms"]}), flush=True)
    results["c_serial_ms"] = round(best_of(run_serial) * 1e3, 2)
    print(json.dumps({"c_serial_ms": results["c_serial_ms"]}), flush=True)

    # ---- donate=False trainer: block_until_ready on a NON-donated output
    tr2 = make_trainer(False)
    state2 = tr2.init_state(rng, batch)
    state2, m2 = tr2._train_step(state2, dict(batch), rng)
    jax.device_get(m2["loss"])

    def run_nodonate_block():
        nonlocal state2
        t0 = time.perf_counter()
        for _ in range(args.iters):
            state2, m2 = tr2._train_step(state2, dict(batch), rng)
        jax.block_until_ready(state2.params)
        return (time.perf_counter() - t0) / args.iters

    results["d_nodonate_block_ms"] = round(
        best_of(run_nodonate_block) * 1e3, 2)
    print(json.dumps({"d_nodonate_block_ms": results["d_nodonate_block_ms"]}),
          flush=True)

    # ---- honest attribution: forward / value_and_grad / full step
    feats = jax.jit(tr._featurize)(batch)
    jax.block_until_ready(feats["input"])
    params, stats = state.params, state.batch_stats

    fwd = jax.jit(lambda p, s, f, r: tr._loss_fn(p, s, f, r, True)[0])
    vgrad = jax.jit(lambda p, s, f, r: jax.value_and_grad(
        tr._loss_fn, has_aux=True)(p, s, f, r, True))

    loss = fwd(params, stats, feats, rng)
    jax.device_get(loss)

    def run_fwd():
        t0 = time.perf_counter()
        for _ in range(args.iters):
            loss = fwd(params, stats, feats, rng)
        jax.device_get(loss)
        return (time.perf_counter() - t0) / args.iters

    results["fwd_only_ms"] = round(best_of(run_fwd) * 1e3, 2)
    print(json.dumps({"fwd_only_ms": results["fwd_only_ms"]}), flush=True)

    (loss, _), grads = vgrad(params, stats, feats, rng)
    jax.device_get(loss)

    def run_vgrad():
        t0 = time.perf_counter()
        for _ in range(args.iters):
            (loss, _), grads = vgrad(params, stats, feats, rng)
        jax.device_get(loss)
        return (time.perf_counter() - t0) / args.iters

    results["value_and_grad_ms"] = round(best_of(run_vgrad) * 1e3, 2)
    print(json.dumps({"value_and_grad_ms": results["value_and_grad_ms"]}),
          flush=True)

    # ---- XLA cost analysis of the full step (flops -> honest MFU)
    lowered = jax.jit(tr._train_step_impl).lower(state, batch, rng)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    cost = cost[0] if isinstance(cost, (list, tuple)) else cost
    flops = float(cost.get("flops", 0.0)) if cost else 0.0
    honest_ms = results["b_get_loss_ms"]
    results["xla_flops_per_step"] = flops
    results["honest_tflops_per_s"] = round(flops / (honest_ms / 1e3) / 1e12, 2)
    results["honest_mfu_vs_197T"] = round(
        flops / (honest_ms / 1e3) / 197e12, 4)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
