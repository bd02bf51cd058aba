"""Conformer train-step timing + MFU measurement (VERDICT r1 item 2).

Measures ms/step of the jitted Conformer train step on device-staged
batches, pulls the compiled program's FLOP count from XLA's cost
analysis, and reports MFU against the chip's peak (v5e bf16 ~197
TFLOP/s). Also times the standalone forward and, optionally, the fused
Pallas BLSTM eval path.

HISTORY (round 4): this script used to flush its timing loop with
``jax.block_until_ready(state.params)`` on the DONATED train-state — on
the axon backend that returns at enqueue time, and the resulting
"4.88 ms/step / 73.8% MFU" headline (BASELINE.md rounds 1-3) was an
enqueue-rate artifact, ~4x faster than physics: the same program's
forward alone costs 6.68 ms under an honest device_get flush
(scripts/step_bisect.py). Honest numbers: ~19 ms/step, ~19% MFU.

  python scripts/mfu_bench.py [--batch 32] [--win-sec 2.5] [--iters 30]
                              [--fp32] [--blstm]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root

import argparse
import json
import time

import numpy as np

PEAK_FLOPS = {
    # per chip, dense
    ("tpu v5 lite", "bf16"): 197e12,
    ("tpu v5 lite", "f32"): 98.5e12,
}


def peak_for(device, dtype_tag):
    kind = getattr(device, "device_kind", "").lower()
    for (k, d), v in PEAK_FLOPS.items():
        if k in kind and d == dtype_tag:
            return v
    return PEAK_FLOPS[("tpu v5 lite", dtype_tag)]  # default to v5e


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=32)
    parser.add_argument("--win-sec", type=float, default=2.5)
    parser.add_argument("--iters", type=int, default=30)
    parser.add_argument("--repeats", type=int, default=3,
                        help="timing-loop repeats; min is reported "
                             "(tunnel slowdowns are transient)")
    parser.add_argument("--fp32", action="store_true")
    parser.add_argument("--blstm", action="store_true",
                        help="also benchmark the BLSTM eval forward "
                             "(scan vs fused Pallas recurrence)")
    args = parser.parse_args()

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
    dtype = jnp.float32 if args.fp32 else jnp.bfloat16
    model = Conformer(compute_dtype=dtype)
    trainer = Trainer(model, MeanSquaredError(noise_weight=0.3),
                      LRSchedule(lr=1e-4, warmup=1000), optim="adam",
                      weight_decay=1e-2, grad_thresh=5.0)
    host = np.random.default_rng(0)
    dev = jax.devices()[0]
    batch = jax.device_put(
        {k: (host.standard_normal((args.batch, win)) * s).astype(np.float32)
         for k, s in (("mix", 0.1), ("source1", 0.05), ("source2", 0.05))},
        dev)
    rng = training_rng(0)
    state = trainer.init_state(rng, batch)

    # compiled-step FLOPs from XLA cost analysis
    lowered = jax.jit(trainer._train_step_impl).lower(state, batch, rng)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    cost = cost[0] if isinstance(cost, (list, tuple)) else cost
    flops = float(cost.get("flops", 0.0)) if cost else 0.0

    state, m = trainer._train_step(state, dict(batch), rng)
    # FLUSH VIA device_get OF A FRESH OUTPUT, never block_until_ready on
    # the donated state: on this backend blocking on donated outputs
    # returns at ENQUEUE time — the round-1/2 "4.88 ms/step, 73.8% MFU"
    # headline was that artifact (scripts/step_bisect.py: the same
    # program's forward ALONE costs 6.68 ms under an honest flush)
    jax.device_get(m["loss"])
    # best of N repeats: the tunneled dev backend has transient slowdowns
    # of 5-50x (see BASELINE.md notes); the minimum is the chip's number
    dt = float("inf")
    for _ in range(args.repeats):
        t0 = time.perf_counter()
        for _ in range(args.iters):
            state, m = trainer._train_step(state, dict(batch), rng)
        jax.device_get(m["loss"])
        dt = min(dt, (time.perf_counter() - t0) / args.iters)

    peak = peak_for(dev, "f32" if args.fp32 else "bf16")
    result = {
        "model": "Conformer-large",
        "batch": args.batch,
        "win_sec": args.win_sec,
        "ms_per_step": round(dt * 1e3, 2),
        "audio_sec_per_s_per_chip": round(
            args.batch * args.win_sec / dt, 1),
        "xla_flops_per_step": flops,
        "tflops_per_s": round(flops / dt / 1e12, 2),
        "mfu": round(flops / dt / peak, 4),
        "peak_tflops": peak / 1e12,
        "dtype": "f32" if args.fp32 else "bf16",
    }
    print(json.dumps(result))

    if args.blstm:
        from css_tpu.models.blstm import BLSTM

        bmodel = BLSTM(compute_dtype=dtype)
        feats = jnp.asarray(host.standard_normal(
            (args.batch, 151, 257)).astype(np.float32))
        variables = jax.jit(
            lambda r, f: bmodel.init({"params": r}, f, train=False)
        )(jax.random.PRNGKey(0), feats)

        import css_tpu.models.blstm as blstm_mod

        orig = blstm_mod.lstm_scan

        def timed(use_pallas):
            def scan_override(xw, w_hh, hidden, reverse=False,
                              use_pallas_arg=None, **kw):
                return orig(xw, w_hh, hidden, reverse=reverse,
                            use_pallas=use_pallas)
            blstm_mod.lstm_scan = scan_override
            try:
                fwd = jax.jit(lambda f: bmodel.apply(variables, f,
                                                     train=False))
                out = fwd(feats)
                jax.block_until_ready(out)
                best = float("inf")
                for _ in range(args.repeats):
                    t0 = time.perf_counter()
                    for _ in range(args.iters):
                        out = fwd(feats)
                    jax.block_until_ready(out)
                    best = min(best, (time.perf_counter() - t0) / args.iters)
                return best
            finally:
                blstm_mod.lstm_scan = orig

        dt_scan = timed(False)
        dt_fused = timed(True)
        print(json.dumps({
            "model": "BLSTM-large eval forward",
            "ms_scan": round(dt_scan * 1e3, 2),
            "ms_fused_pallas": round(dt_fused * 1e3, 2),
            "speedup": round(dt_scan / dt_fused, 2),
        }))


if __name__ == "__main__":
    main()
