"""Attribute Conformer train-step time by component ablation.

Times ms/step for the full model and for variants with one component
disabled/shrunk, on device-staged batches — robust attribution without a
trace viewer. Run when the chip is otherwise idle.

  python scripts/ablate_step.py [--iters 20] [--fp32]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root

import argparse
import json
import time

import numpy as np


def time_step(model_kwargs, batch, iters, dtype_key):
    import jax
    import jax.numpy as jnp

    from css_tpu.models.conformer import Conformer
    from css_tpu.objectives.mse import MeanSquaredError
    from css_tpu.trainer import LRSchedule, Trainer
    from css_tpu.trainer.loop import training_rng

    model = Conformer(compute_dtype=jnp.bfloat16 if dtype_key == "bf16"
                      else jnp.float32, **model_kwargs)
    trainer = Trainer(model, MeanSquaredError(noise_weight=0.3),
                      LRSchedule(lr=1e-4, warmup=1000), optim="adam",
                      weight_decay=1e-2, grad_thresh=5.0)
    rng = training_rng(0)
    state = trainer.init_state(rng, batch)
    state, m = trainer._train_step(state, dict(batch), rng)
    # flush via device_get of a fresh (non-donated) output: scripts/
    # step_bisect.py measured block_until_ready on donated outputs as the
    # suspect behind the non-reproducing 4.88 ms/step claim
    jax.device_get(m["loss"])
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(iters):
            state, m = trainer._train_step(state, dict(batch), rng)
        jax.device_get(m["loss"])
        best = min(best, (time.perf_counter() - t0) / iters * 1e3)
    return best


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--iters", type=int, default=20)
    parser.add_argument("--batch", type=int, default=32)
    parser.add_argument("--win-sec", type=float, default=2.5)
    parser.add_argument("--fp32", action="store_true")
    args = parser.parse_args()

    import jax

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
    dtype_key = "f32" if args.fp32 else "bf16"

    variants = {
        "full": {},
        "no_dropout": {"dropout_rate": 0.0},
        "no_relpos": {"relative_pos_emb": False},
        "kernel_1": {"kernel_size": 1},
        "heads_1": {"attention_heads": 1},
        "ffn_256": {"linear_units": 256},
        "blocks_8": {"num_blocks": 8},
    }
    results = {}
    for name, kw in variants.items():
        try:
            results[name] = round(
                time_step(kw, batch, args.iters, dtype_key), 2)
        except Exception as e:
            results[name] = f"error: {e}"
        print(json.dumps({name: results[name]}), flush=True)
    print(json.dumps({"dtype": dtype_key, "ms_per_step": results}))


if __name__ == "__main__":
    main()
