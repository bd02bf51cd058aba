"""Where does the real train loop's time go? (dispatch/transfer probe)

mfu_bench measures the pure device step at ~4.9 ms (device-staged batch,
async dispatch), but the real `cli.train` loop sustains ~18.7 ms/step at
steps-per-dispatch 16 — ~220 ms of per-dispatch overhead. Recipes are
tiny (two (B, ~K+2) arrays), so the suspect is not bandwidth but the
SYNCHRONOUS host->device transfer handshake (one or more tunnel RTTs)
paid inside the jit call when arguments arrive as numpy.

This probe times, on the real Trainer with a real device-mix pool:
  a) dispatch with numpy args (what the loop does today);
  b) jax.device_put of the same args (is it async? how long to ready?);
  c) dispatch with pre-staged device args;
  d) (b)+(c) interleaved with one-group lookahead (double buffering);
at several steps-per-dispatch G values.

  python scripts/dispatch_probe.py [--iters 8] [--groups 16 64]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--groups", type=int, nargs="+", default=[16, 64])
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--win-sec", type=float, default=2.5)
    ap.add_argument("--loop", action="store_true",
                    help="also run the REAL train_one_epoch loop (with a "
                         "PrefetchLoader) to reproduce in-harness ms/step")
    ap.add_argument("--loop-steps", type=int, default=256)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from css_tpu.data import SyntheticCorpus
    from css_tpu.data.device_mixer import DeviceMixer
    from css_tpu.data.mixer import MixtureSynthesizer
    from css_tpu.models.conformer import Conformer
    from css_tpu.objectives.mse import MeanSquaredError
    from css_tpu.trainer import LRSchedule, Trainer
    from css_tpu.trainer.loop import training_rng
    from css_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    sr = 16000
    corpus = SyntheticCorpus(num_speakers=8, utts_per_speaker=4, seed=0,
                             voice="formant")
    mixer = MixtureSynthesizer(
        corpus, batch_size=args.batch, seed=1,
        min_window=args.win_sec, max_window=args.win_sec)
    dmix = DeviceMixer(mixer)
    pools = dmix.device_pools()
    model = Conformer(compute_dtype=jnp.bfloat16)
    trainer = Trainer(model, MeanSquaredError(noise_weight=0.3),
                      LRSchedule(lr=1e-4, warmup=1000), optim="adam",
                      weight_decay=1e-2, grad_thresh=5.0)
    rng = training_rng(0)

    it = iter(dmix)

    def host_group(g):
        batches = []
        for _ in range(g):
            b = dict(next(it))
            b.pop("ovl", None)
            batches.append(b)
        return trainer._stack_group(batches)

    example = dict(next(it))
    example.pop("ovl", None)
    state = trainer.init_state(rng, example, pools)
    jax.block_until_ready(state.params)

    # single-step dispatch baseline (no scan program): numpy recipe args,
    # 64 dispatches, flushed via device_get of the last metrics. If this
    # is much faster per step than the scanned groups, the scan carry's
    # double buffering (no donation inside lax.scan) is the bottleneck,
    # not dispatch latency.
    def one_batch():
        b = dict(next(it))
        b.pop("ovl", None)
        return b

    state, m = trainer._train_step(state, one_batch(), rng, pools)
    jax.device_get(m["loss"])  # compile + flush
    for iters in (64,):
        t0 = time.perf_counter()
        for _ in range(iters):
            state, m = trainer._train_step(state, one_batch(), rng, pools)
        jax.device_get(m["loss"])
        dt1 = (time.perf_counter() - t0) / iters
    print(json.dumps({"g": 1, "single_step_ms": round(dt1 * 1e3, 2)}),
          flush=True)

    results = {}
    for g in args.groups:
        # compile once
        stacked = host_group(g)
        state, m = trainer._train_multi(state, stacked, rng, pools)
        jax.block_until_ready(state.params)

        # (a) numpy args, timed per call + total. The flush at the end is
        # a device_get of the last metrics (NOT block_until_ready: on the
        # axon backend blocking on donated outputs returns early, which
        # makes enqueue look like execution)
        call_times = []
        t0 = time.perf_counter()
        for _ in range(args.iters):
            stacked = host_group(g)
            tc = time.perf_counter()
            state, m = trainer._train_multi(state, stacked, rng, pools)
            call_times.append(time.perf_counter() - tc)
        jax.device_get(m["loss"])
        dt_numpy = (time.perf_counter() - t0) / (args.iters * g)

        # (b) device_put timing: call latency + time-to-ready
        stacked = host_group(g)
        tp0 = time.perf_counter()
        staged = jax.device_put(stacked)
        t_put_call = time.perf_counter() - tp0
        jax.block_until_ready(staged)
        t_put_ready = time.perf_counter() - tp0

        # (c) pre-staged args: put (blocking) then dispatch
        t0 = time.perf_counter()
        for _ in range(args.iters):
            staged = jax.device_put(host_group(g))
            jax.block_until_ready(staged)
            state, m = trainer._train_multi(state, staged, rng, pools)
        jax.device_get(m["loss"])
        dt_staged = (time.perf_counter() - t0) / (args.iters * g)

        # (d) one-group lookahead: non-blocking put of group k+1 before
        # dispatching group k
        nxt = jax.device_put(host_group(g))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            cur, nxt = nxt, jax.device_put(host_group(g))
            state, m = trainer._train_multi(state, cur, rng, pools)
        jax.device_get(m["loss"])
        dt_lookahead = (time.perf_counter() - t0) / (args.iters * g)

        results[g] = {
            "numpy_ms_per_step": round(dt_numpy * 1e3, 2),
            "numpy_dispatch_call_ms": [round(t * 1e3, 1)
                                       for t in call_times],
            "device_put_call_ms": round(t_put_call * 1e3, 2),
            "device_put_ready_ms": round(t_put_ready * 1e3, 2),
            "staged_ms_per_step": round(dt_staged * 1e3, 2),
            "lookahead_ms_per_step": round(dt_lookahead * 1e3, 2),
        }
        print(json.dumps({"g": g, **results[g]}), flush=True)

        if args.loop:
            # the REAL loop: PrefetchLoader producer threads + window
            # grouping + interval logging, exactly like cli.train
            from css_tpu.data import PrefetchLoader

            def make_stream(i=0):
                m = MixtureSynthesizer(
                    corpus, batch_size=args.batch, seed=100 + 7 * i,
                    min_window=args.win_sec, max_window=args.win_sec,
                    window_group=g)
                return dmix.wrap(m)

            loader = PrefetchLoader(factory=make_stream, num_threads=2,
                                    group=g)
            logs = []
            t0 = time.perf_counter()
            state, _ = trainer.train_one_epoch(
                state, loader, args.loop_steps, rng,
                log_fn=logs.append, log_every=50,
                steps_per_dispatch=g, pools=pools)
            jax.device_get(state.step)
            dt_loop = (time.perf_counter() - t0) / args.loop_steps
            loader.close()
            print(json.dumps({
                "g": g,
                "loop_ms_per_step": round(dt_loop * 1e3, 2),
                "loop_audio_sec_per_s": round(
                    args.batch * args.win_sec / dt_loop, 1),
                "interval_audio_sec_per_s": [
                    round(r["audio_sec_per_sec_per_chip"], 1)
                    for r in logs],
            }), flush=True)


if __name__ == "__main__":
    main()
