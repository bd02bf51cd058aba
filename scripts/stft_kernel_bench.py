"""Micro-benchmark: Pallas fused STFT-magnitude vs the XLA formulation.

Round-1 verdict on the STFT kernel was parity (1015 vs 998 us) — this
harness sweeps the batch-tile size (``rows``) to find whether bigger MXU
tiles make the kernel pay for itself, and checks bit-parity against XLA.
Run when the chip is idle:

  python scripts/stft_kernel_bench.py [--batch 32] [--win-sec 2.4]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root

import argparse
import time

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=32)
    parser.add_argument("--win-sec", type=float, default=2.4)
    parser.add_argument("--iters", type=int, default=100)
    parser.add_argument("--repeats", type=int, default=3)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from css_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from css_tpu.ops import stft as stft_ops
    from css_tpu.ops.stft_pallas import stft_mag_pallas

    sr = 16000
    n = int(args.win_sec * sr) + 256
    host = np.random.default_rng(0)
    x = jnp.asarray(host.standard_normal((args.batch, n)).astype(np.float32))

    @jax.jit
    def xla_mag(x):
        return jnp.abs(stft_ops.stft(x, 512, 256, center=False))

    def timeit(fn, *a, **kw):
        out = fn(*a, **kw)
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = fn(*a, **kw)
            jax.block_until_ready(out)
            best = min(best, (time.perf_counter() - t0) / args.iters)
        return best * 1e6

    ref = np.asarray(xla_mag(x))
    t_xla = timeit(xla_mag, x)
    print(f"XLA      : {t_xla:8.1f} us")
    for rows in (8, 16, 32):
        if args.batch % rows and rows > args.batch:
            continue
        try:
            got = np.asarray(stft_mag_pallas(x, rows=rows))
            err = float(np.max(np.abs(got - ref)))
            t = timeit(stft_mag_pallas, x, rows=rows)
            print(f"pallas r{rows:<2}: {t:8.1f} us  ({t_xla / t:4.2f}x XLA)"
                  f"  maxerr {err:.2e}")
        except Exception as e:
            print(f"pallas r{rows:<2}: FAILED {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
