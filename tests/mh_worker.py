"""Worker process for tests/test_multihost.py.

Runs REAL multi-process jax (CPU backend, 2 local devices per process) and
trains a small BLSTM with DataParallel for a fixed number of steps using
per-process data feeding (each process passes only its local slice of the
deterministic global batch). Process 0 dumps final params + per-step
losses for comparison against the single-process oracle.

Must be launched as `python tests/mh_worker.py --process-id i ...` from the
repo root (NOT under pytest — a fresh interpreter so XLA device flags and
jax.distributed can be configured before jax initializes).
"""

import argparse
import json
import os
import sys


def deterministic_global_batch(step: int, batch: int, win: int):
    import numpy as np

    rng = np.random.default_rng(1000 + step)
    return {
        "mix": rng.standard_normal((batch, win)).astype(np.float32) * 0.1,
        "source1": rng.standard_normal((batch, win)).astype(np.float32) * 0.05,
        "source2": rng.standard_normal((batch, win)).astype(np.float32) * 0.05,
    }


def local_recipe_stream(pid: int, nproc: int, batch: int, steps: int):
    """Per-process device-mix stream: a DeviceMixer over the SHARED
    synthetic corpus (pools identical on every process), a content rng
    seeded per process (disjoint mixtures), and a SHARED window seed so
    all processes draw the same bucket sequence (the global batch must
    assemble with one shape per step). Returns (dmix, [enc_0..enc_steps])
    where enc_0 is the init example."""
    from css_tpu.data import SyntheticCorpus
    from css_tpu.data.corpus import synthetic_noise_pool, synthetic_rir_pool
    from css_tpu.data.device_mixer import DeviceMixer
    from css_tpu.data.mixer import MixtureSynthesizer

    corpus = SyntheticCorpus(num_speakers=5, utts_per_speaker=3, seed=1)
    m = MixtureSynthesizer(
        corpus, batch_size=batch // nproc, min_window=2.0, max_window=3.0,
        seed=100 + pid, window_seed=7,
        rir_pool=synthetic_rir_pool(4),
        noise_pool=synthetic_noise_pool(2, dur=2.0))
    dmix = DeviceMixer(m)
    encs = []
    for _ in range(steps + 1):
        enc = dmix.encode(m.sample_recipe())
        enc.pop("ovl")
        encs.append(enc)
    return dmix, encs


def build_trainer():
    import jax.numpy as jnp

    from css_tpu.models.blstm import BLSTM
    from css_tpu.objectives.mse import MeanSquaredError
    from css_tpu.trainer import LRSchedule, Trainer

    model = BLSTM(idim=257, num_bins=257, hidden_dim=64, num_layers=1,
                  dropout_rate=0.0)
    return Trainer(model, MeanSquaredError(noise_weight=0.3),
                   LRSchedule(lr=1e-3, warmup=2), optim="adam",
                   grad_thresh=5.0)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--process-id", type=int, required=True)
    parser.add_argument("--num-processes", type=int, required=True)
    parser.add_argument("--coordinator", required=True)
    parser.add_argument("--out", required=True)
    parser.add_argument("--steps", type=int, default=4)
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--devices-per-process", type=int, default=2)
    parser.add_argument("--device-mix", action="store_true")
    args = parser.parse_args()

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={args.devices_per_process}")
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")
    jax.distributed.initialize(args.coordinator,
                               num_processes=args.num_processes,
                               process_id=args.process_id)
    import numpy as np

    from css_tpu.parallel import DataParallel, make_mesh

    trainer = build_trainer()
    mesh = make_mesh()  # all global devices

    if args.device_mix:
        dmix, encs = local_recipe_stream(
            args.process_id, args.num_processes, args.batch, args.steps)
        dp = DataParallel(trainer, mesh, pools=dmix.host_pools)
        state = dp.init_state(jax.random.PRNGKey(0), encs[0])
        feed = encs[1:]
    else:
        win = 16000 * 2
        local = args.batch // args.num_processes
        lo = args.process_id * local

        def local_slice(b):
            return {k: v[lo : lo + local] for k, v in b.items()}

        dp = DataParallel(trainer, mesh)
        state = dp.init_state(jax.random.PRNGKey(0),
                              local_slice(deterministic_global_batch(
                                  0, args.batch, win)))
        feed = [local_slice(deterministic_global_batch(s, args.batch, win))
                for s in range(args.steps)]
    losses = []
    for step, batch in enumerate(feed):
        state, m = dp.train_step(state, batch, jax.random.PRNGKey(step))
        losses.append(float(m["loss"]))

    if jax.process_index() == 0:
        leaves = jax.tree.leaves(state.params)
        np.savez(args.out + ".npz", *[np.asarray(l) for l in leaves])
        with open(args.out + ".json", "w") as f:
            json.dump({"losses": losses,
                       "process_count": jax.process_count(),
                       "device_count": jax.device_count()}, f)
    # all processes must exit cleanly for the barrier semantics of wait_all
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
