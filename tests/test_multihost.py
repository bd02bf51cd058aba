"""Real multi-process DP correctness (VERDICT r1 item 1).

Spawns a genuine 2-process jax.distributed cluster on the CPU backend
(2 local devices each -> a 4-device global mesh), trains via
``DataParallel`` with PER-PROCESS data feeding
(jax.make_array_from_process_local_data), and asserts the losses and final
parameters match a single-process run over the same 4-device mesh.

This validates the capability the reference achieved with SGE job arrays +
NFS checkpoints (scripts/bash/train_parallel.sh:60-66) — except here the
replicas are synchronously coupled through real collectives.
"""

import json
import subprocess
import sys
from pathlib import Path

import numpy as np

import jax

from css_tpu.parallel.launch import free_port, spawn_local_workers, wait_all

import pytest

pytestmark = pytest.mark.cluster  # spawns real OS-process jax clusters

REPO = Path(__file__).resolve().parent.parent


def test_two_process_dp_device_mix_matches_single_process(tmp_path):
    """Device-mix over 2 processes: replicated pools + per-process recipe
    streams (shared window seed -> lockstep bucket shapes) must train
    identically to one process fed the concatenated global recipes."""
    out = tmp_path / "mhdm"
    port = free_port()
    steps, batch = 3, 8

    def build(pid, coordinator):
        return [sys.executable, str(REPO / "tests" / "mh_worker.py"),
                "--process-id", str(pid), "--num-processes", "2",
                "--coordinator", coordinator, "--out", str(out),
                "--steps", str(steps), "--batch", str(batch),
                "--device-mix"]

    import os

    procs = spawn_local_workers(
        build, 2, f"localhost:{port}", cwd=str(REPO),
        env_extra={"PYTHONPATH": str(REPO) + os.pathsep
                   + os.environ.get("PYTHONPATH", "")})
    wait_all(procs, timeout=600)

    mh = json.load(open(str(out) + ".json"))
    assert mh["process_count"] == 2 and mh["device_count"] == 4
    mh_params = np.load(str(out) + ".npz")

    sys.path.insert(0, str(REPO / "tests"))
    import mh_worker

    from css_tpu.parallel import DataParallel, make_mesh

    # oracle: reconstruct both processes' recipe streams and feed the
    # concatenated GLOBAL batch from a single process
    dmix0, encs0 = mh_worker.local_recipe_stream(0, 2, batch, steps)
    _, encs1 = mh_worker.local_recipe_stream(1, 2, batch, steps)
    merged = [jax.tree.map(lambda a, b: np.concatenate([a, b]), e0, e1)
              for e0, e1 in zip(encs0, encs1)]
    # lockstep window buckets: every step's two halves share one shape
    for e0, e1 in zip(encs0, encs1):
        assert e0["dm_winmark"].shape == e1["dm_winmark"].shape

    trainer = mh_worker.build_trainer()
    mesh = make_mesh(data=4, model=1, devices=jax.devices()[:4])
    dp = DataParallel(trainer, mesh, pools=dmix0.host_pools)
    state = dp.init_state(jax.random.PRNGKey(0), merged[0])
    losses = []
    for step, b in enumerate(merged[1:]):
        state, m = dp.train_step(state, b, jax.random.PRNGKey(step))
        losses.append(float(m["loss"]))

    np.testing.assert_allclose(losses, mh["losses"], rtol=1e-5, atol=1e-7)
    leaves = [np.asarray(l) for l in jax.tree.leaves(state.params)]
    assert len(leaves) == len(mh_params.files)
    for i, leaf in enumerate(leaves):
        np.testing.assert_allclose(
            mh_params[f"arr_{i}"], leaf, rtol=1e-3, atol=1e-5,
            err_msg=f"param leaf {i} diverged (device-mix multihost)")


def test_window_bucket_lockstep():
    """Mixers with disjoint content seeds but a shared window seed draw
    identical bucket sequences (the multi-host shape contract)."""
    from css_tpu.data import SyntheticCorpus
    from css_tpu.data.mixer import MixtureSynthesizer

    corpus = SyntheticCorpus(num_speakers=4, utts_per_speaker=2, seed=1)
    a = MixtureSynthesizer(corpus, batch_size=2, min_window=2.0,
                           max_window=4.0, seed=11, window_seed=5)
    b = MixtureSynthesizer(corpus, batch_size=2, min_window=2.0,
                           max_window=4.0, seed=22, window_seed=5)
    wins_a = [next(a)["mix"].shape[-1] for _ in range(8)]
    wins_b = [next(b)["mix"].shape[-1] for _ in range(8)]
    assert wins_a == wins_b
    assert len(set(wins_a)) > 1  # multiple buckets actually exercised
    # content still disjoint
    assert np.abs(next(a)["mix"] - next(b)["mix"]).max() > 1e-3


def test_two_process_dp_matches_single_process(tmp_path):
    out = tmp_path / "mh"
    port = free_port()
    steps, batch = 4, 8

    def build(pid, coordinator):
        return [sys.executable, str(REPO / "tests" / "mh_worker.py"),
                "--process-id", str(pid), "--num-processes", "2",
                "--coordinator", coordinator, "--out", str(out),
                "--steps", str(steps), "--batch", str(batch)]

    import os

    procs = spawn_local_workers(
        build, 2, f"localhost:{port}", cwd=str(REPO),
        env_extra={"PYTHONPATH": str(REPO) + os.pathsep
                   + os.environ.get("PYTHONPATH", "")})
    wait_all(procs, timeout=600)

    mh = json.load(open(str(out) + ".json"))
    assert mh["process_count"] == 2
    assert mh["device_count"] == 4
    mh_params = np.load(str(out) + ".npz")

    # single-process oracle: same 4-device global mesh shape, same global
    # batches, full batch fed from one process
    sys.path.insert(0, str(REPO / "tests"))
    import mh_worker

    from css_tpu.parallel import DataParallel, make_mesh

    trainer = mh_worker.build_trainer()
    mesh = make_mesh(data=4, model=1, devices=jax.devices()[:4])
    dp = DataParallel(trainer, mesh)
    win = 16000 * 2
    state = dp.init_state(
        jax.random.PRNGKey(0),
        mh_worker.deterministic_global_batch(0, batch, win))
    losses = []
    for step in range(steps):
        b = mh_worker.deterministic_global_batch(step, batch, win)
        state, m = dp.train_step(state, b, jax.random.PRNGKey(step))
        losses.append(float(m["loss"]))

    np.testing.assert_allclose(losses, mh["losses"], rtol=1e-5, atol=1e-7)
    leaves = [np.asarray(l) for l in jax.tree.leaves(state.params)]
    assert len(leaves) == len(mh_params.files)
    for i, leaf in enumerate(leaves):
        # rtol accounts for gradient-allreduce reduction-order differences
        # (Gloo ring vs single-host) amplified through 4 adam steps
        np.testing.assert_allclose(
            mh_params[f"arr_{i}"], leaf, rtol=1e-3, atol=1e-5,
            err_msg=f"param leaf {i} diverged between 2-process and "
                    f"single-process DP")
