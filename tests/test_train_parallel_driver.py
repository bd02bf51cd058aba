"""Process-level fault tolerance (VERDICT r1 item 6).

Drives `cli.train_parallel` with REAL worker processes, injects an abrupt
mid-epoch crash into one job (retry also crashes -> permanent death), and
asserts training completes with survivor averaging — the
train_parallel.sh:14,54-86 semantics (fail-fast sentinel + retry + resume
from averaged checkpoint), with elastic continuation instead of the
reference's epoch abort.
"""

import subprocess
import sys
from pathlib import Path

from css_tpu.trainer.checkpoint import load_checkpoint

import pytest

pytestmark = pytest.mark.cluster  # spawns real OS-process jax clusters

REPO = Path(__file__).resolve().parent.parent

TRAIN_ARGS = [
    "--platform", "cpu", "--synthetic-data", "--model", "BLSTM",
    "--objective", "MSE", "--batch-size", "4", "--batches-per-epoch", "3",
    "--optim", "adam", "--lr", "1e-3", "--warmup", "2",
    "--blstm-hdim", "32", "--blstm-num-layers", "1",
    "--min-window-size", "2", "--max-window-size", "2",
    "--validate-batches", "1", "--num-workers", "1",
]


def run_driver(expdir, extra):
    cmd = [sys.executable, "-m", "css_tpu.cli.train_parallel",
           "--expdir", str(expdir), "--num-epochs", "2",
           "--nj-init", "2", "--nj-final", "2", "--retry", "1",
           *extra, "--", *TRAIN_ARGS]
    return subprocess.run(cmd, cwd=str(REPO), capture_output=True,
                          text=True, timeout=900)


def test_elastic_survivor_averaging(tmp_path):
    expdir = tmp_path / "exp"
    # job 2 of epoch 2 crashes after 1 batch; its retry crashes too
    res = run_driver(expdir, ["--inject-failure", "2.2:1"])
    assert res.returncode == 0, res.stderr[-3000:] + res.stdout[-2000:]

    # epoch 1 (both jobs fine) and epoch 2 (job 1 only) both merged
    assert (expdir / "1.mdl").exists() or (expdir / "2.mdl").exists()
    assert (expdir / "2.mdl").exists()
    # the dead job left a fail-fast sentinel and no checkpoint
    assert (expdir / ".error.2.2").exists()
    assert not (expdir / "2.2.mdl").exists()
    # per-job logs in the reference layout
    assert (expdir / "log" / "train.2.1.log").exists()
    assert (expdir / "log" / "train.2.2.log").exists()
    # the merged checkpoint is a live, loadable model state
    ck = load_checkpoint(expdir / "2.mdl")
    assert ck["epoch"] == 2 and "params" in ck
    # driver reported elastic continuation
    assert "survivors" in res.stderr or "survivors" in res.stdout


def test_abort_mode_fails_fast(tmp_path):
    expdir = tmp_path / "exp"
    res = run_driver(expdir, ["--inject-failure", "1.2:1",
                              "--on-failure", "abort"])
    assert res.returncode != 0
    assert (expdir / ".error.1.2").exists()
    assert not (expdir / "1.mdl").exists()
