"""Multi-process (multi-host) launch utilities.

The reference's multi-node story was SGE job arrays rendezvousing on a
shared filesystem (scripts/bash/train_parallel.sh:60-66, train.sh:72); the
TPU-native equivalent is jax's distributed runtime: one process per host,
``jax.distributed.initialize`` for rendezvous, collectives over ICI/DCN.

Two entry paths:

* On a TPU pod slice, ``initialize()`` with no arguments auto-detects the
  topology from the TPU metadata — `cli.train --multihost` alone suffices.
* Anywhere else (CPU testing, GPU clusters, manual clusters), pass
  ``--coordinator host:port --num-processes N --process-id i`` per
  process; ``spawn_local_workers`` runs such a local cluster on one
  machine (the CI harness for tests/test_multihost.py).
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys
from typing import List, Optional, Sequence


def initialize(coordinator: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """jax.distributed.initialize with explicit-args or auto-detection."""
    import jax

    if coordinator is not None:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)
    else:
        jax.distributed.initialize()


def free_port() -> int:
    with socket.socket() as s:
        s.bind(("", 0))
        return s.getsockname()[1]


def spawn_local_workers(argv_builder, num_processes: int,
                        coordinator: Optional[str] = None,
                        env_extra: Optional[dict] = None,
                        cwd: Optional[str] = None) -> List[subprocess.Popen]:
    """Spawn a local multi-process jax cluster (one subprocess per
    "host"). ``argv_builder(process_id, coordinator)`` returns the argv for
    one worker. Caller waits/asserts on the returned Popens."""
    coordinator = coordinator or f"localhost:{free_port()}"
    procs = []
    for pid in range(num_processes):
        env = dict(os.environ)
        if env_extra:
            env.update(env_extra)
        procs.append(subprocess.Popen(
            argv_builder(pid, coordinator), env=env, cwd=cwd,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    return procs


def wait_all(procs: Sequence[subprocess.Popen], timeout: float = 600.0):
    """Wait for all workers; raise with captured output if any failed."""
    outputs = []
    failed = []
    for i, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
            failed.append((i, "timeout"))
        outputs.append(out.decode(errors="replace") if out else "")
        if p.returncode != 0:
            failed.append((i, p.returncode))
    if failed:
        detail = "\n".join(
            f"--- worker {i} (rc={rc}) ---\n{outputs[i][-4000:]}"
            for i, rc in failed)
        raise RuntimeError(f"multi-process workers failed:\n{detail}")
    return outputs


def main(argv=None):
    """CLI: spawn N local worker processes of `css_tpu.cli.train`.

    python -m css_tpu.parallel.launch --num-processes 2 -- \
        --expdir exp --model BLSTM --strategy dp ...

    Everything after `--` is forwarded to every worker's cli.train, plus
    the per-process --multihost/--coordinator/--process-id flags.
    """
    import argparse

    parser = argparse.ArgumentParser()
    parser.add_argument("--num-processes", type=int, required=True)
    parser.add_argument("--coordinator", default=None)
    parser.add_argument("train_args", nargs=argparse.REMAINDER)
    args = parser.parse_args(argv)
    train_args = [a for a in args.train_args if a != "--"]

    def build(pid, coord):
        return [sys.executable, "-m", "css_tpu.cli.train", "--multihost",
                "--coordinator", coord,
                "--num-processes", str(args.num_processes),
                "--process-id", str(pid), *train_args]

    procs = spawn_local_workers(build, args.num_processes, args.coordinator)
    outs = wait_all(procs)
    sys.stdout.write(outs[0])


if __name__ == "__main__":
    main()
