"""Distributed training strategies.

Two modes, per SURVEY.md §2.4:

* ``DataParallel`` — proper synchronous DP (+ optional TP): params live on
  the mesh (replicated over ``data``, optionally TP-sharded over
  ``model``), batches are sharded over ``data``, and jit/XLA insert the
  gradient all-reduce over ICI. This is the upgrade the reference never
  had (it loaded NCCL and used it nowhere — env.sh:10, SURVEY.md §2.4).

* ``ReplicaAveraging`` — the reference's ACTUAL algorithm
  (train_parallel.sh:56-77 + combine_models.py:68-78): N independent SGD
  replicas, parameters averaged at epoch boundaries. Here each replica is
  a slice of a stacked-parameter pytree sharded over ``data``; the epoch
  is one jit program per step with zero cross-device traffic, and
  ``average()`` is a single on-device mean over the replica axis (the
  reference's per-epoch NFS checkpoint round-trip becomes one ICI
  all-reduce). Elasticity (averaging over survivors) is preserved via a
  replica mask.

Multi-host: call ``jax.distributed.initialize()`` before building the mesh
(or use ``css_tpu.parallel.launch``). Parameters/optimizer state are built
identically on every process from the same PRNG key and placed with
``global_put`` (each process contributes its addressable shards); batches
are fed PER PROCESS — each process passes its LOCAL slice of the global
batch (leading dim = global_batch / process_count) and ``shard_batch``
assembles the global Array via ``jax.make_array_from_process_local_data``.
Correctness is asserted by ``tests/test_multihost.py``, which spawns real
multi-process jax on the CPU backend and checks DP loss/params match
single-process training bit-for-bit.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from css_tpu.parallel.mesh import (batch_sharding, global_put, make_mesh,
                                   replicate, shard_params)
from css_tpu.trainer.loop import TrainState, Trainer


class DataParallel:
    """Shards a Trainer's step over a (data, model) mesh."""

    def __init__(self, trainer: Trainer, mesh: Optional[Mesh] = None,
                 tp_spec=None, pools=None):
        self.trainer = trainer
        self.mesh = mesh if mesh is not None else make_mesh()
        self.tp_spec = tp_spec
        # device-mix audio pools: replicated over the mesh once; every
        # device materializes its own batch shard from its local copy
        self.pools = (global_put(jax.tree.map(jnp.asarray, pools),
                                 replicate(self.mesh))
                      if pools is not None else None)
        self._step = jax.jit(trainer._train_step_impl, donate_argnums=(0,))

    def init_state(self, rng, example_batch) -> TrainState:
        state = self.trainer.init_state(rng, example_batch, self.pools)
        if self.tp_spec is not None:
            params = shard_params(state.params, self.mesh, self.tp_spec)
            # optimizer moments follow the param sharding automatically
            # when rebuilt from the sharded params
            opt_state = self.trainer.tx.init(params)
            state = state.replace(
                params=params, opt_state=opt_state,
                batch_stats=global_put(state.batch_stats,
                                       replicate(self.mesh)),
                step=global_put(state.step, replicate(self.mesh)))
        else:
            state = global_put(state, replicate(self.mesh))
        return state

    def shard_batch(self, batch):
        """Place a batch on the mesh, sharded over the data axis.

        Single process: ``batch`` is the global batch. Multi-process:
        ``batch`` is this process's LOCAL shard (leading dim =
        global_batch / process_count) — the per-process data-feeding
        pattern (each host synthesizes/loads only its own slice).
        """
        data = batch_sharding(self.mesh)
        repl = replicate(self.mesh)
        if jax.process_count() > 1:
            def put(x):
                x = np.asarray(x)
                # empty leaves (e.g. the recipe window-size marker) carry
                # shape only — replicate instead of assembling shards
                if x.ndim >= 1 and x.shape[0]:
                    return jax.make_array_from_process_local_data(data, x)
                return global_put(x, repl)
            return jax.tree.map(put, batch)
        return jax.tree.map(
            lambda x: jax.device_put(x, data if np.ndim(x) >= 1 else repl),
            batch)

    def train_step(self, state, batch, rng):
        return self._step(state, self.shard_batch(batch), rng, self.pools)


class ReplicaAveraging:
    """N independent replicas + on-device parameter averaging."""

    def __init__(self, trainer: Trainer, mesh: Optional[Mesh] = None,
                 num_replicas: Optional[int] = None, pools=None):
        self.trainer = trainer
        self.mesh = mesh if mesh is not None else make_mesh()
        self.num_replicas = (num_replicas if num_replicas is not None
                             else self.mesh.shape["data"])
        if self.num_replicas != self.mesh.shape["data"]:
            # the replica axis must equal the data axis: build a sub-mesh
            # over the first num_replicas devices
            self.mesh = make_mesh(
                data=self.num_replicas, model=1,
                devices=list(self.mesh.devices.flat)[: self.num_replicas])
        self.pools = (global_put(jax.tree.map(jnp.asarray, pools),
                                 replicate(self.mesh))
                      if pools is not None else None)

        def vstep(state, batch, rng, pools):
            # per-replica keys derived inside the program (no host-side
            # split per step); per-step freshness comes from the step
            # counter fold_in inside _train_step_impl
            rngs = jax.random.split(rng, self.num_replicas)
            return jax.vmap(trainer._train_step_impl,
                            in_axes=(0, 0, 0, None))(state, batch, rngs,
                                                     pools)

        self._vstep = jax.jit(vstep, donate_argnums=(0,))
        self.replica_sharding = NamedSharding(self.mesh, P("data"))

    def init_state(self, rngs, example_batch) -> TrainState:
        """rngs: (J,) per-replica PRNG keys -> stacked, sharded state."""
        states = [self.trainer.init_state(rngs[j], example_batch, self.pools)
                  for j in range(self.num_replicas)]
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *states)
        return global_put(stacked, self.replica_sharding)

    def shard_batch(self, batch):
        """batch leaves (J*B, ...) -> (J, B, ...) sharded over replicas.

        Multi-process: pass the LOCAL replicas' batch (leading dim =
        J_local * B) — assembled per process like DataParallel.shard_batch.
        """
        j = self.num_replicas
        if jax.process_count() > 1:
            j = j // jax.process_count()

        def reshape(x):
            x = np.asarray(x)
            if x.ndim == 0:  # per-batch scalars (ovl) -> broadcast
                return np.broadcast_to(x, (j,))
            return x.reshape(j, x.shape[0] // j, *x.shape[1:])

        reshaped = jax.tree.map(reshape, batch)
        if jax.process_count() > 1:
            return jax.tree.map(
                lambda x: jax.make_array_from_process_local_data(
                    self.replica_sharding, x), reshaped)
        return jax.device_put(reshaped, self.replica_sharding)

    def train_step(self, state, batch, rng):
        return self._vstep(state, self.shard_batch(batch), rng, self.pools)

    def average(self, state: TrainState,
                alive: Optional[np.ndarray] = None) -> TrainState:
        """Average float params/opt-state over (surviving) replicas and
        broadcast back — the reference's combine_models.py:68-78 semantics
        with elastic renormalization over survivors (:59-66)."""
        if alive is None:
            alive = np.ones(self.num_replicas, bool)
        w = jnp.asarray(alive, jnp.float32)
        w = w / jnp.sum(w)

        def avg(x):
            if jnp.issubdtype(x.dtype, jnp.floating):
                mean = jnp.tensordot(w, x, axes=(0, 0))
                return jnp.broadcast_to(mean, x.shape).astype(x.dtype)
            return x  # keep integer leaves (steps) as-is

        averaged = jax.tree.map(avg, state)
        return jax.device_put(averaged, self.replica_sharding)

    def replica_state(self, state: TrainState, j: int = 0) -> TrainState:
        """Extract one replica as an unstacked TrainState (for eval/ckpt)."""
        return jax.tree.map(lambda x: x[j], state)
