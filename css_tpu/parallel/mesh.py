"""Device meshes and sharding rules.

The scaling design (SURVEY.md §2.4): a 2-D ``(data, model)`` mesh;
synchronous data parallelism shards the batch over ``data`` and lets jit
insert gradient psums over ICI; optional tensor parallelism shards the
Conformer FFN/attention projections over ``model``. This replaces the
reference's SGE-job-array scheme whose only "collective" was checkpoint
averaging on NFS (scripts/bash/train_parallel.sh:56-77).
"""

from __future__ import annotations

import re
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: Optional[int] = None, model: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        data = n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def global_put(tree, sharding):
    """``device_put`` that also works under multi-process (multi-host) jax.

    Single process: plain ``jax.device_put``. Multi-process: every process
    must hold the FULL (host-global) value of each leaf — e.g. states built
    from the same PRNG key on every process — and contributes the shards
    its local devices own (``jax.make_array_from_callback``). This is the
    multi-host pattern ``jax.device_put`` of host-local numpy cannot
    express (it cannot address remote devices).

    ``sharding`` is a single Sharding applied to every leaf, or a pytree of
    shardings matching ``tree``.
    """
    def put(x, sh):
        if jax.process_count() == 1:
            return jax.device_put(x, sh)
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, sh,
                                            lambda idx: x[idx])

    if isinstance(sharding, jax.sharding.Sharding):
        return jax.tree.map(lambda x: put(x, sharding), tree)
    return jax.tree.map(put, tree, sharding)


# --------------------------------------------------------------------- TP
# Conformer tensor-parallel layout: FFN is a classic column->row parallel
# pair (w1 kernel sharded on its output dim, w2 on its input dim); the
# attention QKV projections shard heads (output dim), the output projection
# shards its input dim. Everything else is replicated; XLA inserts the
# reduce-scatters/all-reduces.
_TP_RULES = [
    (re.compile(r"feed_forward_(in|out)/w1/kernel$"), P(None, "model")),
    (re.compile(r"feed_forward_(in|out)/w2/kernel$"), P("model", None)),
    (re.compile(r"self_attn/linear_[qkv]/kernel$"), P(None, "model")),
    (re.compile(r"self_attn/linear_out/kernel$"), P("model", None)),
]


def _path_str(path) -> str:
    parts = []
    for entry in path:
        key = getattr(entry, "key", None)
        parts.append(str(key if key is not None else entry))
    return "/".join(parts)


def conformer_tp_spec(params) -> "jax.tree_util.PyTreeDef":
    """PartitionSpec tree for Conformer params under (data, model)."""

    def spec_for(path, leaf):
        s = _path_str(path)
        for pat, spec in _TP_RULES:
            if pat.search(s):
                return spec
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, params)


def shard_params(params, mesh: Mesh, spec_tree=None):
    """Place params on the mesh according to a PartitionSpec tree
    (replicated where the tree is None/P())."""
    if spec_tree is None:
        spec_tree = jax.tree.map(lambda _: P(), params)
    return global_put(
        params, jax.tree.map(lambda s: NamedSharding(mesh, s), spec_tree,
                             is_leaf=lambda s: isinstance(s, P)))
