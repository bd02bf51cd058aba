"""Checkpointing: save/resume/warm-start, averaging, GC.

Numpy-pytree pickles replacing the reference's torch ``.mdl`` pickles
(train.py:304-317). A checkpoint carries
{params, batch_stats, opt_state, step, epoch, loss, conf} — the same five
restorable pieces as the reference (model/objective/optimizer/lr_sched/
epoch; our schedule is a pure function of step so it needs no state).

``average_checkpoints`` reproduces the reference's post-epoch model
averaging (combine_models.py:55-101): float arrays are fraction-weighted
sums over the surviving jobs (elastic: missing jobs renormalize 1/N), and
non-float leaves keep the LAST job's value (combine_models.py:95-101 keeps
the last job's scalars).
"""

from __future__ import annotations

import os
import pickle
import re
from pathlib import Path
from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np


def _to_numpy(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, state, epoch: int, loss: float,
                    conf: Optional[dict] = None, extra: Optional[dict] = None):
    ckpt = {
        "params": _to_numpy(state.params),
        "batch_stats": _to_numpy(state.batch_stats),
        "opt_state": _to_numpy(state.opt_state),
        "step": int(state.step),
        "epoch": int(epoch),
        "loss": float(loss),
        "conf": conf or {},
    }
    if extra:
        ckpt.update(extra)
    tmp = str(path) + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(ckpt, f, protocol=pickle.HIGHEST_PROTOCOL)
    os.replace(tmp, path)


def load_checkpoint(path: str) -> Dict[str, Any]:
    with open(path, "rb") as f:
        return pickle.load(f)


def restore_state(ckpt: Dict[str, Any], state):
    """Rebuild a TrainState from a checkpoint, keeping the tx structure."""
    import jax.numpy as jnp

    return state.replace(
        step=jnp.asarray(ckpt["step"], jnp.int32),
        params=jax.tree.map(jnp.asarray, ckpt["params"]),
        batch_stats=jax.tree.map(jnp.asarray, ckpt["batch_stats"]),
        opt_state=jax.tree.unflatten(
            jax.tree.structure(state.opt_state),
            [jnp.asarray(x) for x in jax.tree.leaves(ckpt["opt_state"])]),
    )


def warm_start(params, ckpt_params, replace_output: bool = False,
               output_patterns: Sequence[str] = ("linear", "xent_layer",
                                                 "final_affine")):
    """Copy matching leaves from a checkpoint into fresh params.

    Mirrors --init (train.py:231-243) including the output-layer skip —
    with the ``replace_output`` flag actually defined (the reference
    references an undefined arg, train.py:235).
    """
    src_paths = jax.tree_util.tree_flatten_with_path(ckpt_params)[0]
    src = {jax.tree_util.keystr(p): v for p, v in src_paths}

    def _components(path):
        out = []
        for entry in path:
            key = getattr(entry, "key", None)
            out.append(str(key if key is not None else entry))
        return out

    def copy_leaf(path, leaf):
        if replace_output and any(
                comp in output_patterns for comp in _components(path)):
            return leaf
        key = jax.tree_util.keystr(path)
        if key in src and np.shape(src[key]) == np.shape(leaf):
            return np.asarray(src[key])
        return leaf

    return jax.tree_util.tree_map_with_path(copy_leaf, params)


def average_checkpoints(paths: Sequence[str]) -> Dict[str, Any]:
    """Fraction-weighted average over surviving job checkpoints."""
    existing = [p for p in paths if Path(p).exists()]
    if not existing:
        raise FileNotFoundError(f"no checkpoints among {paths}")
    frac = 1.0 / len(existing)  # renormalized over survivors
    ckpts = [load_checkpoint(p) for p in existing]

    def avg(*leaves):
        first = leaves[0]
        if isinstance(first, np.ndarray) and np.issubdtype(first.dtype,
                                                           np.floating):
            out = np.zeros_like(first, dtype=np.float64)
            for l in leaves:
                out += l.astype(np.float64) * frac
            return out.astype(first.dtype)
        return leaves[-1]  # keep last job's non-float leaves

    merged = dict(ckpts[-1])  # last job's scalars (epoch/step/loss/conf)
    for key in ("params", "batch_stats", "opt_state"):
        merged[key] = jax.tree.map(avg, *[c[key] for c in ckpts])
    return merged


def gc_checkpoints(expdir: str, keep_every: int = 20, keep_last: int = 2,
                   job: Optional[int] = None):
    """Delete old epoch checkpoints, keeping every Nth and the last K
    (train_parallel.sh:79-84 GC policy).

    job=None operates on merged ``{e}.mdl`` checkpoints; job=J on the
    per-job ``{e}.{J}.mdl`` family.
    """
    expdir = Path(expdir)
    suffix = f".{job}.mdl" if job is not None else ".mdl"
    pattern = re.compile(r"^(\d+)" + re.escape(suffix) + "$")
    epochs = []
    for p in expdir.iterdir():
        m = pattern.match(p.name)
        if m:
            epochs.append(int(m.group(1)))
    if not epochs:
        return
    epochs.sort()
    keep = set(epochs[-keep_last:])
    keep.update(e for e in epochs if e % keep_every == 0)
    for e in epochs:
        if e not in keep:
            (expdir / f"{e}{suffix}").unlink()
