"""Checkpointing: save/resume/warm-start, averaging, GC.

Checkpoints are **npz pytree archives** (SURVEY.md §5 plan) replacing the
reference's torch ``.mdl`` pickles (train.py:304-317): a zip of plain
``.npy`` arrays (``params/<path>``, ``batch_stats/<path>``,
``opt_state/<i>``) plus a JSON ``__meta__`` record — safe to share (no
arbitrary code execution on load), stable across refactors (no class
imports), and loadable with nothing but numpy. Legacy pickle checkpoints
remain readable (format sniffed from the file magic). A checkpoint carries
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

import io
import json
import os
import pickle
import re
from pathlib import Path
from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np


def _to_numpy(tree):
    # jax.device_get starts ALL device->host copies asynchronously before
    # blocking on any; per-leaf np.asarray serializes one transport round
    # trip per leaf (hundreds for a Conformer + adam state), which
    # dominated epoch-boundary time on the tunneled dev backend
    return jax.device_get(tree)


def _flatten_dict(tree, prefix=""):
    """Nested dict of arrays -> {'a/b/c': array} (flax param layout)."""
    out = {}
    for k, v in tree.items():
        key = f"{prefix}{k}"
        if isinstance(v, dict):
            out.update(_flatten_dict(v, key + "/"))
        else:
            out[key] = v
    return out


def _unflatten_dict(flat: Dict[str, np.ndarray]) -> dict:
    out: dict = {}
    for key, v in flat.items():
        node = out
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return out


def _npz_encode(arr: np.ndarray, dtypes: Dict[str, str], key: str):
    """np.save can't serialize extension dtypes (bfloat16); store their raw
    bits and record the dtype for decode."""
    if arr.dtype.kind == "V" or arr.dtype.name not in np.sctypeDict:
        dtypes[key] = arr.dtype.name
        return arr.view(np.uint8 if arr.dtype.itemsize == 1 else np.uint16)
    return arr


def _npz_decode(arr: np.ndarray, dtype_name: Optional[str]):
    if dtype_name is None:
        return arr
    import ml_dtypes

    return arr.view(np.dtype(getattr(ml_dtypes, dtype_name)))


def save_checkpoint_dict(path: str, ckpt: Dict[str, Any]):
    """Write a checkpoint dict as an npz pytree archive (atomic)."""
    arrays: Dict[str, np.ndarray] = {}
    dtypes: Dict[str, str] = {}
    meta: Dict[str, Any] = {"format": 1}
    for key, value in ckpt.items():
        if key in ("params", "batch_stats"):
            for p, leaf in _flatten_dict(_to_numpy(value)).items():
                k = f"{key}/{p}"
                arrays[k] = _npz_encode(np.asarray(leaf), dtypes, k)
        elif key == "opt_state":
            for i, leaf in enumerate(jax.tree.leaves(value)):
                k = f"opt_state/{i:05d}"
                arrays[k] = _npz_encode(np.asarray(leaf), dtypes, k)
        else:  # scalars / conf / extras — must be JSON-serializable
            meta[key] = value
    meta["dtypes"] = dtypes
    arrays["__meta__"] = np.frombuffer(
        json.dumps(meta, default=str).encode(), np.uint8)
    buf = io.BytesIO()
    np.savez(buf, **arrays)
    tmp = str(path) + ".tmp"
    with open(tmp, "wb") as f:
        f.write(buf.getvalue())
    os.replace(tmp, path)


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
    save_checkpoint_dict(path, ckpt)


def load_checkpoint(path: str) -> Dict[str, Any]:
    """Load an npz checkpoint (or a legacy round-1 pickle, sniffed by
    magic). Returns {params: nested dict, batch_stats: nested dict,
    opt_state: [leaves...], step, epoch, loss, conf, ...}."""
    with open(path, "rb") as f:
        magic = f.read(2)
    if magic != b"PK":  # legacy pickle checkpoint
        with open(path, "rb") as f:
            return pickle.load(f)
    with np.load(path) as z:
        meta = json.loads(bytes(z["__meta__"]).decode())
        dtypes = meta.pop("dtypes", {})
        meta.pop("format", None)
        ckpt: Dict[str, Any] = dict(meta)
        sections: Dict[str, Dict[str, np.ndarray]] = {"params": {},
                                                      "batch_stats": {}}
        opt: Dict[str, np.ndarray] = {}
        for key in z.files:
            if key == "__meta__":
                continue
            section, _, rest = key.partition("/")
            arr = _npz_decode(z[key], dtypes.get(key))
            if section in sections:
                sections[section][rest] = arr
            elif section == "opt_state":
                opt[rest] = arr
        ckpt["params"] = _unflatten_dict(sections["params"])
        ckpt["batch_stats"] = _unflatten_dict(sections["batch_stats"])
        ckpt["opt_state"] = [opt[k] for k in sorted(opt)]
    return ckpt


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
            # Cast to the DESTINATION dtype: slim f16 checkpoints
            # (scripts/persist_checkpoint.py) must not silently demote
            # fp32 master weights when consumed via --init.
            return np.asarray(src[key], dtype=np.asarray(leaf).dtype)
        return leaf

    return jax.tree_util.tree_map_with_path(copy_leaf, params)


def average_checkpoints(paths: Sequence[str]) -> Dict[str, Any]:
    """Fraction-weighted average over surviving job checkpoints."""
    existing = [p for p in paths if Path(p).exists()]
    if not existing:
        raise FileNotFoundError(f"no checkpoints among {paths}")
    frac = 1.0 / len(existing)  # renormalized over survivors
    ckpts = [load_checkpoint(p) for p in existing]
    # normalize opt_state to a flat leaves list so npz and legacy-pickle
    # checkpoints (optax pytrees) can be averaged together
    for c in ckpts:
        c["opt_state"] = list(jax.tree.leaves(c.get("opt_state", [])))

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
