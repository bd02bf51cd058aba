"""Persist a slim (inference-only, float16) copy of a checkpoint.

The dev environment wipes the gitignored ``exp/`` between rounds — round
4 lost every round-3 checkpoint including the flagship. This writes a
small committable copy under ``checkpoints/``: params (+batch_stats) cast
to float16, conf/epoch metadata kept, optimizer state dropped
(21.6 M-param Conformer-large: ~250 MB full -> ~43 MB slim). Consumers
pass it anywhere a ``.mdl`` goes (quality_eval, cli.separate --checkpoint,
``--init`` warm starts); params are cast back to float32 on load by
``load_checkpoint`` consumers' first matmul promotion, and the script
verifies the cast is quality-neutral by comparing masks on a fixed batch.

Reference counterpart: the reference ships exported ONNX checkpoints for
inference (conf/config_1ch.yaml:11); this is the same artifact in the
framework's own npz format.

  python scripts/persist_checkpoint.py --in exp/h1ft/avgtop.1.mdl \
      --out checkpoints/flagship_r4.mdl --model Conformer
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root

import argparse

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--in", dest="inp", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--model", default="Conformer",
                    help="model family for the verification forward")
    ap.add_argument("--tol", type=float, default=5e-3,
                    help="max allowed mean |mask delta| from the f16 cast")
    args = ap.parse_args(argv)

    import os

    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from css_tpu.models import MODELS
    from css_tpu.trainer import checkpoint as ckpt_io

    ckpt = ckpt_io.load_checkpoint(args.inp)
    conf = dict(ckpt.get("conf", {}))

    def f16(tree):
        return jax.tree.map(
            lambda a: a.astype(np.float16)
            if np.issubdtype(np.asarray(a).dtype, np.floating) else a, tree)

    slim = {
        "params": f16(ckpt["params"]),
        "batch_stats": f16(ckpt.get("batch_stats") or {}),
        "epoch": int(ckpt.get("epoch", 0)),
        "loss": float(ckpt.get("loss", 0.0)),
        "conf": conf,
        "slim_f16": True,
        "slim_source": str(args.inp),
    }
    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    ckpt_io.save_checkpoint_dict(args.out, slim)

    # verify: masks from the f16 copy match the original
    model = MODELS[args.model].build_model(conf)
    reread = ckpt_io.load_checkpoint(args.out)

    def vars_of(c, cast=None):
        p = c["params"]
        if cast is not None:
            p = jax.tree.map(lambda a: jnp.asarray(a, cast), p)
        v = {"params": p}
        if c.get("batch_stats"):
            bs = c["batch_stats"]
            if cast is not None:
                bs = jax.tree.map(lambda a: jnp.asarray(a, cast), bs)
            v["batch_stats"] = bs
        return v

    feats_dim = int(conf.get("idim", 257) or 257)
    feats = jnp.asarray(np.random.default_rng(0)
                        .uniform(0, 1, (2, 150, feats_dim))
                        .astype(np.float32))
    if args.model in ("Conformer", "BLSTM"):
        _, ref = model.apply(vars_of(ckpt), feats, train=False)
        _, got = model.apply(vars_of(reread, jnp.float32), feats,
                             train=False)
    else:  # time-domain: compare waveforms
        wav = jnp.asarray(np.random.default_rng(0)
                          .standard_normal((2, 16000)).astype(np.float32))
        ref = model.apply(vars_of(ckpt), wav, train=False)
        got = model.apply(vars_of(reread, jnp.float32), wav, train=False)
        ref = ref[0] if isinstance(ref, tuple) else ref
        got = got[0] if isinstance(got, tuple) else got
    delta = float(jnp.mean(jnp.abs(got - ref)))
    size_mb = Path(args.out).stat().st_size / 1e6
    print(f"slim checkpoint {args.out}: {size_mb:.1f} MB, "
          f"mean|delta|={delta:.2e} (tol {args.tol})")
    if delta > args.tol:
        raise SystemExit(f"f16 cast changed outputs by {delta:.3e} > tol")


if __name__ == "__main__":
    main()
