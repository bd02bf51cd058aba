"""Export a trained model's chunked-inference forward as StableHLO.

The reference deploys separately-exported ONNX graphs
(conf/config_1ch.yaml:11, css/utils/model_util.py) — the TPU-native
equivalent is jax.export: the jitted window-forward (features + model +
mask clamp) is serialized to a portable StableHLO artifact that any JAX
runtime can execute without the Python model definition.

The Separator accepts these artifacts via ``backend="exported"``.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

from css_tpu.utils.logging import get_logger

log = get_logger(__name__)


def export_forward(model, variables, batch_size: int, num_frames: int,
                   feature_dim: int):
    """Build and export jit(forward) for fixed window shapes."""
    import jax
    import jax.numpy as jnp

    def forward(f):
        out = model.apply(variables, f, train=False)
        masks = out[1] if isinstance(out, tuple) else out
        return jnp.minimum(masks, 1.0)

    example = jax.ShapeDtypeStruct((batch_size, num_frames, feature_dim),
                                   jnp.float32)
    exported = jax.export.export(jax.jit(forward))(example)
    return exported.serialize()


def load_exported(path: str):
    """Deserialize an exported forward; returns a callable(feats)->masks."""
    import jax

    blob = Path(path).read_bytes()
    exported = jax.export.deserialize(blob)
    return exported.call


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--model", required=True)
    parser.add_argument("--output", required=True)
    parser.add_argument("--batch-size", type=int, default=32)
    parser.add_argument("--eval-win", type=float, default=2.4)
    parser.add_argument("--frame-length", type=int, default=512)
    parser.add_argument("--frame-shift", type=int, default=256)
    parser.add_argument("--extra-samples", type=int, default=256)
    parser.add_argument("--sr", type=int, default=16000)
    args = parser.parse_args(argv)

    from css_tpu.models import MODELS
    from css_tpu.trainer import checkpoint

    ckpt = checkpoint.load_checkpoint(args.checkpoint)
    conf = dict(ckpt.get("conf", {}))
    model = MODELS[args.model].build_model(conf)
    variables = {"params": ckpt["params"]}
    if ckpt.get("batch_stats"):
        variables["batch_stats"] = ckpt["batch_stats"]

    win = int(args.eval_win * args.sr) + args.extra_samples
    frames = (win - args.frame_length) // args.frame_shift + 1
    idim = int(conf.get("idim", 257))
    blob = export_forward(model, variables, args.batch_size, frames, idim)
    Path(args.output).write_bytes(blob)
    log.info("Exported %s forward (%d x %d x %d) -> %s (%d bytes)",
             args.model, args.batch_size, frames, idim, args.output,
             len(blob))


if __name__ == "__main__":
    main()
