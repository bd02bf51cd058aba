"""Import a reference torch ``.mdl`` checkpoint into css_tpu format.

The reference's checkpoints are torch pickles of
{model, objective, optimizer, lr_sched, epoch, loss} (train.py:304-317).
This converts the model weights via the per-model state-dict converters
(css_tpu.models.*.params_from_torch) so reference-trained models can be
served or fine-tuned by this framework directly — replacing the
reference's separate ONNX-export step.
"""

from __future__ import annotations

import argparse

from css_tpu.trainer.checkpoint import save_checkpoint_dict
from css_tpu.utils.logging import get_logger

log = get_logger(__name__)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("input", help="reference .mdl (torch pickle)")
    parser.add_argument("output", help="css_tpu checkpoint path")
    parser.add_argument("--model", required=True,
                        choices=["Conformer", "BLSTM", "ConvTasNet"])
    parser.add_argument("--num-blocks", type=int, default=16,
                        help="Conformer blocks / ConvTasNet repeats")
    parser.add_argument("--num-layers", type=int, default=3,
                        help="BLSTM layers / ConvTasNet blocks-per-repeat")
    parser.add_argument("--norm", default="gln", help="ConvTasNet norm")
    args = parser.parse_args(argv)

    import torch

    ckpt = torch.load(args.input, map_location="cpu", weights_only=False)
    state_dict = ckpt["model"] if "model" in ckpt else ckpt

    if args.model == "Conformer":
        from css_tpu.models.conformer import params_from_torch

        variables = params_from_torch(state_dict, num_blocks=args.num_blocks)
    elif args.model == "BLSTM":
        from css_tpu.models.blstm import params_from_torch

        variables = params_from_torch(state_dict, num_layers=args.num_layers)
    else:
        from css_tpu.models.conv_tasnet import params_from_torch

        variables = params_from_torch(state_dict, num_layers=args.num_layers,
                                      num_blocks=args.num_blocks,
                                      norm=args.norm)

    out = {
        "params": variables["params"],
        "batch_stats": variables.get("batch_stats", {}),
        "opt_state": {},
        "step": 0,
        "epoch": int(ckpt.get("epoch", 0)) if isinstance(ckpt, dict) else 0,
        "loss": float(ckpt.get("loss", 0.0)) if isinstance(ckpt, dict) else 0.0,
        "conf": {"imported_from": args.input, "model": args.model},
    }
    save_checkpoint_dict(args.output, out)
    log.info("Imported %s (%s) -> %s", args.input, args.model, args.output)


if __name__ == "__main__":
    main()
