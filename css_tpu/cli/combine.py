"""Checkpoint averaging CLI.

Counterpart of scripts/python/combine_models.py:18-110: fraction-weighted
averaging of per-job checkpoints (tolerating missing jobs, renormalized
over survivors), saving the merged checkpoint and optionally deleting the
inputs.
"""

from __future__ import annotations

import argparse
from pathlib import Path

from css_tpu.trainer import checkpoint
from css_tpu.utils.logging import get_logger

log = get_logger(__name__)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("output", help="merged checkpoint path")
    parser.add_argument("--models", nargs="+", required=True,
                        help="per-job checkpoints to average")
    parser.add_argument("--save-models", action="store_true",
                        help="keep the per-job checkpoints "
                             "(combine_models.py:108-110)")
    args = parser.parse_args(argv)

    merged = checkpoint.average_checkpoints(args.models)
    checkpoint.save_checkpoint_dict(args.output, merged)
    survivors = [m for m in args.models if Path(m).exists()]
    log.info("Averaged %d/%d checkpoints -> %s", len(survivors),
             len(args.models), args.output)
    if not args.save_models:
        for m in survivors:
            Path(m).unlink()


if __name__ == "__main__":
    main()
