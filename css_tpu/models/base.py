"""Model contract shared by all mask estimators.

Every model is a flax.linen Module exposing the reference contract
(css/models/conformer.py:29-104): classmethods ``add_args(parser)`` /
``build_model(conf)`` plus a ``__call__`` that maps input features to
``(y_pred, masks)``:

  * STFT-domain models: f (B, T, F) -> y_pred (B, num_spk, T, F),
    masks (B, T, F, num_spk+num_noise)  [masks stacked on a trailing source
    axis instead of the reference's python tuple, for jit friendliness]
  * time-domain models (ConvTasNet): x (B, N) -> y_pred (B, num_spk, N)

One model definition serves training AND chunked inference (the reference
trains torch modules but serves separately-exported ONNX graphs,
css/executor/separator.py:26-31 — a split this framework removes).
"""

from __future__ import annotations

import numpy as np

from css_tpu.utils.registry import Registry

MODELS = Registry("model")

EPSILON = float(np.finfo(np.float32).eps)


def add_common_mask_args(parser, prefix_defaults=True):
    """Flags shared by mask estimators (conformer.py:31-34, blstm.py:24-27)."""
    for flag, default in [
        ("--idim", 257),
        ("--num-bins", 257),
        ("--num-spk", 2),
        ("--num-noise", 1),
    ]:
        try:
            parser.add_argument(flag, type=int, default=default)
        except Exception:
            pass  # already added by a sibling model
