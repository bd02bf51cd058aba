"""Objective registry (reference: css/objectives/__init__.py:19).

The reference registers only "MSE" and advertises an unimplemented "SNR"
choice (scripts/python/train.py:66); this framework ships both (SI-SNR for
time-domain models).
"""

from css_tpu.objectives.base import OBJECTIVES  # noqa: F401
import css_tpu.objectives.masksnr  # noqa: F401
import css_tpu.objectives.mse  # noqa: F401
import css_tpu.objectives.snr  # noqa: F401


def build_objective(name: str, conf: dict):
    return OBJECTIVES[name].build_objective(conf)
