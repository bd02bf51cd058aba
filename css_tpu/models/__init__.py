"""Model registry (reference: css/models/__init__.py:9-27).

Importing this package registers all built-in mask estimators in ``MODELS``;
external code can register more via ``@MODELS.register("name")``.
"""

from css_tpu.models.base import MODELS  # noqa: F401
import css_tpu.models.conformer  # noqa: F401
import css_tpu.models.blstm  # noqa: F401
import css_tpu.models.conv_tasnet  # noqa: F401


def build_model(name: str, conf: dict):
    return MODELS[name].build_model(conf)
