"""Objective contract.

An objective is a pure callable ``objective(y_pred, batch) -> (loss, aux)``
operating on model outputs — it does NOT run the model itself (unlike the
reference's ``forward(model, batch, device)``, css/objectives/mse.py:22-37,
whose model-in-the-loss coupling caused the latent tuple-unpack bug noted
in SURVEY.md §2.1). The trainer composes model.apply with the objective
inside one jit program.

``aux`` is a dict of jnp scalars/arrays for logging (e.g. the chosen PIT
permutations, which the inference stitcher can reuse).
"""

from __future__ import annotations

from css_tpu.utils.registry import Registry

OBJECTIVES = Registry("objective")
