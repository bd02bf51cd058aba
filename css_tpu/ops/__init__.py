"""DSP / loss ops. Submodules: stft, features, pit, mvdr.

Note: the ``stft``/``istft`` functions live in ``css_tpu.ops.stft``; they
are deliberately NOT re-exported here so the submodule name stays
importable (``import css_tpu.ops.stft``).
"""

from css_tpu.ops import stft  # noqa: F401  (submodule)
from css_tpu.ops.pit import batch_pit_loss, permutations_array, pit_loss  # noqa: F401
