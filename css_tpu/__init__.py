"""css_tpu — a TPU-native continuous speech separation (CSS) framework.

A ground-up JAX/XLA/Pallas re-design with the capabilities of the reference
CSS implementation (desh2608/css): mask-estimation models (Conformer, BLSTM,
Conv-TasNet), permutation-invariant training on on-the-fly synthesized
2-speaker mixtures, and a chunked continuous-separation inference pipeline
(separator -> stitcher -> MVDR beamformer) for arbitrarily long recordings.

Design stance (vs the reference):
  * One model definition serves both training and chunked inference
    (the reference splits PyTorch-training vs ONNX-inference).
  * All device compute (STFT, model forward, PIT, MVDR) is jit-compiled XLA
    with optional Pallas kernels for the hot DSP ops; matmuls ride the MXU
    in bf16 where safe, reductions in fp32.
  * Scaling is jax.sharding over a device Mesh (data/model axes) with XLA
    collectives, not process-level job arrays + filesystem checkpoints.
  * Host side: a numpy (optionally C++-accelerated) mixture synthesizer
    feeding the device asynchronously.
"""

__version__ = "0.1.0"

import os as _os

import jax as _jax

# CSS_TPU_PLATFORM=cpu|tpu|... pins the JAX backend for every css_tpu
# entrypoint. The env var JAX_PLATFORMS alone is not reliable: dev images
# may re-force an accelerator plugin from sitecustomize at interpreter
# startup, so the config is updated explicitly (before backend init —
# importing css_tpu must precede any jax device use for this to bind).
if _os.environ.get("CSS_TPU_PLATFORM"):
    _jax.config.update("jax_platforms", _os.environ["CSS_TPU_PLATFORM"])

# fp32 matmuls must actually be fp32: JAX's default lowers f32 dots to
# multi-pass bf16 on TPU (and mirrors that on CPU), which breaks numerical
# parity guarantees for the DSP/linalg path. The performance-critical model
# compute opts into bf16 EXPLICITLY via each model's compute_dtype, which
# this setting does not affect.
_jax.config.update("jax_default_matmul_precision", "highest")

from css_tpu.utils.registry import Registry  # noqa: F401
