"""Pipeline with sharded separation must match the per-batch path."""

import numpy as np

import jax
import jax.numpy as jnp

from css_tpu.executor.pipeline import CssPipeline
from css_tpu.models.blstm import BLSTM


def test_sharded_pipeline_matches_default():
    model = BLSTM(idim=257, num_bins=257, hidden_dim=16, num_layers=1,
                  dropout_rate=0.0)
    f = jnp.zeros((1, 10, 257))
    variables = model.init({"params": jax.random.PRNGKey(0)}, f, train=False)
    base = {
        "sampling_rate": 16000,
        "separation": {"batch_size": 8, "eval_win": 2.4, "eval_hop": 0.8,
                       "frame_length": 512, "frame_shift": 256},
        "stitching": {"eval_win": 2.4, "eval_hop": 0.8, "hop_size": 256},
        "beamforming": {"type": "masking", "hop_size": 256, "n_fft": 512,
                        "eval_hop": 0.8, "eval_win": 2.4,
                        "proceed_margin": 2, "wta_thresh": 1e-4},
    }
    sharded_cfg = {**base, "separation": {**base["separation"], "sharded": True}}
    rng = np.random.default_rng(0)
    wav = (rng.standard_normal(16000 * 9) * 0.1).astype(np.float32)
    out_a = CssPipeline(model, variables, base).process(wav)
    out_b = CssPipeline(model, variables, sharded_cfg).process(wav)
    np.testing.assert_allclose(out_b[0], out_a[0], atol=1e-4)
    np.testing.assert_allclose(out_b[1], out_a[1], atol=1e-4)
