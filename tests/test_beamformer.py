"""Beamformer assembly: identity reconstruction, tail coverage, alignment."""

import numpy as np

import jax
import jax.numpy as jnp

from css_tpu.executor.beamformer import Beamformer
from css_tpu.executor.pipeline import CssPipeline
from css_tpu.models.blstm import BLSTM


def test_identity_masks_reconstruct_mixture():
    """All-ones speech mask + masking type ~= the mixture (margin
    partition + istft must not distort interior audio)."""
    rng = np.random.default_rng(0)
    sr = 16000
    wav = (rng.standard_normal(sr * 6) * 0.1).astype(np.float32)
    frames = len(wav) // 256 + 1
    ones = np.ones((frames, 257), np.float32)
    bf = Beamformer(bf_type="masking", rescale=False)
    out0, _ = bf.continuous_process(wav, (ones, ones, np.zeros_like(ones)))
    # peak-normalized output: compare via correlation, excluding edges
    c = np.corrcoef(out0[sr : 4 * sr], wav[sr : 4 * sr])[0, 1]
    assert c > 0.99, f"identity reconstruction corr {c:.4f}"


def test_pipeline_covers_recording_tail():
    """The window padding in CssPipeline must produce audio for the final
    seconds (bare unfold dropped up to eval_win of tail audio)."""
    model = BLSTM(idim=257, num_bins=257, hidden_dim=16, num_layers=1,
                  dropout_rate=0.0)
    f = jnp.zeros((1, 10, 257))
    variables = model.init({"params": jax.random.PRNGKey(0)}, f, train=False)
    config = {
        "sampling_rate": 16000,
        "separation": {"batch_size": 8, "eval_win": 2.4, "eval_hop": 0.8,
                       "frame_length": 512, "frame_shift": 256},
        "stitching": {"eval_win": 2.4, "eval_hop": 0.8, "hop_size": 256},
        "beamforming": {"type": "masking", "hop_size": 256, "n_fft": 512,
                        "eval_hop": 0.8, "eval_win": 2.4,
                        "proceed_margin": 2, "wta_thresh": 1e-4},
    }
    pipe = CssPipeline(model, variables, config)
    rng = np.random.default_rng(1)
    # 5.7 s: deliberately not a multiple of the window/hop grid
    wav = (rng.standard_normal(int(16000 * 5.7)) * 0.1).astype(np.float32)
    out0, out1 = pipe.process(wav)
    assert out0.shape == wav.shape
    last = out0[-16000:]
    assert np.sqrt(np.mean(last ** 2)) > 1e-4, "tail is silent"


def test_pipeline_short_recording_single_window(tmp_path):
    """A recording shorter than one window must still produce full-length
    output (single-window assembly + pad_to_one unfold path)."""
    model = BLSTM(idim=257, num_bins=257, hidden_dim=16, num_layers=1,
                  dropout_rate=0.0)
    f = jnp.zeros((1, 10, 257))
    variables = model.init({"params": jax.random.PRNGKey(0)}, f, train=False)
    config = {
        "sampling_rate": 16000,
        "separation": {"batch_size": 8, "eval_win": 2.4, "eval_hop": 0.8,
                       "frame_length": 512, "frame_shift": 256},
        "stitching": {"eval_win": 2.4, "eval_hop": 0.8, "hop_size": 256},
        "beamforming": {"type": "masking", "hop_size": 256, "n_fft": 512,
                        "eval_hop": 0.8, "eval_win": 2.4,
                        "proceed_margin": 2, "wta_thresh": 1e-4},
    }
    pipe = CssPipeline(model, variables, config)
    rng = np.random.default_rng(2)
    wav = (rng.standard_normal(16000 * 2) * 0.1).astype(np.float32)  # 2 s
    out0, out1 = pipe.process(wav)
    assert out0.shape == wav.shape
    # audio must be present across the whole output, incl. beyond the
    # proceed margin (single-window assembly previously truncated there)
    assert np.sqrt(np.mean(out0[-8000:] ** 2)) > 1e-4
