"""7-channel pipeline: IPD features -> masks -> DOA merge -> MVDR
(config_7ch.yaml semantics: css/conf/config_7ch.yaml)."""

import numpy as np

import jax
import jax.numpy as jnp

from css_tpu.executor.pipeline import CssPipeline
from css_tpu.models.blstm import BLSTM
import pytest


def _make_7ch_recording(seconds=6, sr=16000, seed=0):
    """Two point sources with inter-channel delays + noise, 7 mics."""
    rng = np.random.default_rng(seed)
    n = seconds * sr
    t = np.arange(n) / sr
    s1 = 0.1 * np.sin(2 * np.pi * 150 * t) * (0.5 + 0.5 * np.sin(2 * np.pi * 2 * t))
    s2 = 0.1 * np.sin(2 * np.pi * 280 * t) * (0.5 + 0.5 * np.cos(2 * np.pi * 3 * t))
    chans = []
    for c in range(7):
        d1, d2 = c * 2, c * 3  # sample delays per channel
        ch = np.roll(s1, d1) + np.roll(s2, d2)
        ch += 0.01 * rng.standard_normal(n)
        chans.append(ch.astype(np.float32))
    return np.stack(chans)


@pytest.mark.slow
def test_7ch_pipeline_end_to_end(tmp_path):
    idim = 257 * 7  # mag + 6 IPD pairs (feature.py:133)
    model = BLSTM(idim=idim, num_bins=257, hidden_dim=16, num_layers=1,
                  dropout_rate=0.0)
    f = jnp.zeros((1, 10, idim))
    variables = model.init({"params": jax.random.PRNGKey(0)}, f, train=False)

    config = {
        "sampling_rate": 16000,
        "separation": {"batch_size": 4, "eval_win": 2.4, "eval_hop": 0.8,
                       "frame_length": 512, "frame_shift": 256,
                       "ipd": "1,0;2,0;3,0;4,0;5,0;6,0",
                       "merge": True, "merge_threshold": 16},
        "stitching": {"eval_win": 2.4, "eval_hop": 0.8, "hop_size": 256},
        "beamforming": {"type": "SoudenMVDRBeamformer", "hop_size": 256,
                        "n_fft": 512, "eval_hop": 0.8, "eval_win": 2.4,
                        "proceed_margin": 2, "wta_thresh": 1e-4},
    }
    pipe = CssPipeline(model, variables, config)
    wav = _make_7ch_recording()
    out0, out1 = pipe.process_recording("sess7", wav, tmp_path)
    assert out0.shape == (wav.shape[1],)
    assert np.isfinite(out0).all() and np.isfinite(out1).all()
    assert np.abs(out0).max() <= 0.91
    assert (tmp_path / "sess7_0.wav").exists()


def test_7ch_separator_feature_dim():
    from css_tpu.executor.separator import Separator

    idim = 257 * 7
    model = BLSTM(idim=idim, num_bins=257, hidden_dim=16, num_layers=1)
    f = jnp.zeros((1, 10, idim))
    variables = model.init({"params": jax.random.PRNGKey(0)}, f, train=False)
    sep = Separator(model, variables, batch_size=4,
                    ipd_index="1,0;2,0;3,0;4,0;5,0;6,0", merge=True)
    wav = _make_7ch_recording(seconds=5)
    masks, mags = sep.separate(wav)
    assert masks.shape[-1] == 3 and masks.shape[2] == 257
    assert mags.shape[2] == 257  # first-channel magnitude only
