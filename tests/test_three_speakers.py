"""K=3 speakers end-to-end: the reference hardcodes 2 speakers in its
stitcher (stitcher.py:31,42-49); this framework generalizes the whole
path — mixer sampling, PIT (K! gather), masks, stitcher permutation
composition, beamformer streams, pipeline outputs."""

import numpy as np

import jax
import jax.numpy as jnp

from css_tpu.data import SyntheticCorpus
from css_tpu.data.mixer import MixtureSynthesizer
from css_tpu.executor.pipeline import CssPipeline
from css_tpu.executor.stitcher import Stitcher
from css_tpu.models.blstm import BLSTM
from css_tpu.objectives.mse import MeanSquaredError
from css_tpu.trainer import LRSchedule, Trainer
import pytest


def test_mixer_three_speakers():
    c = SyntheticCorpus(num_speakers=5, utts_per_speaker=2)
    ds = MixtureSynthesizer(c, batch_size=4, min_window=2.0, max_window=2.0,
                            seed=0, num_speakers=3)
    b = next(ds)
    assert {"source1", "source2", "source3"} <= set(b)
    np.testing.assert_allclose(
        b["mix"], b["source1"] + b["source2"] + b["source3"], atol=1e-5)


@pytest.mark.slow
def test_three_speaker_training_step():
    c = SyntheticCorpus(num_speakers=5, utts_per_speaker=2)
    ds = MixtureSynthesizer(c, batch_size=4, min_window=2.0, max_window=2.0,
                            seed=0, num_speakers=3)
    model = BLSTM(idim=257, num_bins=257, num_spk=3, num_noise=1,
                  hidden_dim=24, num_layers=1, dropout_rate=0.0)
    trainer = Trainer(model, MeanSquaredError(noise_weight=0.3),
                      LRSchedule(lr=1e-3), optim="adam", grad_thresh=5.0)
    rng = jax.random.PRNGKey(0)
    state = trainer.init_state(rng, next(ds))
    state, m = trainer._train_step(state, next(ds), rng)
    assert np.isfinite(float(m["loss"]))
    # PIT permutations cover 3! = 6 candidates; perms row has 3 entries
    # (shape checked indirectly through y_pred)
    out = model.apply({"params": state.params},
                      jnp.zeros((1, 10, 257)), train=False)
    assert out[0].shape[1] == 3  # y_pred speakers
    assert out[1].shape[-1] == 4  # 3 spk + 1 noise masks


def test_stitcher_three_speakers_composes_permutations():
    k, b, t, f = 3, 4, 150, 9
    rng = np.random.default_rng(0)
    # distinct band-limited sources, cyclically rotated per window
    base = np.zeros((k, t, f), np.float32)
    for s in range(k):
        base[s, :, s * 3 : s * 3 + 3] = 0.9
    rotations = [0, 1, 2, 0]  # local order rotates per window
    masks = np.zeros((b, t, f, k + 1), np.float32)
    for i in range(b):
        r = rotations[i]
        for s in range(k):
            masks[i, ..., s] = base[(s + r) % k]
        masks[i, ..., k] = 0.05
    mags = np.ones((b, t, f), np.float32)
    st = Stitcher(num_spk=3)
    res = [np.asarray(x) for x in st(masks, mags)]
    assert len(res) == 4
    # global stream 0 must consistently be the band of source rotations[0]=0
    r0 = res[0]
    band0 = r0[:, 0:3].mean()
    other = r0[:, 3:9].mean()
    assert band0 > 5 * other


@pytest.mark.slow
def test_three_speaker_pipeline_end_to_end(tmp_path):
    model = BLSTM(idim=257, num_bins=257, num_spk=3, num_noise=1,
                  hidden_dim=16, num_layers=1, dropout_rate=0.0)
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
    assert pipe.num_spk == 3
    rng = np.random.default_rng(1)
    wav = (rng.standard_normal(16000 * 6) * 0.1).astype(np.float32)
    outs = pipe.process_recording("rec3", wav, tmp_path)
    assert len(outs) == 3
    for i in range(3):
        assert outs[i].shape == wav.shape
        assert (tmp_path / f"rec3_{i}.wav").exists()

    # ...and through the evaluate CLI, which discovers K=3 from the files
    import json

    from css_tpu.cli import evaluate
    from css_tpu.data.corpus import write_wav

    ref_dir = tmp_path / "refs"
    mix_dir = tmp_path / "mixes"
    ref_dir.mkdir()
    mix_dir.mkdir()
    for i in range(3):
        write_wav(ref_dir / f"rec3_src{i}.wav",
                  (rng.standard_normal(len(wav)) * 0.05).astype(np.float32))
    write_wav(mix_dir / "rec3.wav", wav)
    out_jsonl = tmp_path / "results.jsonl"
    evaluate.main(["--estimates", str(tmp_path), "--references", str(ref_dir),
                   "--mixtures", str(mix_dir), "--output", str(out_jsonl)])
    recs = [json.loads(l) for l in open(out_jsonl)]
    assert recs[0]["num_spk"] == 3
    assert np.isfinite(recs[0]["si_snr_db"])
    assert "si_snri_db" in recs[0]
