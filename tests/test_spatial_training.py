"""In-framework 7ch training: spatialized batches + IPD trainer features.

The reference's 7ch models were trained out-of-repo and imported as ONNX
(conf/config_7ch.yaml); here `--spatialize-channels 7` trains the
multichannel model end-to-end on synthesized far-field mixtures.
"""

import numpy as np

import jax
import jax.numpy as jnp

from css_tpu.data import SyntheticCorpus
from css_tpu.data.mixer import MixtureSynthesizer
from css_tpu.data.spatial import SpatialMixer
from css_tpu.models.blstm import BLSTM
from css_tpu.objectives.mse import MeanSquaredError
from css_tpu.ops.features import FeatureExtractor, mvn
from css_tpu.trainer import LRSchedule, Trainer
import pytest

IPD = "1,0;2,0;3,0;4,0;5,0;6,0"


def _mixer(batch=4, seed=0):
    corpus = SyntheticCorpus(num_speakers=4, utts_per_speaker=2, seed=seed)
    return MixtureSynthesizer(corpus, batch_size=batch, min_window=2.0,
                              max_window=2.0, seed=seed)


def test_spatial_mixer_batch_contract():
    sm = SpatialMixer(_mixer(), noise_level=0.0, seed=1)
    b = next(sm)
    assert b["mix"].shape == (4, 7, 32000)
    # channel 0 (center mic, zero delay) is the dry mono mixture
    mono = b["source1"] + b["source2"]
    assert np.allclose(b["mix"][:, 0], mono, atol=1e-3)
    # other channels carry the same energy but are NOT identical (delays)
    assert not np.allclose(b["mix"][:, 3], mono, atol=1e-5)


def test_trainer_features_match_executor_features():
    """Trainer input [raw ch0 mag, IPD] == executor feats [MVN mag, IPD]
    after the model's internal MVN (idempotency) — the parity that lets a
    spatially-trained model serve in the 7ch Separator unchanged."""
    sm = SpatialMixer(_mixer(), noise_level=0.003, seed=2)
    batch = next(sm)
    trainer = Trainer(BLSTM(idim=257 * 7, num_bins=257, hidden_dim=16,
                            num_layers=1),
                      MeanSquaredError(), LRSchedule(lr=1e-3, warmup=5),
                      ipd_index=IPD)
    feats = trainer._featurize(
        {k: jnp.asarray(v) for k, v in batch.items()
         if k == "mix" or k.startswith("source")})
    assert feats["input"].shape[-1] == 257 * 7

    fx = FeatureExtractor(512, 256, ipd_index=IPD)
    _, exec_feats, _ = fx(jnp.asarray(batch["mix"]))
    np.testing.assert_allclose(
        np.asarray(mvn(feats["input"], axis=-2)),
        np.asarray(mvn(exec_feats, axis=-2)), atol=2e-4)


@pytest.mark.slow
def test_7ch_training_to_7ch_pipeline(tmp_path):
    """Train the 7ch model briefly, then serve it through the full 7ch
    pipeline (IPD features, DOA merge, MVDR) — loss decreases and the
    pipeline emits finite full-length audio."""
    from css_tpu.data.spatial import spatial_session
    from css_tpu.executor.pipeline import CssPipeline

    sm = SpatialMixer(_mixer(batch=4, seed=3), noise_level=0.003, seed=3)
    model = BLSTM(idim=257 * 7, num_bins=257, hidden_dim=32, num_layers=1,
                  dropout_rate=0.0)
    trainer = Trainer(model, MeanSquaredError(noise_weight=0.3),
                      LRSchedule(lr=2e-3, warmup=10), optim="adam",
                      grad_thresh=5.0, ipd_index=IPD)
    rng = jax.random.PRNGKey(0)
    state = trainer.init_state(rng, next(sm))
    state, loss0 = trainer.train_one_epoch(state, sm, 12, rng)
    state, loss1 = trainer.train_one_epoch(state, sm, 12, rng)
    assert float(loss1) < float(loss0)

    corpus = SyntheticCorpus(num_speakers=2, utts_per_speaker=1, seed=77,
                             min_dur=5.0, max_dur=6.0)
    n = 16000 * 4
    srcs = np.stack([corpus.by_speaker["spk0"][0].load()[:n],
                     corpus.by_speaker["spk1"][0].load()[:n]])
    wav7 = spatial_session(srcs, [60.0, 240.0], noise_level=0.003)

    config = {
        "sampling_rate": 16000,
        "separation": {"batch_size": 4, "eval_win": 2.4, "eval_hop": 0.8,
                       "frame_length": 512, "frame_shift": 256,
                       "ipd": IPD, "merge": True, "merge_threshold": 16},
        "stitching": {"eval_win": 2.4, "eval_hop": 0.8, "hop_size": 256},
        "beamforming": {"type": "SoudenMVDRBeamformer", "hop_size": 256,
                        "n_fft": 512, "eval_hop": 0.8, "eval_win": 2.4,
                        "proceed_margin": 2, "wta_thresh": 1e-4},
    }
    pipe = CssPipeline(model, {"params": state.params}, config)
    out0, out1 = pipe.process_recording("spatial", wav7, tmp_path)
    assert out0.shape == (wav7.shape[1],)
    assert np.isfinite(out0).all() and np.isfinite(out1).all()
    assert (tmp_path / "spatial_0.wav").exists()


def test_device_spatialize_matches_host():
    """On-chip far-field rendering == the host SpatialMixer for the same
    recipe + azimuths (sensor noise off: the device draws its own)."""
    from css_tpu.data.device_mixer import DeviceMixer, materialize

    m = _mixer(batch=3, seed=11)
    sm = SpatialMixer(m, noise_level=0.0, seed=11)
    dm = DeviceMixer(sm)
    recipe = m.sample_recipe()
    enc = dm.encode(recipe)
    az_deg = np.degrees(enc["dm_f"][:, 3:3 + m.num_speakers])

    host = sm.spatialize_batch(m.materialize_recipe_host(recipe), az=az_deg)
    pools = {k: jnp.asarray(v) for k, v in dm.host_pools.items()}
    dev = jax.jit(materialize)(pools, jax.tree.map(jnp.asarray, enc))
    assert np.asarray(dev["mix"]).shape == host["mix"].shape == (3, 7, 32000)
    np.testing.assert_allclose(np.asarray(dev["mix"]), host["mix"],
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(dev["source1"]), host["source1"],
                               atol=1e-6)


@pytest.mark.slow
def test_cli_device_mix_spatial(tmp_path):
    """--spatialize-channels composes with --device-mix end-to-end."""
    from css_tpu.cli import train as train_cli

    train_cli.main([
        "--expdir", str(tmp_path), "--model", "BLSTM", "--objective", "MSE",
        "--synthetic-data", "--spatialize-channels", "7", "--device-mix",
        "--batch-size", "4", "--batches-per-epoch", "3", "--num-epochs", "1",
        "--optim", "adam", "--lr", "1e-3", "--warmup", "2",
        "--blstm-hdim", "32", "--blstm-num-layers", "1",
        "--min-window-size", "2", "--max-window-size", "2", "--job", "1"])
    assert (tmp_path / "1.1.mdl").exists()
