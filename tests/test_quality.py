"""Separation-quality smoke test: a briefly trained model + the full
pipeline must beat the mixture baseline (positive SI-SNRi) on synthetic
two-speaker material."""

import numpy as np

import jax

from css_tpu.data import SyntheticCorpus
from css_tpu.data.mixer import MixtureSynthesizer
from css_tpu.executor.pipeline import CssPipeline
from css_tpu.models.blstm import BLSTM
from css_tpu.objectives.mse import MeanSquaredError
from css_tpu.trainer import LRSchedule, Trainer
from css_tpu.utils.metrics import pit_si_snr_db, si_snr_db, si_snr_improvement_db


def test_trained_model_improves_si_snr():
    corpus = SyntheticCorpus(num_speakers=6, utts_per_speaker=4, seed=0)
    loader = MixtureSynthesizer(corpus, batch_size=8, min_window=2.0,
                                max_window=2.0, seed=0)
    model = BLSTM(idim=257, num_bins=257, hidden_dim=128, num_layers=2,
                  dropout_rate=0.0)
    trainer = Trainer(model, MeanSquaredError(noise_weight=0.3),
                      LRSchedule(lr=3e-3, warmup=20), optim="adam",
                      grad_thresh=5.0)
    rng = jax.random.PRNGKey(0)
    state = trainer.init_state(rng, next(loader))
    state, loss0 = trainer.train_one_epoch(state, loader, 60, rng)
    state, loss1 = trainer.train_one_epoch(state, loader, 60, rng)
    assert loss1 < loss0

    # held-out 2-speaker mixture, full pipeline with masking resynthesis
    test_corpus = SyntheticCorpus(num_speakers=6, utts_per_speaker=4,
                                  seed=123)
    u1 = test_corpus.by_speaker["spk0"][0].load()
    u2 = test_corpus.by_speaker["spk3"][0].load()
    n = 16000 * 4
    u1 = np.tile(u1, 3)[:n]
    u2 = np.tile(u2, 3)[:n]
    mix = u1 + u2

    config = {
        "sampling_rate": 16000,
        "separation": {"batch_size": 8, "eval_win": 2.4, "eval_hop": 0.8,
                       "frame_length": 512, "frame_shift": 256},
        "stitching": {"eval_win": 2.4, "eval_hop": 0.8, "hop_size": 256},
        "beamforming": {"type": "masking", "hop_size": 256, "n_fft": 512,
                        "eval_hop": 0.8, "eval_win": 2.4,
                        "proceed_margin": 2, "wta_thresh": 1e-4},
    }
    variables = {"params": state.params}
    pipe = CssPipeline(model, variables, config)
    out0, out1 = pipe.process(mix.astype(np.float32))

    improvement = si_snr_improvement_db([out0, out1], [u1, u2], mix)
    sep_quality = pit_si_snr_db([out0, out1], [u1, u2])
    mix_quality = np.mean([si_snr_db(mix, u1), si_snr_db(mix, u2)])
    print(f"mix {mix_quality:.2f} dB -> separated {sep_quality:.2f} dB "
          f"(SI-SNRi {improvement:+.2f} dB)")
    # regression floor: this config measures ~+1.9 dB (a broken stitcher,
    # WTA, or resynthesis regression drops it near/below 0)
    assert improvement > 1.5, (
        f"expected SI-SNRi > 1.5 dB, got {improvement:.2f} dB")
