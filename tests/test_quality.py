"""Separation-quality tests: a briefly trained model + the full pipeline
must beat the mixture baseline (positive SI-SNRi) — both on a simple
synthetic mixture and on the HELD-OUT session protocol (the downsized
version of scripts/quality_eval.py, so a held-out-quality regression
fails CI, not just the out-of-band harness)."""

import numpy as np

import jax

from css_tpu.data import SyntheticCorpus
from css_tpu.data.mixer import MixtureSynthesizer
from css_tpu.data.sessions import make_session
from css_tpu.executor.pipeline import CssPipeline
from css_tpu.models.blstm import BLSTM
from css_tpu.objectives.mse import MeanSquaredError
from css_tpu.trainer import LRSchedule, Trainer
from css_tpu.utils.metrics import pit_si_snr_db, si_snr_db, si_snr_improvement_db
import pytest

PIPE_CONFIG = {
    "sampling_rate": 16000,
    "separation": {"batch_size": 8, "eval_win": 2.4, "eval_hop": 0.8,
                   "frame_length": 512, "frame_shift": 256},
    "stitching": {"eval_win": 2.4, "eval_hop": 0.8, "hop_size": 256},
    "beamforming": {"type": "masking", "hop_size": 256, "n_fft": 512,
                    "eval_hop": 0.8, "eval_win": 2.4,
                    "proceed_margin": 2, "wta_thresh": 1e-4},
}


@pytest.fixture(scope="module")
def trained_pipeline():
    """Small BLSTM trained briefly on seed-0 speakers; both quality tests
    evaluate it on DISJOINT seed-123 speakers."""
    corpus = SyntheticCorpus(num_speakers=16, utts_per_speaker=4, seed=0,
                             f0_max=400)
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
    state, loss1 = trainer.train_one_epoch(state, loader, 120, rng)
    assert loss1 < loss0
    pipe = CssPipeline(model, {"params": state.params}, PIPE_CONFIG)
    return pipe


@pytest.mark.slow
def test_trained_model_improves_si_snr(trained_pipeline):
    # held-out 2-speaker mixture, full pipeline with masking resynthesis
    test_corpus = SyntheticCorpus(num_speakers=6, utts_per_speaker=4,
                                  seed=123)
    u1 = test_corpus.by_speaker["spk0"][0].load()
    u2 = test_corpus.by_speaker["spk3"][0].load()
    n = 16000 * 4
    u1 = np.tile(u1, 3)[:n]
    u2 = np.tile(u2, 3)[:n]
    mix = u1 + u2

    out0, out1 = trained_pipeline.process(mix.astype(np.float32))

    improvement = si_snr_improvement_db([out0, out1], [u1, u2], mix)
    sep_quality = pit_si_snr_db([out0, out1], [u1, u2])
    mix_quality = np.mean([si_snr_db(mix, u1), si_snr_db(mix, u2)])
    print(f"mix {mix_quality:.2f} dB -> separated {sep_quality:.2f} dB "
          f"(SI-SNRi {improvement:+.2f} dB)")
    # regression floor: this config measures ~+1.9 dB (a broken stitcher,
    # WTA, or resynthesis regression drops it near/below 0)
    assert improvement > 1.5, (
        f"expected SI-SNRi > 1.5 dB, got {improvement:.2f} dB")


@pytest.mark.slow
def test_held_out_session_protocol(trained_pipeline):
    """Downsized scripts/quality_eval.py protocol (VERDICT round-2 weak
    #7): continuous alternating-utterance sessions with partial overlap,
    HELD-OUT speakers, scored per session — the in-distribution smoke
    above cannot catch a generalization regression; this can."""
    test_corpus = SyntheticCorpus(num_speakers=6, utts_per_speaker=4,
                                  seed=123, f0_max=400)
    # pin the speaker pairs by f0 distance (mid + wide, skipping the
    # degenerate closest pair — a smoke-scale model cannot separate it
    # and its score is pure noise): difficulty is reproducible by
    # construction, like quality_eval --stratify-f0
    f0 = test_corpus.f0_by_speaker
    ranked = sorted(
        ((a, b) for i, a in enumerate(test_corpus.speakers)
         for b in test_corpus.speakers[i + 1:]),
        key=lambda p: abs(f0[p[0]] - f0[p[1]]))
    pairs = [ranked[len(ranked) // 2], ranked[-1]]
    rng = np.random.default_rng(123)
    scores = []
    for pair in pairs:
        mix, srcs = make_session(test_corpus, rng, dur_sec=10.0, pair=pair)
        outs = trained_pipeline.process(mix)
        scores.append(si_snr_improvement_db(list(outs), list(srcs), mix))
    mean = float(np.mean(scores))
    print(f"held-out sessions SI-SNRi: {scores} (mean {mean:+.2f} dB)")
    # calibrated floor: this config measures ~+3.5 dB mean; a
    # stitcher/WTA/resynthesis/transfer
    # regression drives this to ~0 or negative
    assert mean > 1.0, (
        f"expected held-out session SI-SNRi > 1.0 dB, got {mean:+.2f}")
