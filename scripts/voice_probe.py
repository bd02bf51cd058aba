"""CPU probe: does per-speaker timbre (voice="formant") make CLOSE-f0
speaker pairs separable where the legacy harmonic corpus cannot be?

Trains a small BLSTM on a dense-f0 corpus under each voice model, then
evaluates SI-SNRi on held-out partial-overlap sessions (the BASELINE.md
protocol's `make_session`) built from (a) the closest-f0 speaker pairs
(the catastrophic sessions of the 8-session protocol) and (b) far-f0
control pairs. True per-speaker fundamentals come from
`SyntheticCorpus.f0_by_speaker`. Run with JAX_PLATFORMS=cpu.

Usage: python scripts/voice_probe.py [--voice harmonic|formant]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent))
from quality_eval import make_session  # noqa: E402


class _PairCorpus:
    """View of a corpus restricted to two speakers, for make_session."""

    def __init__(self, corpus, spk_a, spk_b):
        self.speakers = [spk_a, spk_b]
        self.by_speaker = {s: corpus.by_speaker[s] for s in self.speakers}


def rank_pairs(corpus):
    f0 = corpus.f0_by_speaker
    pairs = []
    for i, a in enumerate(corpus.speakers):
        for b in corpus.speakers[i + 1:]:
            pairs.append((a, b, abs(f0[a] - f0[b])))
    pairs.sort(key=lambda p: p[2])
    return pairs


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--voice", default="formant",
                        choices=("harmonic", "formant"))
    parser.add_argument("--epochs", type=int, default=16)
    parser.add_argument("--steps-per-epoch", type=int, default=80)
    parser.add_argument("--hidden-dim", type=int, default=256)
    parser.add_argument("--num-pairs", type=int, default=3)
    parser.add_argument("--session-sec", type=float, default=30.0)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(argv)

    import jax

    from css_tpu.data import SyntheticCorpus
    from css_tpu.data.mixer import MixtureSynthesizer
    from css_tpu.executor.pipeline import CssPipeline
    from css_tpu.models.blstm import BLSTM
    from css_tpu.objectives.mse import MeanSquaredError
    from css_tpu.trainer import LRSchedule, Trainer
    from css_tpu.utils.metrics import si_snr_improvement_db

    train_corpus = SyntheticCorpus(num_speakers=48, utts_per_speaker=4,
                                   seed=args.seed, f0_max=400,
                                   voice=args.voice)
    loader = MixtureSynthesizer(train_corpus, batch_size=8, min_window=2.0,
                                max_window=2.0, seed=args.seed)
    model = BLSTM(idim=257, num_bins=257, hidden_dim=args.hidden_dim,
                  num_layers=2, dropout_rate=0.0)
    trainer = Trainer(model, MeanSquaredError(noise_weight=0.3),
                      LRSchedule(lr=3e-3, warmup=30), optim="adam",
                      grad_thresh=5.0)
    rng = jax.random.PRNGKey(args.seed)
    state = trainer.init_state(rng, next(loader))
    for e in range(args.epochs):
        rng, erng = jax.random.split(rng)
        state, loss = trainer.train_one_epoch(
            state, loader, args.steps_per_epoch, erng)
        print(f"epoch {e + 1}: loss {float(loss):.5f}", flush=True)

    # held-out corpus, same voice model, disjoint seed
    test_corpus = SyntheticCorpus(num_speakers=24, utts_per_speaker=4,
                                  seed=args.seed + 777, f0_max=400,
                                  voice=args.voice)
    ranked = rank_pairs(test_corpus)
    groups = {"close": ranked[: args.num_pairs],
              "far": ranked[-args.num_pairs:]}

    config = {
        "sampling_rate": 16000,
        "separation": {"batch_size": 8, "eval_win": 2.4, "eval_hop": 0.8,
                       "frame_length": 512, "frame_shift": 256},
        "stitching": {"eval_win": 2.4, "eval_hop": 0.8, "hop_size": 256},
        "beamforming": {"type": "masking", "hop_size": 256, "n_fft": 512,
                        "eval_hop": 0.8, "eval_win": 2.4,
                        "proceed_margin": 2, "wta_thresh": 1e-4},
    }
    pipe = CssPipeline(model, {"params": state.params}, config)

    out = {"voice": args.voice}
    for name, pairs in groups.items():
        rows = []
        for a, b, df in pairs:
            # deterministic per-pair seed (str hash is salted per process)
            srng = np.random.default_rng(
                (args.seed, int(a[3:]), int(b[3:])))
            mix, srcs = make_session(_PairCorpus(test_corpus, a, b), srng,
                                     args.session_sec)
            o0, o1 = pipe.process(mix.astype(np.float32))
            imp = si_snr_improvement_db([o0, o1], list(srcs), mix)
            rows.append({"spk": [a, b], "f0_diff_hz": round(df, 1),
                         "si_snri_db": round(float(imp), 2)})
            print(f"{name} pair {a}/{b} (Δf0 {df:.1f} Hz): "
                  f"SI-SNRi {imp:+.2f} dB", flush=True)
        out[name] = {"pairs": rows, "mean_si_snri_db": round(
            float(np.mean([r["si_snri_db"] for r in rows])), 2)}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
