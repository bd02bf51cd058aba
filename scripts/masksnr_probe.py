"""CPU probe: does MaskSNR fine-tuning lift held-out session SI-SNRi
over the MSE-pretrained model it starts from?

Small BLSTM scale — the direction (not the magnitude) is the signal
before committing TPU time to the Conformer fine-tune phase
(recipes/train_quality.sh masksnr). Run with JAX_PLATFORMS=cpu.
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


def eval_sessions(model, params, corpus, seed, n_sessions, session_sec):
    from css_tpu.executor.pipeline import CssPipeline
    from css_tpu.utils.metrics import si_snr_improvement_db

    config = {
        "sampling_rate": 16000,
        "separation": {"batch_size": 8, "eval_win": 2.4, "eval_hop": 0.8,
                       "frame_length": 512, "frame_shift": 256},
        "stitching": {"eval_win": 2.4, "eval_hop": 0.8, "hop_size": 256},
        "beamforming": {"type": "masking", "hop_size": 256, "n_fft": 512,
                        "eval_hop": 0.8, "eval_win": 2.4,
                        "proceed_margin": 2, "wta_thresh": 1e-4},
    }
    pipe = CssPipeline(model, {"params": params}, config)
    rng = np.random.default_rng(seed)
    imps = []
    for _ in range(n_sessions):
        mix, srcs = make_session(corpus, rng, session_sec)
        o0, o1 = pipe.process(mix.astype(np.float32))
        imps.append(float(si_snr_improvement_db([o0, o1], list(srcs), mix)))
    return imps


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--pre-epochs", type=int, default=14)
    parser.add_argument("--ft-epochs", type=int, default=4)
    parser.add_argument("--steps-per-epoch", type=int, default=80)
    parser.add_argument("--sessions", type=int, default=4)
    parser.add_argument("--session-sec", type=float, default=30.0)
    parser.add_argument("--voice", default="harmonic",
                        choices=("harmonic", "formant"))
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(argv)

    import jax

    from css_tpu.data import SyntheticCorpus
    from css_tpu.data.mixer import MixtureSynthesizer
    from css_tpu.models.blstm import BLSTM
    from css_tpu.objectives.masksnr import MaskSiSnr
    from css_tpu.objectives.mse import MeanSquaredError
    from css_tpu.trainer import LRSchedule, Trainer

    train_corpus = SyntheticCorpus(num_speakers=48, utts_per_speaker=4,
                                   seed=args.seed, f0_max=400,
                                   voice=args.voice)
    held_out = SyntheticCorpus(num_speakers=6, utts_per_speaker=4,
                               seed=args.seed + 777, f0_max=400,
                               voice=args.voice)
    loader = MixtureSynthesizer(train_corpus, batch_size=8, min_window=2.0,
                                max_window=2.0, seed=args.seed)
    model = BLSTM(idim=257, num_bins=257, hidden_dim=256, num_layers=2,
                  dropout_rate=0.0)
    rng = jax.random.PRNGKey(args.seed)

    pre = Trainer(model, MeanSquaredError(noise_weight=0.3),
                  LRSchedule(lr=3e-3, warmup=30), optim="adam",
                  grad_thresh=5.0)
    state = pre.init_state(rng, next(loader))
    for e in range(args.pre_epochs):
        rng, erng = jax.random.split(rng)
        state, loss = pre.train_one_epoch(state, loader,
                                          args.steps_per_epoch, erng)
    print(f"pretrain final MSE loss {float(loss):.5f}", flush=True)
    base = eval_sessions(model, state.params, held_out, args.seed + 5,
                         args.sessions, args.session_sec)
    print(f"MSE-pretrained held-out SI-SNRi: {np.mean(base):+.2f} dB "
          f"{[round(x, 2) for x in base]}", flush=True)

    ft = Trainer(model, MaskSiSnr(mag_weight=0.05),
                 LRSchedule(lr=3e-4, warmup=20), optim="adam",
                 grad_thresh=5.0)
    ft_state = ft.state_from_variables({"params": state.params})
    for e in range(args.ft_epochs):
        rng, erng = jax.random.split(rng)
        ft_state, loss = ft.train_one_epoch(ft_state, loader,
                                            args.steps_per_epoch, erng)
        print(f"ft epoch {e + 1}: loss {float(loss):.3f}", flush=True)
    tuned = eval_sessions(model, ft_state.params, held_out, args.seed + 5,
                          args.sessions, args.session_sec)
    print(f"MaskSNR fine-tuned held-out SI-SNRi: {np.mean(tuned):+.2f} dB "
          f"{[round(x, 2) for x in tuned]}", flush=True)
    print(json.dumps({"voice": args.voice,
                      "pre_mean_db": round(float(np.mean(base)), 2),
                      "ft_mean_db": round(float(np.mean(tuned)), 2)}))


if __name__ == "__main__":
    main()
