"""End-to-end separation-quality harness on synthetic LibriCSS-style sessions.

Generates held-out continuous 2-speaker sessions (alternating utterances
with LibriCSS-like partial overlap, 0-40%), runs the full user surface
(`cli.separate` -> `cli.evaluate`) against a trained checkpoint, and prints
the mean SI-SNRi plus the ideal-ratio-mask oracle on the same material.

Usage:
  python scripts/quality_eval.py --checkpoint exp/best.1.mdl \
      --model Conformer [--sessions 3] [--session-sec 60] [--workdir DIR]

This is the protocol behind BASELINE.md's quality headline (the reference's
quality story is WER via an external ASR, which this environment lacks;
SI-SNRi on synthetic sessions is the self-measured stand-in).
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root

import argparse
import json
from pathlib import Path

import numpy as np


from css_tpu.data.sessions import make_session  # noqa: F401 (protocol home)


def irm_oracle_si_snri(mix, srcs, sr=16000):
    """Ideal-ratio-mask resynthesis bound on the same material.

    Pinned to the CPU backend: the oracle is host-side bookkeeping, and
    complex device->host transfers are unimplemented on tunneled dev
    backends (axon).
    """
    import jax

    from css_tpu.ops.stft import istft, stft
    from css_tpu.utils.metrics import si_snr_improvement_db

    with jax.default_device(jax.devices("cpu")[0]):
        spec = np.asarray(stft(mix[None], 512, 256))[0]
        outs = []
        mags = [np.abs(np.asarray(stft(s[None], 512, 256))[0]) for s in srcs]
        denom = sum(mags) + 1e-8
        for m in mags:
            masked = spec * (m / denom)
            outs.append(np.asarray(
                istft(masked[None], 512, 256, length=mix.shape[-1]))[0])
        return si_snr_improvement_db(outs, list(srcs), mix)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--model", default="Conformer")
    parser.add_argument("--sessions", type=int, default=3)
    parser.add_argument("--session-sec", type=float, default=60.0)
    parser.add_argument("--seed", type=int, default=123)
    parser.add_argument("--num-speakers", type=int, default=6,
                        help="held-out corpus size")
    parser.add_argument("--corpus-seed", type=int, default=None,
                        help="override the session corpus seed (e.g. the "
                             "TRAINING seed for an in-distribution probe)")
    parser.add_argument("--utts-per-speaker", type=int, default=4)
    parser.add_argument("--f0-max", type=float, default=None,
                        help="dense f0 grid upper bound (match training)")
    parser.add_argument("--voice", default="harmonic",
                        choices=("harmonic", "formant"),
                        help="synthetic voice model (match training)")
    parser.add_argument("--workdir", default="/tmp/css_tpu_quality")
    parser.add_argument("--beamformer", default="masking")
    parser.add_argument("--reanchor", action="store_true",
                        help="enable session-level stream-identity "
                             "re-anchoring (executor/reanchor.py)")
    parser.add_argument("--reanchor-ab", action="store_true",
                        help="evaluate BOTH reanchor off and on in one "
                             "process (shared jit cache — the off arm's "
                             "compiles are reused by the on arm)")
    parser.add_argument("--eval-win", type=float, default=2.4,
                        help="separation window seconds (A/B window-length "
                             "vs quality; hop scales by the same factor)")
    parser.add_argument("--skip-oracle", action="store_true")
    parser.add_argument("--stratify-f0", action="store_true",
                        help="pick session speaker pairs evenly across the "
                             "|f0_a - f0_b| spectrum (hardest=closest pair "
                             "included) instead of at random — difficulty "
                             "is then reproducible by construction")
    args = parser.parse_args(argv)

    from css_tpu.cli import evaluate as evaluate_cli
    from css_tpu.cli import separate as separate_cli
    from css_tpu.data import SyntheticCorpus
    from css_tpu.data.corpus import write_wav

    work = Path(args.workdir)
    mix_dir, ref_dir, out_dir = work / "mix", work / "ref", work / "out"
    for d in (mix_dir, ref_dir, out_dir):
        d.mkdir(parents=True, exist_ok=True)

    # held-out speakers: seed disjoint from training corpora (train uses
    # seed / seed+1000 in cli.train)
    corpus = SyntheticCorpus(
        num_speakers=args.num_speakers,
        utts_per_speaker=args.utts_per_speaker,
        seed=args.seed if args.corpus_seed is None else args.corpus_seed,
        f0_max=args.f0_max, voice=args.voice)
    pairs = [None] * args.sessions
    if args.stratify_f0:
        f0 = corpus.f0_by_speaker
        ranked = sorted(
            ((a, b) for i, a in enumerate(corpus.speakers)
             for b in corpus.speakers[i + 1:]),
            key=lambda p: abs(f0[p[0]] - f0[p[1]]))
        idx = np.linspace(0, len(ranked) - 1, args.sessions).round()
        pairs = [ranked[int(j)] for j in idx]
        for p in pairs:
            print(f"stratified pair {p[0]}/{p[1]}: "
                  f"|df0| {abs(f0[p[0]] - f0[p[1]]):.1f} Hz")
    rng = np.random.default_rng(args.seed)
    oracle = []
    for i in range(args.sessions):
        mix, srcs = make_session(corpus, rng, args.session_sec,
                                 pair=pairs[i])
        key = f"sess{i}"
        write_wav(mix_dir / f"{key}.wav", mix)
        for k in range(2):
            write_wav(ref_dir / f"{key}_src{k}.wav", srcs[k])
        if not args.skip_oracle:
            oracle.append(irm_oracle_si_snri(mix, srcs))

    ew = float(args.eval_win)
    eh = round(ew / 3.0, 4)  # keep the reference's 3x window/hop overlap
    import yaml

    arms = ([False, True] if args.reanchor_ab else [bool(args.reanchor)])
    for ra in arms:
        config = {
            "sampling_rate": 16000,
            "separation": {"batch_size": 32, "eval_win": ew, "eval_hop": eh,
                           "frame_length": 512, "frame_shift": 256},
            "stitching": {"eval_win": ew, "eval_hop": eh, "hop_size": 256,
                          "reanchor": ra},
            "beamforming": {"type": args.beamformer, "hop_size": 256,
                            "n_fft": 512, "eval_hop": eh, "eval_win": ew,
                            "proceed_margin": 2, "wta_thresh": 1e-4},
        }
        tag = f"_ra{int(ra)}" if args.reanchor_ab else ""
        cfg_path = work / f"config{tag}.yaml"
        cfg_path.write_text(yaml.safe_dump(config))
        arm_out = work / f"out{tag}" if tag else out_dir
        arm_out.mkdir(parents=True, exist_ok=True)
        separate_cli.main([
            "--config", str(cfg_path), "--checkpoint", args.checkpoint,
            "--model", args.model, "--corpus-dir", str(mix_dir),
            "--out-dir", str(arm_out)])
        results_path = work / f"results{tag}.jsonl"
        evaluate_cli.main([
            "--estimates", str(arm_out), "--references", str(ref_dir),
            "--mixtures", str(mix_dir), "--output", str(results_path)])

        lines = [json.loads(l) for l in open(results_path)]
        summary = lines[-1]
        if oracle:
            summary["irm_oracle_si_snri_db"] = float(np.mean(oracle))
        if args.reanchor_ab:
            summary["reanchor"] = ra
        print(json.dumps(summary))


if __name__ == "__main__":
    main()
