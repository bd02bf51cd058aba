"""Attribute the pipeline's quality gap: mask estimator vs stitching.

Runs the full chunked pipeline twice on synthetic held-out sessions:

  * ``pipeline``    — the real energy-distance stitcher
    (css/executor/stitcher.py:14-52 semantics);
  * ``oracle_stitch`` — the SAME model masks, but each window's streams are
    routed by an oracle that compares masked energies against the true
    source magnitudes (absolute per-window assignment, no boundary
    composition).

The difference between the two isolates how much quality the stitcher's
boundary decisions lose; the remaining distance to the IRM oracle is mask
quality. Prints one JSON line.

Usage:
  python scripts/stitch_ablation.py --checkpoint exp/best.1.mdl \
      [--model Conformer] [--sessions 3] [--session-sec 60]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root
sys.path.insert(0, str(Path(__file__).resolve().parent))

import argparse
import itertools
import json

import numpy as np
from quality_eval import irm_oracle_si_snri, make_session  # noqa: E402


def oracle_window_routing(masks, mags, ref_mags):
    """Absolute per-window stream assignment: route local mask streams so
    masked energy best matches the true per-source magnitudes.

    masks (B, T, F, S), mags (B, T, F), ref_mags (K, B, T, F).
    Returns routed masks (B, T, F, S).
    """
    k = ref_mags.shape[0]
    e = masks[..., :k] * mags[..., None]  # (B, T, F, K)
    # cost[b, i, j] = ||e_i - ref_j||_1
    cost = np.sum(np.abs(e[..., :, None]
                         - np.transpose(ref_mags, (1, 2, 3, 0))[..., None, :]),
                  axis=(1, 2))  # (B, local i, ref j)
    routed = np.array(masks)
    for b in range(masks.shape[0]):
        best, best_p = None, None
        for p in itertools.permutations(range(k)):
            c = sum(cost[b, p[j], j] for j in range(k))
            if best is None or c < best:
                best, best_p = c, p
        routed[b, ..., :k] = masks[b][..., list(best_p)]
    return routed


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--model", default="Conformer")
    parser.add_argument("--sessions", type=int, default=3)
    parser.add_argument("--session-sec", type=float, default=60.0)
    parser.add_argument("--seed", type=int, default=123)
    parser.add_argument("--num-speakers", type=int, default=6)
    parser.add_argument("--f0-max", type=float, default=None)
    parser.add_argument("--voice", default="harmonic",
                        choices=("harmonic", "formant"))
    args = parser.parse_args(argv)

    import jax.numpy as jnp

    from css_tpu.data import SyntheticCorpus
    from css_tpu.executor.beamformer import Beamformer
    from css_tpu.executor.separator import Separator
    from css_tpu.executor.stitcher import Stitcher
    from css_tpu.ops.stft import stft_mag
    from css_tpu.utils.metrics import si_snr_improvement_db

    from css_tpu.models import MODELS
    from css_tpu.trainer import checkpoint

    ckpt = checkpoint.load_checkpoint(args.checkpoint)
    model = MODELS[args.model].build_model(dict(ckpt.get("conf", {})))
    variables = {"params": ckpt["params"]}
    if ckpt.get("batch_stats"):
        variables["batch_stats"] = ckpt["batch_stats"]
    sep = Separator(model, variables, eval_win=2.4, eval_hop=0.8,
                    frame_len=512, frame_hop=256, batch_size=32)
    stitcher = Stitcher(eval_win=2.4, eval_hop=0.8, fft_hop=256)
    bf = Beamformer(bf_type="masking", eval_win=2.4, eval_hop=0.8,
                    n_fft=512, hop_length=256, proceed_margin=2.0)

    corpus = SyntheticCorpus(num_speakers=args.num_speakers,
                             utts_per_speaker=4, seed=args.seed,
                             f0_max=args.f0_max, voice=args.voice)
    rng = np.random.default_rng(args.seed)
    res = {"pipeline": [], "oracle_stitch": [], "irm_oracle": []}
    for _ in range(args.sessions):
        mix, srcs = make_session(corpus, rng, args.session_sec)
        total = mix.shape[-1]
        win, hop = sep.win, sep.hop
        n_win = max(1, -(-(total - win) // hop) + 1)
        needed = (n_win - 1) * hop + win
        mix_p = np.pad(mix, (0, needed - total))
        srcs_p = np.pad(srcs, [(0, 0), (0, needed - total)])

        masks, mags = sep.separate(mix_p)
        # reference per-window magnitudes, same analysis as the separator
        from css_tpu.executor.windowing import unfold

        ref_mags = np.stack([
            np.asarray(stft_mag(jnp.asarray(unfold(s, win, hop)), 512, 256))
            for s in srcs_p])  # (K, B, T, F)

        # real stitcher
        stitched = [np.asarray(m) for m in stitcher(masks, mags)]
        outs = [o[:total] for o in bf.continuous_process(mix_p, stitched)]
        res["pipeline"].append(
            si_snr_improvement_db(list(outs), list(srcs), mix))

        # oracle routing, identity boundary composition
        routed = oracle_window_routing(masks, mags, ref_mags)
        ident = np.tile(np.arange(stitcher.num_spk, dtype=np.int32),
                        (masks.shape[0] - 1, 1))
        stitched_o = [np.asarray(m)
                      for m in stitcher.get_connect(jnp.asarray(ident),
                                                    jnp.asarray(routed))]
        outs_o = [o[:total] for o in bf.continuous_process(mix_p, stitched_o)]
        res["oracle_stitch"].append(
            si_snr_improvement_db(list(outs_o), list(srcs), mix))
        res["irm_oracle"].append(irm_oracle_si_snri(mix, srcs))

    print(json.dumps({k: round(float(np.mean(v)), 3) for k, v in res.items()}
                     | {f"{k}_all": [round(float(x), 2) for x in v]
                        for k, v in res.items()}))


if __name__ == "__main__":
    main()
