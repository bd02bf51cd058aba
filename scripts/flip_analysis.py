"""Diagnose stream-identity flips in long-session separation outputs.

Full-session SI-SNRi scores the two output streams against the two
references under ONE global assignment; a single mid-session stitcher
swap (an identity flip) poisons the whole session even when every local
window is separated well. This script re-scores an existing
quality_eval workdir (mix/ ref/ out/) three ways:

  session : one assignment for the whole session (what cli.evaluate and
            BASELINE.md report);
  chunked : optimal assignment per `--chunk-sec` chunk (the CSS task
            contract — LibriCSS scores utterance-wise WER with
            optimistic stream assignment, separate_libricss.py:29);
  flips   : how many chunk boundaries change the winning permutation,
            and where.

If chunked >> session, the gap is routing (stitching) collapse, not
mask quality.

Usage: python scripts/flip_analysis.py --workdir /tmp/qeM_xxx [--chunk-sec 12]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import argparse
import json

import numpy as np

from css_tpu.data.corpus import read_wav
from css_tpu.utils.metrics import si_snr_db, si_snr_improvement_db


def chunk_scores(ests, refs, mix, sr, chunk_sec):
    n = min(min(map(len, ests)), min(map(len, refs)))
    step = int(chunk_sec * sr)
    rows = []
    for s in range(0, n, step):
        e = s + min(step, n - s)
        if e - s < sr:  # skip sub-second tails
            continue
        r0, r1 = refs[0][s:e], refs[1][s:e]
        # skip chunks where a reference is silent (assignment undefined)
        pows = [float(r @ r) for r in (r0, r1)]
        if min(pows) < 1e-8 * max(pows, default=1.0):
            rows.append({"t0": s / sr, "perm": None, "si_snri": None})
            continue
        direct = np.mean([si_snr_db(ests[i][s:e], (r0, r1)[i])
                          for i in range(2)])
        swapped = np.mean([si_snr_db(ests[1 - i][s:e], (r0, r1)[i])
                           for i in range(2)])
        base = np.mean([si_snr_db(mix[s:e], r) for r in (r0, r1)])
        rows.append({
            "t0": s / sr,
            "perm": int(swapped > direct),
            "si_snri": float(max(direct, swapped) - base),
        })
    return rows


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--chunk-sec", type=float, default=12.0)
    ap.add_argument("--reanchor", action="store_true",
                    help="apply executor.reanchor_streams to the outputs "
                         "before scoring (post-hoc flip repair A/B)")
    args = ap.parse_args(argv)

    work = Path(args.workdir)
    keys = sorted({p.stem for p in (work / "mix").glob("*.wav")})
    summary = []
    for key in keys:
        mix = read_wav(work / "mix" / f"{key}.wav")[0]
        if mix.ndim == 2:  # multichannel session: score against mic 0
            mix = mix[0]
        refs = [read_wav(work / "ref" / f"{key}_src{k}.wav")[0]
                for k in range(2)]
        ests = [read_wav(work / "out" / f"{key}_{k}.wav")[0]
                for k in range(2)]
        n_swaps = 0
        if args.reanchor:
            from css_tpu.executor.reanchor import reanchor_streams

            ests, n_swaps = reanchor_streams(ests)
        session = si_snr_improvement_db(ests, refs, mix)
        rows = chunk_scores(ests, refs, mix, 16000, args.chunk_sec)
        perms = [r["perm"] for r in rows if r["perm"] is not None]
        flips = sum(a != b for a, b in zip(perms, perms[1:]))
        vals = [r["si_snri"] for r in rows if r["si_snri"] is not None]
        rec = {
            "key": key,
            "session_si_snri": round(session, 2),
            "chunked_si_snri": round(float(np.mean(vals)), 2),
            "flips": flips,
            "perm_track": perms,
        }
        if args.reanchor:
            rec["reanchor_swaps"] = n_swaps
        summary.append(rec)
        print(json.dumps(rec))
    mean_sess = float(np.mean([r["session_si_snri"] for r in summary]))
    mean_chunk = float(np.mean([r["chunked_si_snri"] for r in summary]))
    print(json.dumps({
        "mean_session_si_snri": round(mean_sess, 2),
        "mean_chunked_si_snri": round(mean_chunk, 2),
        "routing_gap_db": round(mean_chunk - mean_sess, 2),
        "sessions_with_flips": sum(r["flips"] > 0 for r in summary),
    }))


if __name__ == "__main__":
    main()
