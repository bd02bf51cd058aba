"""Validate probe configurations against the 8-session protocol ranking.

Round-4 finding (BASELINE.md): the 4x12 s held-out probe ranks
checkpoints WRONG across lineages — g2ft probed +9.32 (highest ever)
but protocolled +1.37 matched, while h1ft probed +8.46 and protocolled
+2.21; round-3 f2ft probed +8.4 and protocolled +5.54. The probe
under-samples (a) long-horizon routing errors (12 s sessions have only
3-4 stitch boundaries) and (b) close-f0 speaker pairs (random 2-of-6
draws rarely land the hardest pairs the stratified protocol always
contains).

This script scores given checkpoints under several probe configs and
prints them next to their known protocol numbers, so the shipped probe
config can be the one whose RANKING matches the protocol's
(VERDICT r4 next #5). No reference counterpart — this framework's own
selection mechanism.

Usage:
  python scripts/probe_validate.py \
      --checkpoints exp/h1ft/best.1.mdl exp/g2ft/best.1.mdl \
      --protocol-db 2.21 1.37 --f0-max 400 --voice formant
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--checkpoints", nargs="+", required=True)
    parser.add_argument("--protocol-db", nargs="*", type=float, default=[],
                        help="known 8-session matched-protocol SI-SNRi for "
                             "each checkpoint (printed for comparison)")
    parser.add_argument("--model", default="Conformer")
    parser.add_argument("--voice", default="formant")
    parser.add_argument("--f0-max", type=float, default=400.0)
    parser.add_argument("--probe-seed", type=int, default=456)
    parser.add_argument("--probe-speakers", type=int, default=6)
    parser.add_argument("--probe-utts", type=int, default=4)
    parser.add_argument("--cpu", action="store_true",
                        help="force the CPU backend (leave the TPU to "
                             "training queues)")
    args = parser.parse_args(argv)

    if args.cpu:
        import os

        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from css_tpu.data import SyntheticCorpus
    from css_tpu.models import MODELS
    from css_tpu.trainer import checkpoint
    from css_tpu.trainer.probe import HeldOutProbe

    corpus = SyntheticCorpus(num_speakers=args.probe_speakers,
                             utts_per_speaker=args.probe_utts,
                             seed=args.probe_seed, f0_max=args.f0_max,
                             voice=args.voice)

    configs = {
        # the shipped round-3/4 probe (the one that mis-ranked)
        "legacy 4x12s": dict(sessions=4, session_sec=12.0),
        # more stitch boundaries per session
        "long 4x30s": dict(sessions=4, session_sec=30.0),
        # + close-f0 coverage (mirrors the protocol's --stratify-f0)
        "strat 4x30s": dict(sessions=4, session_sec=30.0, stratify_f0=True),
        # denser f0-gap grid
        "strat 6x30s": dict(sessions=6, session_sec=30.0, stratify_f0=True),
    }
    probes = {name: HeldOutProbe(corpus, seed=args.probe_seed, **kw)
              for name, kw in configs.items()}

    rows = []
    prev_conf = None
    for i, path in enumerate(args.checkpoints):
        ckpt = checkpoint.load_checkpoint(path)
        # build from the checkpoint's stored conf (cli/separate.py:91-92)
        # so non-default hyperparameters score on the right architecture
        conf = dict(ckpt.get("conf", {}))
        model = MODELS[args.model].build_model(conf)
        if prev_conf is not None and conf != prev_conf:
            # HeldOutProbe caches its jitted fn closed over the first
            # model — rebuild the probes when the architecture changes
            probes = {name: HeldOutProbe(corpus, seed=args.probe_seed, **kw)
                      for name, kw in configs.items()}
        prev_conf = conf
        variables = {"params": ckpt["params"]}
        if ckpt.get("batch_stats"):
            variables["batch_stats"] = ckpt["batch_stats"]
        import jax.numpy as jnp

        variables = jax.tree.map(jnp.asarray, variables)
        row = {"checkpoint": path,
               "protocol": (args.protocol_db[i]
                            if i < len(args.protocol_db) else None)}
        for name, probe in probes.items():
            row[name] = probe(model, variables)
            print(f"  {path} :: {name}: {row[name]:+.3f} dB", flush=True)
        rows.append(row)

    names = list(configs)
    print("\ncheckpoint" + " " * 26
          + "  ".join(f"{n:>14}" for n in names) + "      protocol")
    for row in rows:
        cells = "  ".join(f"{row[n]:+14.3f}" for n in names)
        proto = ("%+14.3f" % row["protocol"]
                 if row["protocol"] is not None else " " * 14)
        print(f"{row['checkpoint']:<36}{cells}{proto}")

    # ranking agreement vs the protocol, config by config
    if len([r for r in rows if r["protocol"] is not None]) >= 2:
        scored = [r for r in rows if r["protocol"] is not None]
        proto_order = sorted(range(len(scored)),
                             key=lambda i: -scored[i]["protocol"])
        print("\nranking vs protocol:")
        for n in names:
            order = sorted(range(len(scored)), key=lambda i: -scored[i][n])
            ok = "MATCH" if order == proto_order else "INVERTED"
            print(f"  {n}: {ok}")


if __name__ == "__main__":
    main()
