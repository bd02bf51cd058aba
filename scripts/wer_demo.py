"""End-to-end WER loop: train(ed checkpoint) -> separate -> WER.

The reference's end metric was WER via an EXTERNAL ASR over separated
LibriCSS sessions (SURVEY.md §5 metrics row); `cli.wer` implements the
scoring hook but, with no real ASR in this environment, the full loop
had never executed (round-3 VERDICT missing #4). This harness runs it
for real on the synthetic corpus using the in-repo pitch-token decoder
(`cli.toy_asr`, matched to the transcripts `SyntheticCorpus` records):

  1. build held-out sessions (same protocol generator as
     scripts/quality_eval.py) and write per-utterance reference
     transcripts;
  2. WER of the CLEAN sources            (decoder floor);
  3. WER of the raw MIXTURE              (un-separated ceiling);
  4. `cli.separate` with the checkpoint, then WER of the streams.

Separation quality must land between floor and ceiling; the separated-
vs-mixture gap is the WER version of the SI-SNRi headline.

  python scripts/wer_demo.py --checkpoint exp/f2ft/best.1.mdl \
      [--sessions 4] [--session-sec 30] [--voice formant] [--reanchor]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root

import argparse
import json

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--model", default="Conformer")
    parser.add_argument("--sessions", type=int, default=4)
    parser.add_argument("--session-sec", type=float, default=30.0)
    parser.add_argument("--seed", type=int, default=123)
    parser.add_argument("--num-speakers", type=int, default=6)
    parser.add_argument("--utts-per-speaker", type=int, default=4)
    parser.add_argument("--f0-max", type=float, default=None)
    parser.add_argument("--voice", default="formant",
                        choices=("harmonic", "formant"))
    parser.add_argument("--workdir", default="/tmp/css_tpu_wer")
    parser.add_argument("--reanchor", action="store_true")
    parser.add_argument("--beamformer", default="masking")
    parser.add_argument("--streaming", action="store_true",
                        help="also score the window-granular streaming "
                             "executor (cli.separate --streaming) — "
                             "wer_separated_streaming column")
    parser.add_argument("--checkpoint-7ch", default=None,
                        help="7ch checkpoint (idim 257*7, "
                             "--spatialize-channels 7 training): render "
                             "the sessions on the 7-mic array and score "
                             "the MVDR path — wer_separated_7ch column")
    parser.add_argument("--model-7ch", default="Conformer")
    parser.add_argument("--noise-level", type=float, default=0.003)
    args = parser.parse_args(argv)

    import yaml

    from css_tpu.cli import separate as separate_cli
    from css_tpu.cli import wer as wer_cli
    from css_tpu.data import SyntheticCorpus
    from css_tpu.data.corpus import write_wav
    from css_tpu.data.sessions import make_session

    work = Path(args.workdir)
    mix_dir, clean_dir, out_dir = work / "mix", work / "clean", work / "out"
    mixbase_dir = work / "mixbase"  # mixture-as-stream WER baseline
    for d in (mix_dir, clean_dir, out_dir, mixbase_dir):
        d.mkdir(parents=True, exist_ok=True)

    mix7_dir = work / "mix7"
    if args.checkpoint_7ch and not Path(args.checkpoint_7ch).exists():
        # skip the 7ch arm cleanly (e.g. the s7 training step failed) —
        # crashing here would discard the 1ch columns computed below
        print(f"checkpoint-7ch {args.checkpoint_7ch} missing — "
              "skipping the 7ch arm", flush=True)
        args.checkpoint_7ch = None
    if args.checkpoint_7ch:
        mix7_dir.mkdir(parents=True, exist_ok=True)

    corpus = SyntheticCorpus(
        num_speakers=args.num_speakers,
        utts_per_speaker=args.utts_per_speaker, seed=args.seed,
        f0_max=args.f0_max, voice=args.voice)
    rng = np.random.default_rng(args.seed)
    refs_path = work / "refs.jsonl"
    with open(refs_path, "w") as f:
        for i in range(args.sessions):
            mix, srcs, spoken = make_session(
                corpus, rng, args.session_sec, with_info=True)
            key = f"sess{i}"
            write_wav(mix_dir / f"{key}.wav", mix)
            if args.checkpoint_7ch:
                from css_tpu.data.spatial import spatial_session

                # dedicated rng: drawing azimuths from the session rng
                # would shift every later session's material vs a run
                # without the 7ch arm (breaking 1ch/7ch comparability)
                az_rng = np.random.default_rng(args.seed + 1000 + i)
                az = az_rng.choice(np.arange(0, 360, 12), srcs.shape[0],
                                   replace=False)
                wav7 = spatial_session(srcs, az,
                                       noise_level=args.noise_level,
                                       seed=args.seed + i)
                write_wav(mix7_dir / f"{key}.wav", wav7)
            # mixture copy named as a stream so cli.wer can score the
            # un-separated baseline with the same discovery rule
            write_wav(mixbase_dir / f"{key}_0.wav", mix)
            for k in range(srcs.shape[0]):
                write_wav(clean_dir / f"{key}_{k}.wav", srcs[k])
            # one reference per SPEAKER: the concatenated transcript of
            # that speaker's turns (slot k speaks turns k, k+K, ...) — a
            # correctly separated stream decodes exactly this sequence;
            # per-utterance refs against full-stream hypotheses would
            # count every other utterance of the stream as insertions
            k_spk = srcs.shape[0]
            texts = [" ".join(u.text for u in spoken[k::k_spk] if u.text)
                     for k in range(k_spk)]
            f.write(json.dumps({"key": key, "texts": texts}) + "\n")

    asr = f"{sys.executable} -m css_tpu.cli.toy_asr {{wav}}"
    summary = {}
    print("== WER floor: clean sources ==", flush=True)
    summary["wer_clean"] = wer_cli.main([
        "--estimates", str(clean_dir), "--references", str(refs_path),
        "--asr-cmd", asr])["wer"]
    print("== WER ceiling: raw mixture ==", flush=True)
    summary["wer_mixture"] = wer_cli.main([
        "--estimates", str(mixbase_dir), "--references", str(refs_path),
        "--asr-cmd", asr])["wer"]

    ew, eh = 2.4, 0.8
    config = {
        "sampling_rate": 16000,
        "separation": {"batch_size": 32, "eval_win": ew, "eval_hop": eh,
                       "frame_length": 512, "frame_shift": 256},
        "stitching": {"eval_win": ew, "eval_hop": eh, "hop_size": 256,
                      "reanchor": bool(args.reanchor)},
        "beamforming": {"type": args.beamformer, "hop_size": 256,
                        "n_fft": 512, "eval_hop": eh, "eval_win": ew,
                        "proceed_margin": 2, "wta_thresh": 1e-4},
    }
    cfg_path = work / "config.yaml"
    cfg_path.write_text(yaml.safe_dump(config))
    separate_cli.main([
        "--config", str(cfg_path), "--checkpoint", args.checkpoint,
        "--model", args.model, "--corpus-dir", str(mix_dir),
        "--out-dir", str(out_dir)])
    print("== WER: separated streams ==", flush=True)
    summary["wer_separated"] = wer_cli.main([
        "--estimates", str(out_dir), "--references", str(refs_path),
        "--asr-cmd", asr])["wer"]

    if args.streaming:
        # VERDICT r4 next #10: every user surface gets an end-metric —
        # the incremental streaming executor scored on the same material
        out_stream = work / "out_stream"
        out_stream.mkdir(parents=True, exist_ok=True)
        separate_cli.main([
            "--config", str(cfg_path), "--checkpoint", args.checkpoint,
            "--model", args.model, "--corpus-dir", str(mix_dir),
            "--out-dir", str(out_stream), "--streaming"])
        print("== WER: separated streams (streaming executor) ==",
              flush=True)
        summary["wer_separated_streaming"] = wer_cli.main([
            "--estimates", str(out_stream), "--references", str(refs_path),
            "--asr-cmd", asr])["wer"]

    if args.checkpoint_7ch:
        # 7ch MVDR path on the far-field renders (channel 0 carries the
        # dry mixture image, so the same references apply)
        config7 = {
            "sampling_rate": 16000,
            "separation": {"batch_size": 16, "eval_win": ew, "eval_hop": eh,
                           "frame_length": 512, "frame_shift": 256,
                           "ipd": "1,0;2,0;3,0;4,0;5,0;6,0",
                           "merge": True, "merge_threshold": 16},
            "stitching": {"eval_win": ew, "eval_hop": eh, "hop_size": 256,
                          "reanchor": bool(args.reanchor)},
            "beamforming": {"type": "SoudenMVDRBeamformer",
                            "hop_size": 256, "n_fft": 512, "eval_hop": eh,
                            "eval_win": ew, "proceed_margin": 2,
                            "wta_thresh": 1e-4},
        }
        cfg7_path = work / "config7.yaml"
        cfg7_path.write_text(yaml.safe_dump(config7))
        out7 = work / "out7"
        out7.mkdir(parents=True, exist_ok=True)
        separate_cli.main([
            "--config", str(cfg7_path), "--checkpoint", args.checkpoint_7ch,
            "--model", args.model_7ch, "--corpus-dir", str(mix7_dir),
            "--out-dir", str(out7)])
        print("== WER: separated streams (7ch MVDR) ==", flush=True)
        summary["wer_separated_7ch"] = wer_cli.main([
            "--estimates", str(out7), "--references", str(refs_path),
            "--asr-cmd", asr])["wer"]

    summary |= {"sessions": args.sessions, "voice": args.voice,
                "reanchor": bool(args.reanchor),
                "checkpoint": args.checkpoint}
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
