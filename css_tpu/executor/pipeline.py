"""End-to-end continuous separation pipeline.

Drives separator -> stitcher -> beamformer per recording, mirroring
scripts/python/separate_libricss.py:65-82 (which writes {key}_0.wav /
{key}_1.wav per recording). Configured from the same YAML schema as the
reference (conf/config_1ch.yaml / config_7ch.yaml).
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict

import numpy as np

from css_tpu.data.corpus import write_wav
from css_tpu.executor.beamformer import Beamformer
from css_tpu.executor.separator import Separator
from css_tpu.executor.stitcher import Stitcher
from css_tpu.executor.windowing import pad_for_windows


class CssPipeline:
    def __init__(self, model, variables, config: Dict, sr: int = 16000):
        """config follows the reference YAML schema:
        {separation: {...}, stitching: {...}, beamforming: {...}}
        (conf/config_1ch.yaml:5-27)."""
        sep = config.get("separation", {})
        sti = config.get("stitching", {})
        bf = config.get("beamforming", {})
        self.sr = int(config.get("sampling_rate", sr))
        num_spk = int(sep.get("num_spk",
                              getattr(model, "num_spk", 2) or 2))
        self.num_spk = num_spk
        # sharded: true -> run forward+stitch for ALL windows as one jit
        # program over the local device mesh (css_tpu.executor.sharded);
        # windows of one recording are split across chips
        self.sharded = None
        if sep.get("sharded") and model is not None:
            import jax

            from css_tpu.executor.sharded import ShardedSeparation
            from css_tpu.parallel import make_mesh

            self.sharded = ShardedSeparation(
                model, variables, make_mesh(), sr=self.sr,
                eval_win=float(sep.get("eval_win", 2.4)),
                eval_hop=float(sep.get("eval_hop", 0.8)),
                frame_len=int(sep.get("frame_length", 512)),
                frame_hop=int(sep.get("frame_shift", 256)),
                ipd_index=sep.get("ipd"),
                wta_floor=float(bf.get("wta_thresh", 1e-4)),
                num_spk=num_spk,
            )
        self.separator = Separator(
            model, variables, sr=self.sr,
            eval_win=float(sep.get("eval_win", 2.4)),
            eval_hop=float(sep.get("eval_hop", 0.8)),
            frame_len=int(sep.get("frame_length", 512)),
            frame_hop=int(sep.get("frame_shift", 256)),
            batch_size=int(sep.get("batch_size", 32)),
            ipd_index=sep.get("ipd"),
            merge=bool(sep.get("merge", False)),
            merge_threshold=float(sep.get("merge_threshold", 16.0)),
            num_spk=num_spk,
        )
        self.stitcher = Stitcher(
            eval_win=float(sti.get("eval_win", sep.get("eval_win", 2.4))),
            eval_hop=float(sti.get("eval_hop", sep.get("eval_hop", 0.8))),
            fft_hop=int(sti.get("hop_size", sep.get("frame_shift", 256))),
            sr=self.sr,
            wta_floor=float(bf.get("wta_thresh", 1e-4)),
            num_spk=num_spk,
        )
        # session-level stream-identity re-anchoring (speaker tracking):
        # repairs stitcher identity flips at no-evidence boundaries using
        # long-horizon timbre profiles (executor/reanchor.py)
        self.reanchor = bool(sti.get("reanchor", False))
        # (a boundary-offset mask ensemble — rerun separate+stitch over
        # shifted window grids and average the aligned timelines — lived
        # here through round 5; the flagship-scale 8-session A/B measured
        # it NEGATIVE on both protocols (matched +2.11 vs +2.48, ladder
        # +2.07 vs +2.66 at offsets=3 vs 1, exp/ensemble_ab.log) and it
        # was deleted per the settle rule. docs/ROADMAP.md "Stitcher
        # boundary quality" records the full lineage of failed fixes.)
        self.frame_hop = int(sep.get("frame_shift", 256))
        self.beamformer = Beamformer(
            bf_type=bf.get("type", "souden_mvdr"),
            sr=self.sr,
            n_fft=int(bf.get("n_fft", 512)),
            hop_length=int(bf.get("hop_size", 256)),
            eval_win=float(bf.get("eval_win", 2.4)),
            eval_hop=float(bf.get("eval_hop", 0.8)),
            proceed_margin=float(bf.get("proceed_margin", 2.0)),
        )

    def process(self, wav: np.ndarray):
        """wav (T,) or (C, T) -> tuple of num_spk separated streams."""
        wav = np.asarray(wav, np.float32)
        total = wav.shape[-1]
        win, hop = self.separator.win, self.separator.hop
        wav = pad_for_windows(wav, win, hop)
        if self.sharded is not None:
            stitched, masks, mags = self.sharded.separate(wav)
            stitched = [np.asarray(m) for m in stitched]
        else:
            masks, mags = self.separator.separate(wav)
            stitched = [np.asarray(m) for m in self.stitcher(masks, mags)]
        outs = self.beamformer.continuous_process(wav, stitched)
        outs = tuple(o[:total] for o in outs)
        if self.reanchor:
            from css_tpu.executor.reanchor import reanchor_streams

            outs, _ = reanchor_streams(list(outs), sr=self.sr)
            outs = tuple(outs)
        return outs

    def process_recording(self, key: str, wav: np.ndarray, out_dir: str):
        """Separate one recording and write {key}_{i}.wav per stream
        (separate_libricss.py:81-82 writes _0/_1 for 2 speakers)."""
        outs = self.process(wav)
        out_dir = Path(out_dir)
        out_dir.mkdir(parents=True, exist_ok=True)
        for i, out in enumerate(outs):
            write_wav(out_dir / f"{key}_{i}.wav", out, self.sr)
        return outs


def write_streams(key: str, streams: np.ndarray, out_dir, sr: int,
                  peak: float = 0.9):
    """Write {key}_{i}.wav per stream, peak-normalized to `peak`.

    The streaming pipelines cannot normalize incrementally (a causal
    system never knows the global peak), so their CLI surface normalizes
    at write time — same naming and peak target as the offline path
    (beamformer output normalization)."""
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    for i, o in enumerate(np.asarray(streams)):
        write_wav(out_dir / f"{key}_{i}.wav",
                  o * peak / max(np.abs(o).max(), 1e-12), sr)
