"""Chunked separator: long recording -> per-window TF masks.

TPU-native counterpart of css/executor/separator.py:9-111. Differences:

  * one jitted forward serves any batch of windows — the reference is
    pinned to ONNX batch size 1 (separator.py:22-24); here all windows of
    a batch run as one XLA program with static shapes (the last partial
    batch is padded and sliced);
  * masks come from the SAME model/params used in training — no exported
    inference graph;
  * the optional 7ch DOA-based mask merge (separator.py:106-110) runs
    on-device too (css_tpu.executor.doa).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from css_tpu.executor.windowing import unfold
from css_tpu.ops.features import FeatureExtractor


class Separator:
    def __init__(
        self,
        model,
        variables,
        *,
        exported_path: Optional[str] = None,
        sr: int = 16000,
        eval_win: float = 2.4,
        eval_hop: float = 0.8,
        frame_len: int = 512,
        frame_hop: int = 256,
        batch_size: int = 32,
        ipd_index: Optional[str] = None,
        merge: bool = False,
        merge_threshold: float = 16.0,
        extra_samples: int = 256,
        num_spk: int = 2,
    ):
        if merge and num_spk != 2:
            # angle_merge binarizes and compares exactly two speaker DOAs
            # (separator.py:165-200); with K>2 it would silently route the
            # extra speakers as noise streams
            raise ValueError(
                f"merge=true requires num_spk==2 (got {num_spk}); disable "
                "the DOA merge for K-speaker separation")
        self.model = model
        # checkpoints hold numpy leaves; jitted code needs jax arrays
        # (numpy params break traced indexing, e.g. the rel-pos gather)
        self.variables = (jax.tree.map(jnp.asarray, variables)
                          if variables is not None else None)
        self._exported_call = None
        if exported_path is not None:
            # serve a StableHLO artifact (cli.export) instead of a live
            # model — the TPU-native analogue of the reference's ONNX
            # deployment (separator.py:26-29)
            from css_tpu.cli.export import load_exported

            self._exported_call = load_exported(exported_path)
        self.sr = sr
        # +extra samples so the mask frame count matches the beamformer's
        # mask windows (separator.py:67 unfolds eval_win*sr + 256)
        self.win = int(eval_win * sr) + extra_samples
        self.hop = int(eval_hop * sr)
        self.batch_size = batch_size
        self.features = FeatureExtractor(frame_len, frame_hop,
                                         ipd_index=ipd_index)
        self.merge = merge
        self.merge_threshold = merge_threshold
        if merge:
            from css_tpu.executor.doa import SteeringVectors

            self.steering = SteeringVectors(
                nfreqs=self.features.num_bins, sr=sr)
        self._forward = jax.jit(self._forward_impl)

    def _forward_impl(self, wav_batch):
        """wav_batch: (B, T) or (B, C, T) -> (masks (B,T',F,S), mag (B,T',F))."""
        mag, f, spec = self.features(wav_batch)
        if self._exported_call is not None:
            masks = self._exported_call(f)  # already clamped at export
        else:
            out = self.model.apply(self.variables, f, train=False)
            masks = out[1] if isinstance(out, tuple) else out
            masks = jnp.minimum(masks, 1.0)  # clamp at 1.0 (separator.py:104)
        if self.merge:
            merged = self.steering.angle_merge(
                spec, masks[..., :2], thresh=self.merge_threshold)
            masks = jnp.concatenate([merged, masks[..., 2:]], axis=-1)
        return masks, mag

    def separate(self, wav: np.ndarray):
        """wav: (T,) or (C, T) full recording.

        Returns (masks (B, T', F, S), mags (B, T', F)) as numpy, one row per
        sliding window.
        """
        windows = unfold(np.asarray(wav, np.float32), self.win, self.hop)
        n = windows.shape[0]
        bs = self.batch_size
        outs_m, outs_g = [], []
        for i in range(0, n, bs):
            chunk = windows[i : i + bs]
            pad = bs - chunk.shape[0]
            if pad:
                chunk = np.concatenate(
                    [chunk, np.zeros((pad, *chunk.shape[1:]), chunk.dtype)])
            masks, mag = self._forward(jnp.asarray(chunk))
            outs_m.append(np.asarray(masks[: bs - pad if pad else bs]))
            outs_g.append(np.asarray(mag[: bs - pad if pad else bs]))
        return np.concatenate(outs_m), np.concatenate(outs_g)
