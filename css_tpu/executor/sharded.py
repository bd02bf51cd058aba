"""Chunk-sharded continuous inference: one recording across many chips.

The CSS algorithm bounds attention cost by processing a long recording as
overlapping windows (SURVEY.md §5 long-context row). Here the WINDOW axis
of a single recording is sharded over the device mesh: every chip runs the
mask model on its shard of windows, and the stitcher's cross-window terms
(the 100-frame boundary-margin energies and the flip-state prefix-XOR,
css/executor/stitcher.py:22-60) are expressed as global-array ops so XLA
lowers the shard-boundary halo exchange to collective-permutes over ICI —
the TPU-native "sequence scaling" the reference lacked (its recordings
were processed serially per GPU, run.sh:20-35).

The whole forward+stitch is ONE jit program; masks come back stitched.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from css_tpu.executor.stitcher import Stitcher
from css_tpu.executor.windowing import unfold
from css_tpu.ops.features import FeatureExtractor


class ShardedSeparation:
    """Window-sharded forward + stitch for one long recording."""

    def __init__(self, model, variables, mesh: Mesh,
                 sr: int = 16000, eval_win: float = 2.4, eval_hop: float = 0.8,
                 frame_len: int = 512, frame_hop: int = 256,
                 ipd_index: Optional[str] = None,
                 wta_floor: float = 1e-4, extra_samples: int = 256,
                 num_spk: int = 2):
        self.model = model
        self.variables = jax.tree.map(jnp.asarray, variables)
        self.mesh = mesh
        self.sr = sr
        self.win = int(eval_win * sr) + extra_samples
        self.hop = int(eval_hop * sr)
        self.features = FeatureExtractor(frame_len, frame_hop,
                                         ipd_index=ipd_index)
        self.stitcher = Stitcher(eval_win, eval_hop, frame_hop, sr, wta_floor,
                                 num_spk=num_spk)
        self.n_shards = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
        self._run = jax.jit(self._run_impl)

    def _run_impl(self, windows, valid):
        """windows: (B, T) or (B, C, T) sharded on axis 0; valid: (B,) bool."""
        mag, f, spec = self.features(windows)
        out = self.model.apply(self.variables, f, train=False)
        masks = out[1] if isinstance(out, tuple) else out
        masks = jnp.minimum(masks, 1.0)
        # padded windows must not influence stitching: zero their energy
        v = valid[:, None, None]
        mag = mag * v
        masks = masks * v[..., None]
        flips = self.stitcher.get_stitch(masks, mag)
        return self.stitcher.get_connect(flips, masks, valid), masks, mag

    def separate(self, wav: np.ndarray):
        """wav (T,) or (C, T) -> (res1, res2, noise) stitched (T', F) masks
        plus per-window (masks, mags)."""
        windows = unfold(np.asarray(wav, np.float32), self.win, self.hop)
        b = windows.shape[0]
        pad = (-b) % self.n_shards
        valid = np.ones(b + pad, bool)
        if pad:
            windows = np.concatenate(
                [windows, np.zeros((pad, *windows.shape[1:]), windows.dtype)])
            valid[b:] = False
        shard = NamedSharding(
            self.mesh, P(self.mesh.axis_names))  # windows over all axes
        windows_d = jax.device_put(jnp.asarray(windows), shard)
        valid_d = jax.device_put(jnp.asarray(valid), shard)
        (res, masks, mags) = self._run(windows_d, valid_d)
        res = [np.asarray(r) for r in res]
        if pad:
            # drop the trailing padded windows' frames from the stitched
            # timeline (they contributed zeros beyond the real extent)
            total_frames = (b - 1) * self.stitcher.hop_frames + masks.shape[1]
            res = [r[:total_frames] for r in res]
            masks = masks[:b]
            mags = mags[:b]
        return tuple(res), np.asarray(masks), np.asarray(mags)
