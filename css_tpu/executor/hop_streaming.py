"""Hop-granular (frame-level) streaming separation with a causal model.

The window-granular ``StreamingCssPipeline`` (executor/streaming.py) has
the CSS algorithm's inherent ~4.5 s latency: masks only become final after
the stitch lookahead and the proceed-margin partition. A CAUSAL model
(``BLSTM(causal=True)``: unidirectional LSTM + cumulative MVN) removes
both stages — the carried recurrent state keeps speaker-stream identity
continuous across the whole recording, so there is no per-window
permutation ambiguity and therefore NO STITCHER, and each STFT frame's
masks are final the moment the frame is computed. What remains is:

  frame -> rDFT -> masks (carried (h, c) + running-MVN state) ->
  winner-take-all -> masked spectrum -> windowed synthesis ->
  overlap-add (carried OLA/envelope tails) -> emit final samples

Algorithmic latency = one analysis frame + the OLA overlap:
``frame_len + (frame_len - hop)`` samples (48 ms at 512/256 @ 16 kHz),
plus the chosen dispatch granularity (``chunk_frames`` frames are
processed per device program; 8 frames = 128 ms batching delay). The
reference has no streaming or causal inference path at all (its executor
requires the full recording, css/executor/separator.py:63-67; its models
only declare causal flags, conformer.py:296-297).

Chunk-size invariance is exact by construction — chained ``stream`` calls
reproduce the full-utterance causal forward (tests/test_hop_streaming.py)
— so push granularity is purely a latency/throughput knob.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from css_tpu.ops.stft import (_istft_synthesis_kernel, hann_window,
                              stft_analysis_kernel)


class HopStreamingPipeline:
    """push(samples) -> (K, m) newly final audio; flush() -> the tail.

    ``model`` must be causal (``model.causal`` True) and expose
    ``stream(f, carry)`` / ``stream_init(batch)`` (BLSTM(causal=True)).
    Same YAML config schema as the offline pipeline; uses the separation
    section's frame_length/frame_shift and the beamforming section's
    wta_thresh.
    """

    def __init__(self, model, variables, config: dict, sr: int = 16000,
                 chunk_frames: int = 8):
        if not getattr(model, "causal", False):
            raise ValueError(
                "hop streaming needs a causal model (e.g. BLSTM built with "
                "--blstm-causal); window-granular streaming "
                "(StreamingCssPipeline) works with any model")
        sep = config.get("separation", {})
        bf = config.get("beamforming", {})
        self.sr = int(config.get("sampling_rate", sr))
        self.model = model
        self.variables = variables
        self.frame_len = int(sep.get("frame_length", 512))
        self.hop = int(sep.get("frame_shift", 256))
        self.num_spk = int(getattr(model, "num_spk", 2))
        self.wta_floor = float(bf.get("wta_thresh", 1e-4))
        self.chunk_frames = max(int(chunk_frames), 1)
        n_fft = 2 ** math.ceil(math.log2(self.frame_len))
        self._analysis = jnp.asarray(stft_analysis_kernel(self.frame_len))
        self._synthesis = jnp.asarray(
            _istft_synthesis_kernel(self.frame_len, n_fft))
        self._window = jnp.asarray(hann_window(self.frame_len))
        self._env_frame = np.asarray(hann_window(self.frame_len)) ** 2

        self._carry = model.stream_init(1)
        self._steps = {}  # n_frames -> jitted program

        ov = self.frame_len - self.hop
        self._raw = np.zeros(0, np.float32)  # unconsumed samples
        self._total = 0  # total samples pushed
        self._synth_done = 0  # samples synthesized (frames*hop + ov)
        self._ola = np.zeros((self.num_spk, ov), np.float32)  # carried tails
        self._env = np.zeros(ov, np.float32)
        self._emitted = 0
        self._flushed = False

    # ---------------------------------------------------------------- device
    def _step_fn(self, n_frames: int):
        """Jitted: (n, frame_len) raw frames + carry -> masked synthesis
        frames (K, n, frame_len) + carry. One program per chunk size
        (two in practice: chunk_frames and 1 for the flush tail)."""
        if n_frames in self._steps:
            return self._steps[n_frames]

        model = self.model
        k = self.num_spk
        floor = self.wta_floor

        @jax.jit
        def step(variables, frames, carry):
            spec = frames @ self._analysis  # (n, 2*bins) [re | im]
            bins = spec.shape[-1] // 2
            mag = jnp.sqrt(spec[:, :bins] ** 2 + spec[:, bins:] ** 2)
            masks, carry = model.apply(variables, mag[None], carry,
                                       method="stream")
            m = masks[0]  # (n, F, S) — S = num_spk + num_noise
            # winner-take-all across streams (stitcher.py:77-83 semantics,
            # per frame — final immediately, no cross-window averaging)
            m = jnp.where(m == m.max(axis=-1, keepdims=True), m, floor)
            spk = jnp.transpose(m[..., :k], (2, 0, 1))  # (K, n, F)
            ri = jnp.concatenate(
                [spk * spec[None, :, :bins], spk * spec[None, :, bins:]],
                axis=-1)  # (K, n, 2*bins)
            out = (ri @ self._synthesis) * self._window  # (K, n, frame_len)
            return out, carry

        self._steps[n_frames] = step
        return step

    # ------------------------------------------------------------------ host
    def _run_frames(self, frames: np.ndarray) -> np.ndarray:
        """Process (n, frame_len) frames; OLA with carried tails; return
        newly FINAL samples (K, n*hop) after envelope normalization."""
        n = frames.shape[0]
        out, self._carry = self._step_fn(n)(
            self.variables, jnp.asarray(frames), self._carry)
        out = np.asarray(out, np.float32)  # (K, n, frame_len)
        ov = self.frame_len - self.hop
        total = n * self.hop + ov
        sig = np.zeros((self.num_spk, total), np.float32)
        env = np.zeros(total, np.float32)
        sig[:, :ov] += self._ola
        env[:ov] += self._env
        for i in range(n):  # n is small (chunk_frames); numpy host OLA
            st = i * self.hop
            sig[:, st : st + self.frame_len] += out[:, i]
            env[st : st + self.frame_len] += self._env_frame
        self._ola = sig[:, n * self.hop :].copy()
        self._env = env[n * self.hop :].copy()
        final_sig = sig[:, : n * self.hop]
        final_env = env[: n * self.hop]
        # same partial-coverage guard as ops.stft.istft
        final = np.where(final_env >= 1e-2,
                         final_sig / np.maximum(final_env, 1e-2), 0.0)
        self._synth_done += n * self.hop
        return final.astype(np.float32)

    # ------------------------------------------------------------------- API
    def push(self, samples: np.ndarray) -> np.ndarray:
        """Feed (n,) mono samples; returns newly final (K, m) audio."""
        if self._flushed:
            raise RuntimeError("pipeline already flushed")
        samples = np.asarray(samples, np.float32).reshape(-1)
        self._raw = np.concatenate([self._raw, samples])
        self._total += samples.shape[-1]
        outs = []
        # a frame consumes `hop` samples and needs `frame_len` visible
        while self._raw.shape[0] >= (self.chunk_frames - 1) * self.hop + self.frame_len:
            n = self.chunk_frames
            idx = (np.arange(n)[:, None] * self.hop
                   + np.arange(self.frame_len)[None, :])
            outs.append(self._run_frames(self._raw[idx]))
            self._raw = self._raw[n * self.hop :]
        if outs:
            out = np.concatenate(outs, axis=-1)
            self._emitted += out.shape[-1]
            return out
        return np.zeros((self.num_spk, 0), np.float32)

    def flush(self) -> np.ndarray:
        """Process remaining full frames one at a time (a single extra
        1-frame program), then emit the OLA tail, zero-padded so the total
        output length equals the total input length."""
        if self._flushed:
            return np.zeros((self.num_spk, 0), np.float32)
        self._flushed = True
        outs = []
        while self._raw.shape[0] >= self.frame_len:
            outs.append(self._run_frames(self._raw[None, : self.frame_len]))
            self._raw = self._raw[self.hop :]
        # tail: already-synthesized-but-unemitted overlap region
        ov = self.frame_len - self.hop
        tail = np.where(self._env >= 1e-2,
                        self._ola / np.maximum(self._env, 1e-2), 0.0)
        outs.append(tail.astype(np.float32))
        out = np.concatenate(outs, axis=-1) if outs else np.zeros(
            (self.num_spk, 0), np.float32)
        # pad/trim so emitted total == pushed total (the last
        # sub-frame samples were never synthesized, like the offline
        # uncentered analysis which drops the ragged tail)
        remaining = self._total - self._emitted
        if out.shape[-1] < remaining:
            out = np.pad(out, [(0, 0), (0, remaining - out.shape[-1])])
        else:
            out = out[:, :remaining]
        self._emitted = self._total
        return out
