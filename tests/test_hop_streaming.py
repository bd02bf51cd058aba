"""Causal BLSTM + hop-granular streaming executor.

Contracts pinned here:
  * cumulative_mvn: frame t == plain mvn over the prefix [0..t]; chunked
    carry chaining == one full call;
  * BLSTM(causal=True).stream chunk chaining == the full-utterance causal
    __call__ (same masks);
  * HopStreamingPipeline: push-size invariance, output length == input
    length, and equality with a direct full-signal masked resynthesis of
    the same causal masks (the executor adds nothing but carried OLA).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from css_tpu.executor.hop_streaming import HopStreamingPipeline
from css_tpu.models.blstm import BLSTM
from css_tpu.ops.features import cumulative_mvn, mvn

CFG = {
    "sampling_rate": 16000,
    "separation": {"frame_length": 512, "frame_shift": 256, "num_spk": 2},
    "beamforming": {"wta_thresh": 1e-4},
}


def _causal_model(**kw):
    return BLSTM(idim=257, num_bins=257, hidden_dim=32, num_layers=2,
                 dropout_rate=0.0, causal=True, **kw)


def _init(model, t=20):
    return model.init({"params": jax.random.PRNGKey(0)},
                      jnp.zeros((1, t, 257)), train=False)


def test_cumulative_mvn_prefix_parity():
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 12, 5)),
                    jnp.float32)
    out, _ = cumulative_mvn(x)
    for t in range(1, 12):
        ref = mvn(x[:, : t + 1], axis=-2)[:, -1]
        np.testing.assert_allclose(np.asarray(out[:, t]), np.asarray(ref),
                                   rtol=2e-4, atol=2e-5)


def test_cumulative_mvn_carry_chaining():
    x = jnp.asarray(np.random.default_rng(1).standard_normal((1, 17, 7)),
                    jnp.float32)
    full, _ = cumulative_mvn(x)
    carry = None
    parts = []
    for lo, hi in ((0, 5), (5, 6), (6, 17)):
        p, carry = cumulative_mvn(x[:, lo:hi], carry)
        parts.append(p)
    np.testing.assert_allclose(np.asarray(jnp.concatenate(parts, axis=1)),
                               np.asarray(full), rtol=2e-4, atol=2e-5)


@pytest.mark.slow
def test_causal_stream_matches_full_forward():
    model = _causal_model()
    variables = _init(model)
    x = jnp.asarray(np.random.default_rng(2).standard_normal((1, 23, 257))
                    .astype(np.float32) ** 2)
    _, masks_full = model.apply(variables, x, train=False)
    carry = model.stream_init(1)
    outs = []
    for lo, hi in ((0, 8), (8, 9), (9, 23)):
        m, carry = model.apply(variables, x[:, lo:hi], carry,
                               method="stream")
        outs.append(m)
    masks_stream = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(masks_stream),
                               np.asarray(masks_full),
                               rtol=2e-4, atol=2e-5)


def test_hop_streaming_push_size_invariance():
    model = _causal_model()
    variables = _init(model)
    wav = (np.random.default_rng(3).standard_normal(16000 * 2)
           .astype(np.float32) * 0.1)

    def run(push_sizes):
        pipe = HopStreamingPipeline(model, variables, CFG, chunk_frames=4)
        outs, pos = [], 0
        for n in push_sizes:
            outs.append(pipe.push(wav[pos : pos + n]))
            pos += n
        outs.append(pipe.push(wav[pos:]))
        outs.append(pipe.flush())
        return np.concatenate(outs, axis=-1)

    a = run([len(wav)])
    b = run([700, 3000, 11, 8000, 5000])
    assert a.shape == (2, len(wav))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_hop_streaming_matches_one_shot_overlap_add():
    """The executor's carried-OLA/envelope/emission bookkeeping == a
    single global overlap-add of the SAME chunk-computed synthesis frames
    (the device programs are replayed with identical chunk boundaries, so
    the frames are bit-identical; only the incremental assembly differs).

    Full-model mask parity is covered separately
    (test_causal_stream_matches_full_forward compares masks pre-WTA with
    tolerance: winner-take-all flips on float near-ties between
    differently-fused programs, so waveform-level comparison against an
    independent full-utterance program is not well-posed)."""
    from css_tpu.ops.stft import hann_window, overlap_add

    model = _causal_model()
    variables = _init(model)
    sr = 16000
    wav = (np.random.default_rng(4).standard_normal(sr * 2)
           .astype(np.float32) * 0.1)

    pipe = HopStreamingPipeline(model, variables, CFG, chunk_frames=8)
    out = np.concatenate([pipe.push(wav), pipe.flush()], axis=-1)
    assert out.shape == (2, len(wav))

    # replay the exact chunk sequence on a fresh pipeline's device
    # programs: 8-frame chunks while (chunk-1)*hop+frame_len samples
    # remain, then 1-frame flush chunks
    pipe2 = HopStreamingPipeline(model, variables, CFG, chunk_frames=8)
    carry = model.stream_init(1)
    raw = wav.copy()
    frames_out = []
    while raw.shape[0] >= 7 * 256 + 512:
        idx = np.arange(8)[:, None] * 256 + np.arange(512)[None, :]
        o, carry = pipe2._step_fn(8)(variables, jnp.asarray(raw[idx]), carry)
        frames_out.append(np.asarray(o))
        raw = raw[8 * 256 :]
    while raw.shape[0] >= 512:
        o, carry = pipe2._step_fn(1)(variables,
                                     jnp.asarray(raw[None, :512]), carry)
        frames_out.append(np.asarray(o))
        raw = raw[256:]
    frames = np.concatenate(frames_out, axis=1)  # (K, T, 512)

    sig = np.asarray(overlap_add(jnp.asarray(frames), 256))
    t = frames.shape[1]
    env = np.asarray(overlap_add(
        jnp.broadcast_to(jnp.asarray(hann_window(512)) ** 2, (t, 512)), 256))
    ref = np.where(env >= 1e-2, sig / np.maximum(env, 1e-2), 0.0)
    n = ref.shape[-1]
    np.testing.assert_allclose(out[:, :n], ref, rtol=1e-4, atol=1e-6)
    # the never-synthesized ragged tail is zero-padded
    assert np.allclose(out[:, n:], 0.0)


def test_hop_streaming_rejects_non_causal():
    model = BLSTM(idim=257, num_bins=257, hidden_dim=32, num_layers=1,
                  dropout_rate=0.0)
    variables = _init(model)
    with pytest.raises(ValueError, match="causal"):
        HopStreamingPipeline(model, variables, CFG)


def test_causal_model_trains():
    """--blstm-causal end-to-end: conf -> build_model -> one train step."""
    from css_tpu.objectives.mse import MeanSquaredError
    from css_tpu.trainer import LRSchedule, Trainer

    model = BLSTM.build_model(
        {"blstm_hdim": 32, "blstm_num_layers": 1, "blstm_causal": True,
         "blstm_dropout_rate": 0.1})
    assert model.causal
    trainer = Trainer(model, MeanSquaredError(),
                      LRSchedule(lr=1e-3, warmup=2), optim="adam")
    host = np.random.default_rng(5)
    batch = {k: host.standard_normal((2, 32000)).astype(np.float32) * 0.1
             for k in ("mix", "source1", "source2")}
    rng = jax.random.PRNGKey(0)
    state = trainer.init_state(rng, batch)
    state, metrics = trainer._train_step(state, batch, rng)
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 1


# ---------------------------------------------------------------- Conformer
def _causal_conformer(**kw):
    from css_tpu.models.conformer import Conformer

    return Conformer(idim=257, num_bins=257, attention_dim=32,
                     attention_heads=2, linear_units=64, num_blocks=2,
                     kernel_size=9, dropout_rate=0.0, causal=True,
                     left_context=16, **kw)


@pytest.mark.slow
def test_causal_conformer_stream_matches_full_forward():
    """Chunked stream (KV cache + conv tail + running MVN) == the full
    causal forward, including chunks larger than the left context."""
    model = _causal_conformer()
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, 20, 257)), train=False)
    x = jnp.asarray(np.random.default_rng(6).standard_normal((1, 45, 257))
                    .astype(np.float32) ** 2)
    _, masks_full = model.apply(variables, x, train=False)
    carry = model.stream_init(1)
    outs = []
    for lo, hi in ((0, 7), (7, 8), (8, 25), (25, 45)):
        m, carry = model.apply(variables, x[:, lo:hi], carry,
                               method="stream")
        outs.append(m)
    masks_stream = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(masks_stream),
                               np.asarray(masks_full),
                               rtol=2e-4, atol=2e-5)


def test_causal_conformer_hop_pipeline():
    """HopStreamingPipeline is model-agnostic: causal Conformer end-to-end
    with push-size invariance."""
    model = _causal_conformer()
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, 20, 257)), train=False)
    wav = (np.random.default_rng(7).standard_normal(16000)
           .astype(np.float32) * 0.1)

    def run(push_sizes):
        pipe = HopStreamingPipeline(model, variables, CFG, chunk_frames=4)
        outs, pos = [], 0
        for n in push_sizes:
            outs.append(pipe.push(wav[pos : pos + n]))
            pos += n
        outs.append(pipe.push(wav[pos:]))
        outs.append(pipe.flush())
        return np.concatenate(outs, axis=-1)

    a = run([len(wav)])
    b = run([500, 2500, 13000])
    assert a.shape == (2, len(wav))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_causal_conformer_trains():
    """--conformer-causal: banded attention + causal conv through one
    train step (conf -> build_model -> Trainer)."""
    from css_tpu.models.conformer import Conformer
    from css_tpu.objectives.mse import MeanSquaredError
    from css_tpu.trainer import LRSchedule, Trainer

    model = Conformer.build_model(
        {"conformer_attention_dim": 32, "conformer_attention_heads": 2,
         "conformer_linear_units": 64, "conformer_num_blocks": 2,
         "conformer_kernel_size": 9, "conformer_causal": True,
         "conformer_left_context": 16})
    assert model.causal and model.left_context == 16
    trainer = Trainer(model, MeanSquaredError(),
                      LRSchedule(lr=1e-3, warmup=2), optim="adam")
    host = np.random.default_rng(8)
    batch = {k: host.standard_normal((2, 32000)).astype(np.float32) * 0.1
             for k in ("mix", "source1", "source2")}
    rng = jax.random.PRNGKey(0)
    state = trainer.init_state(rng, batch)
    state, metrics = trainer._train_step(state, batch, rng)
    assert np.isfinite(float(metrics["loss"]))


@pytest.mark.slow
def test_causal_conformer_stream_kernel_size_one():
    """kernel_size=1 carries zero conv context: the carried tail must stay
    empty instead of accumulating the whole history (regression: [-0:]
    slicing returned the full array and crashed on the second chunk)."""
    from css_tpu.models.conformer import Conformer

    model = Conformer(idim=257, num_bins=257, attention_dim=32,
                      attention_heads=2, linear_units=64, num_blocks=1,
                      kernel_size=1, dropout_rate=0.0, causal=True,
                      left_context=8)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, 12, 257)), train=False)
    x = jnp.asarray(np.random.default_rng(8).standard_normal((1, 24, 257))
                    .astype(np.float32) ** 2)
    _, masks_full = model.apply(variables, x, train=False)
    carry = model.stream_init(1)
    outs = []
    for lo, hi in ((0, 6), (6, 12), (12, 24)):
        m, carry = model.apply(variables, x[:, lo:hi], carry,
                               method="stream")
        assert m.shape[1] == hi - lo
        outs.append(m)
    np.testing.assert_allclose(np.asarray(jnp.concatenate(outs, axis=1)),
                               np.asarray(masks_full), rtol=2e-4, atol=2e-5)
