"""Online (causal) stream-identity re-anchoring in the streaming executor."""

import numpy as np

from css_tpu.executor.streaming import StreamingCssPipeline
from css_tpu.ops.pit import permutations_array

from tests.test_streaming import make_config, make_mix, make_model


def _tracker(k=2, block_frames=100, conf=0.04):
    """A bare pipeline object with only the re-anchoring state, so the
    tracking logic is testable without a model."""
    p = StreamingCssPipeline.__new__(StreamingCssPipeline)
    p.num_spk = k
    p.sr = 16000
    p.hop_frames = 50
    p._n_sep = 0
    p.perm_table = np.asarray(permutations_array(k))
    p.reanchor = True
    p._ra_block_frames = block_frames
    p._ra_conf = conf
    p._ra_anchors = None
    p._ra_aw = np.zeros(k)
    p._ra_sum = None
    p._ra_cnt = np.zeros(k)
    p._ra_ref = 0.0
    p._ra_next_block = block_frames
    p._ra_min_active = 4
    p._assign = np.arange(k)
    return p


def _window(centers, t=50, f=257, amp=1.0):
    """(T, F, K) routed masks + (T, F) mag whose per-stream masked
    magnitude has a Gaussian spectral bump at centers[k]."""
    freqs = np.arange(f, dtype=np.float32)
    mag = np.full((t, f), amp, np.float32)
    masks = np.stack(
        [np.exp(-0.5 * ((freqs - c) / 12.0) ** 2) for c in centers],
        axis=-1)[None].repeat(t, axis=0).astype(np.float32)
    return masks, mag


def test_online_tracker_corrects_flip():
    p = _tracker()
    masks, mag = _window([60.0, 180.0])
    for _ in range(2):  # block 1: establishes the anchors
        p._reanchor_accumulate(masks, mag)
        p._n_sep += 1
    assert tuple(p._assign) == (0, 1)
    flipped, _ = _window([180.0, 60.0])
    for _ in range(2):  # block 2 arrives flipped -> corrected
        p._reanchor_accumulate(flipped[..., p._assign], mag)
        p._n_sep += 1
    assert tuple(p._assign) == (1, 0)
    for _ in range(2):  # block 3 still flipped at input: with the
        p._reanchor_accumulate(flipped[..., p._assign], mag)
        p._n_sep += 1
    assert tuple(p._assign) == (1, 0)  # corrected routing, no more swaps


def test_online_tracker_gate_holds_on_similar_streams():
    p = _tracker()
    masks, mag = _window([120.0, 124.0])  # nearly identical profiles
    for _ in range(6):
        p._reanchor_accumulate(masks, mag)
        p._n_sep += 1
    assert tuple(p._assign) == (0, 1)


def test_streaming_reanchor_no_harm_on_clean_session():
    """With no flips, reanchor-on output equals reanchor-off output."""
    model, variables = make_model()
    mix = make_mix()
    outs = {}
    for flag in (False, True):
        config = make_config()
        config["stitching"]["reanchor"] = flag
        config["stitching"]["reanchor_block_sec"] = 2.0
        stream = StreamingCssPipeline(model, variables, config)
        chunks = [stream.push(mix[i : i + 4000])
                  for i in range(0, len(mix), 4000)]
        chunks.append(stream.flush())
        outs[flag] = np.concatenate(chunks, axis=-1)
    np.testing.assert_array_equal(outs[False], outs[True])
