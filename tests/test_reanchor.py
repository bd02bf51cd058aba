"""Stream-identity re-anchoring (executor/reanchor.py)."""

import numpy as np

from css_tpu.executor.reanchor import reanchor_streams


SR = 16000


def _voice(rng, n, center_hz, width_hz=300.0):
    """Band-limited noise 'speaker' with a distinctive spectral centroid."""
    white = rng.standard_normal(n + SR).astype(np.float32)
    spec = np.fft.rfft(white)
    freqs = np.fft.rfftfreq(len(white), 1.0 / SR)
    spec *= np.exp(-0.5 * ((freqs - center_hz) / width_hz) ** 2)
    out = np.fft.irfft(spec)[:n].astype(np.float32)
    return out / (np.abs(out).max() + 1e-9) * 0.5


def _session_with_flip(flip=True):
    """Two streams, alternating speech with a joint-silence gap; the
    stream identities swap at the second gap when `flip`."""
    rng = np.random.default_rng(0)
    seg = 3 * SR
    gap = SR  # 1 s of joint silence between segments
    n_seg = 6
    total = n_seg * (seg + gap)
    a = np.zeros(total, np.float32)
    b = np.zeros(total, np.float32)
    for i in range(n_seg):
        s = i * (seg + gap)
        # both speakers talk in every block (profiles defined for both)
        a[s : s + seg] = _voice(rng, seg, 500.0)
        b[s : s + seg] = _voice(rng, seg, 2500.0)
    clean = (a.copy(), b.copy())
    if flip:
        cut = 2 * (seg + gap) - gap // 2  # inside the second gap
        a2, b2 = a.copy(), b.copy()
        a2[cut:], b2[cut:] = b[cut:], a[cut:]
        return (a2, b2), clean
    return (a.copy(), b.copy()), clean


def test_repairs_single_flip():
    (s0, s1), (c0, c1) = _session_with_flip(flip=True)
    fixed, n_swaps = reanchor_streams([s0, s1], sr=SR)
    assert n_swaps == 1
    assert np.allclose(fixed[0], c0, atol=1e-6)
    assert np.allclose(fixed[1], c1, atol=1e-6)


def test_no_flip_is_identity():
    (s0, s1), _ = _session_with_flip(flip=False)
    fixed, n_swaps = reanchor_streams([s0, s1], sr=SR)
    assert n_swaps == 0
    assert np.array_equal(fixed[0], s0)
    assert np.array_equal(fixed[1], s1)


def test_confidence_gate_on_identical_voices():
    """Indistinguishable streams must pass through unchanged (the margin
    between the best and runner-up permutation is ~0)."""
    rng = np.random.default_rng(1)
    seg, gap = 2 * SR, SR
    n = 4 * (seg + gap)
    a = np.zeros(n, np.float32)
    b = np.zeros(n, np.float32)
    for i in range(4):
        s = i * (seg + gap)
        a[s : s + seg] = _voice(rng, seg, 1200.0)
        b[s : s + seg] = _voice(rng, seg, 1200.0)
    fixed, n_swaps = reanchor_streams([a, b], sr=SR)
    assert n_swaps == 0


def test_double_flip_restored():
    """Flip at gap 2 and flip back at gap 4 -> two repairs."""
    rng = np.random.default_rng(2)
    seg, gap = 3 * SR, SR
    n_seg = 6
    total = n_seg * (seg + gap)
    a = np.zeros(total, np.float32)
    b = np.zeros(total, np.float32)
    for i in range(n_seg):
        s = i * (seg + gap)
        a[s : s + seg] = _voice(rng, seg, 500.0)
        b[s : s + seg] = _voice(rng, seg, 2500.0)
    clean = (a.copy(), b.copy())
    c1 = 2 * (seg + gap) - gap // 2
    c2 = 4 * (seg + gap) - gap // 2
    a2, b2 = a.copy(), b.copy()
    a2[c1:c2], b2[c1:c2] = b[c1:c2], a[c1:c2]
    fixed, n_swaps = reanchor_streams([a2, b2], sr=SR)
    assert n_swaps == 2
    assert np.allclose(fixed[0], clean[0], atol=1e-6)
    assert np.allclose(fixed[1], clean[1], atol=1e-6)


def test_three_stream_rotation():
    """K=3: a cyclic rotation of all three streams is repaired."""
    rng = np.random.default_rng(3)
    seg, gap = 3 * SR, SR
    n_seg = 4
    total = n_seg * (seg + gap)
    voices = [500.0, 1500.0, 3200.0]
    clean = [np.zeros(total, np.float32) for _ in range(3)]
    for i in range(n_seg):
        s = i * (seg + gap)
        for k in range(3):
            clean[k][s : s + seg] = _voice(rng, seg, voices[k])
    cut = 2 * (seg + gap) - gap // 2
    rot = [c.copy() for c in clean]
    rot[0][cut:], rot[1][cut:], rot[2][cut:] = (
        clean[1][cut:].copy(), clean[2][cut:].copy(), clean[0][cut:].copy())
    fixed, n_swaps = reanchor_streams(rot, sr=SR)
    assert n_swaps == 1
    for k in range(3):
        assert np.allclose(fixed[k], clean[k], atol=1e-6)
