"""Fused Pallas LSTM recurrence == scan LSTM (interpret mode on CPU)."""

import numpy as np

import jax
import jax.numpy as jnp

from css_tpu.models.blstm import lstm_scan
from css_tpu.ops.lstm_pallas import lstm_fused, supported


def make(b=8, t=12, h=128, dtype=jnp.float32, seed=0):
    rng = np.random.default_rng(seed)
    xw = jnp.asarray(rng.standard_normal((b, t, 4 * h)).astype(np.float32),
                     dtype)
    w_hh = jnp.asarray(
        (rng.standard_normal((h, 4 * h)) * 0.1).astype(np.float32), dtype)
    return xw, w_hh


def test_forward_matches_scan():
    xw, w_hh = make()
    ref = lstm_scan(xw, w_hh, 128)
    got = lstm_fused(xw, w_hh, 128, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_reverse_matches_scan():
    xw, w_hh = make(seed=1)
    ref = lstm_scan(xw, w_hh, 128, reverse=True)
    got = lstm_fused(xw, w_hh, 128, reverse=True, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_bf16_matches_scan():
    xw, w_hh = make(b=16, dtype=jnp.bfloat16, seed=2)
    ref = lstm_scan(xw, w_hh, 128)
    got = lstm_fused(xw, w_hh, 128, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        rtol=2e-2, atol=2e-2)


def test_supported_gating():
    assert supported(32, 512, jnp.float32)
    assert not supported(32, 100, jnp.float32)  # lanes misaligned
    assert not supported(5, 512, jnp.float32)  # partial sublane tile
    assert not supported(8, 512, jnp.bfloat16)  # bf16 needs 16 sublanes
    assert supported(16, 512, jnp.bfloat16)


def test_scan_dispatch_unchanged_on_cpu():
    # on the CPU backend use_pallas must fall through to the scan
    xw, w_hh = make(seed=3)
    a = lstm_scan(xw, w_hh, 128, use_pallas=True)
    b = lstm_scan(xw, w_hh, 128, use_pallas=False)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
