"""Pallas STFT kernel vs the XLA reference (interpret mode on CPU)."""

import numpy as np

import jax.numpy as jnp

from css_tpu.ops import stft as stft_ops
from css_tpu.ops.stft_pallas import stft_mag_pallas


def test_pallas_stft_mag_matches_xla():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((3, 16000)).astype(np.float32) * 0.2
    ref = np.abs(np.asarray(stft_ops.stft(jnp.asarray(x), 512, 256)))
    got = np.asarray(stft_mag_pallas(jnp.asarray(x), 512, 256,
                                     interpret=True))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-4)


def test_pallas_stft_mag_row_tiles():
    """The batch-tile size must not change results (incl. padded batches)."""
    rng = np.random.default_rng(2)
    x = rng.standard_normal((12, 16000)).astype(np.float32) * 0.2
    ref = np.abs(np.asarray(stft_ops.stft(jnp.asarray(x), 512, 256)))
    for rows in (8, 16, 32):
        got = np.asarray(stft_mag_pallas(jnp.asarray(x), 512, 256,
                                         interpret=True, rows=rows))
        np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-4)


def test_pallas_stft_mag_window_shapes():
    rng = np.random.default_rng(1)
    for n in (32000, 38656, 64000):  # 2s, separator window, 4s
        x = rng.standard_normal((2, n)).astype(np.float32)
        ref = np.abs(np.asarray(stft_ops.stft(jnp.asarray(x), 512, 256)))
        got = np.asarray(stft_mag_pallas(jnp.asarray(x), 512, 256,
                                         interpret=True))
        np.testing.assert_allclose(got, ref, atol=3e-4, rtol=1e-4)
