"""Pallas masked-iSTFT kernel vs the XLA istft (interpret mode)."""

import numpy as np

import jax.numpy as jnp

from css_tpu.ops import stft as stft_ops
from css_tpu.ops.istft_pallas import istft_pallas


def test_pallas_istft_matches_xla():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((3, 16000)).astype(np.float32) * 0.2
    spec = stft_ops.stft(jnp.asarray(x), 512, 256, center=False)
    ref = np.asarray(stft_ops.istft(spec, 512, 256, center=False))
    got = np.asarray(istft_pallas(spec, 512, 256, interpret=True))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-4)


def test_pallas_istft_masked_roundtrip():
    """mask * spec -> istft reconstructs the interior when mask == 1."""
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 38656)).astype(np.float32) * 0.1
    spec = stft_ops.stft(jnp.asarray(x), 512, 256, center=False)
    wav = np.asarray(istft_pallas(spec, 512, 256, interpret=True))
    n = wav.shape[-1]
    np.testing.assert_allclose(wav[:, 512:-512], x[:, 512 : n - 512],
                               atol=1e-4)
