"""STFT/iSTFT parity vs torch (torch.stft/istft and the reference's
conv1d-rDFT formulation, css/executor/feature.py:13-30) and round-trip."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from css_tpu.ops import stft as S


def _torch_conv_stft(x: np.ndarray, frame_len=512, hop=256):
    """Reference-style conv STFT (rfft-of-eye kernel, hann, no padding)."""
    n = 2 ** int(np.ceil(np.log2(frame_len)))
    eye = torch.eye(n)
    k = torch.view_as_real(torch.fft.rfft(eye, dim=1))[:frame_len]  # F x bins x 2
    w = torch.hann_window(frame_len)
    k = torch.transpose(k, 0, 2) * w  # 2 x bins x F
    k = torch.reshape(k, (n + 2, 1, frame_len))
    xt = torch.from_numpy(x).float().unsqueeze(1)  # B x 1 x T
    c = torch.nn.functional.conv1d(xt, k, stride=hop, padding=0)
    r, i = torch.chunk(c, 2, dim=1)  # B x bins x T
    return r.numpy(), i.numpy()


def test_stft_matches_reference_conv_formulation():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((3, 16000)).astype(np.float32)
    spec = S.stft(jnp.asarray(x), 512, 256, center=False)  # (B, T, F)
    r_ref, i_ref = _torch_conv_stft(x)
    r = np.transpose(np.asarray(spec.real), (0, 2, 1))  # -> (B, F, T)
    i = np.transpose(np.asarray(spec.imag), (0, 2, 1))
    np.testing.assert_allclose(r, r_ref, atol=2e-3, rtol=1e-4)
    np.testing.assert_allclose(i, i_ref, atol=2e-3, rtol=1e-4)


def test_stft_center_matches_torch_stft():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 8192)).astype(np.float32)
    spec = S.stft(jnp.asarray(x), 512, 256, center=True)
    ref = torch.stft(
        torch.from_numpy(x), n_fft=512, hop_length=256, center=True,
        onesided=True, window=torch.hann_window(512), return_complex=True,
    ).numpy()  # (B, F, T)
    got = np.transpose(np.asarray(spec), (0, 2, 1))
    np.testing.assert_allclose(got.real, ref.real, atol=2e-3, rtol=1e-4)
    np.testing.assert_allclose(got.imag, ref.imag, atol=2e-3, rtol=1e-4)


def test_istft_matches_torch_istft():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 8192)).astype(np.float32)
    spec_t = torch.stft(
        torch.from_numpy(x), n_fft=512, hop_length=256, center=True,
        onesided=True, window=torch.hann_window(512), return_complex=True,
    )
    wav_ref = torch.istft(
        spec_t, n_fft=512, hop_length=256, center=True, onesided=True,
        window=torch.hann_window(512), return_complex=False,
    ).numpy()
    spec_j = jnp.asarray(np.transpose(spec_t.numpy(), (0, 2, 1)))  # (B, T, F)
    wav = np.asarray(S.istft(spec_j, 512, 256, center=True))
    n = min(wav.shape[-1], wav_ref.shape[-1])
    np.testing.assert_allclose(wav[:, :n], wav_ref[:, :n], atol=1e-4, rtol=1e-4)


def test_round_trip_center():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((1, 4096)).astype(np.float32)
    spec = S.stft(jnp.asarray(x), 512, 256, center=True)
    back = np.asarray(S.istft(spec, 512, 256, center=True, length=4096))
    np.testing.assert_allclose(back, x, atol=1e-4)


def test_round_trip_uncentered_interior():
    """Uncentered analysis/synthesis reconstructs the interior exactly."""
    rng = np.random.default_rng(4)
    x = rng.standard_normal((4096,)).astype(np.float32)
    spec = S.stft(jnp.asarray(x), 512, 256, center=False)
    back = np.asarray(S.istft(spec, 512, 256, center=False))
    np.testing.assert_allclose(back[256:-512], x[256 : back.shape[-1] - 512], atol=1e-4)


def test_frame_signal_general_hop():
    x = jnp.arange(100.0)
    f = S.frame_signal(x, 30, 7)
    f_np = np.asarray(f)
    for i in range(f_np.shape[0]):
        np.testing.assert_array_equal(f_np[i], np.arange(100.0)[i * 7 : i * 7 + 30])


def test_overlap_add_inverts_framing_sum():
    x = np.ones((320,), np.float32)
    frames = S.frame_signal(jnp.asarray(x), 8, 4)
    ola = np.asarray(S.overlap_add(frames, 4))
    # interior coverage = frame_len/hop = 2
    np.testing.assert_allclose(ola[8:-8], 2.0 * x[8 : ola.shape[-1] - 8])
