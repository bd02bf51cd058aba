"""Feature extractor parity vs the reference torch implementation
(css/executor/feature.py:85-175)."""

import sys

import numpy as np
import torch

import jax.numpy as jnp

from css_tpu.ops.features import EPSILON, FeatureExtractor, mvn

sys.path.insert(0, "/root/reference")


def _ref_feature_extractor(ipd_index=None):
    from css.executor.feature import FeatureExtractor as RefFE

    return RefFE(frame_len=512, frame_hop=256, ipd_index=ipd_index)


def test_mvn_matches_torch_std_semantics():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((3, 40, 17)).astype(np.float32)
    xt = torch.from_numpy(x)
    ref = ((xt - xt.mean(-2, keepdim=True)) /
           (xt.std(-2, keepdim=True) + EPSILON)).numpy()
    got = np.asarray(mvn(jnp.asarray(x), axis=-2))
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-4)


def test_single_channel_features_match_reference():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 16000)).astype(np.float32) * 0.1
    ref_fe = _ref_feature_extractor()
    mag_r, f_r, re_r, im_r = ref_fe.forward(torch.from_numpy(x))
    fe = FeatureExtractor(512, 256)
    mag, f, spec = fe(jnp.asarray(x))
    np.testing.assert_allclose(
        np.transpose(np.asarray(mag), (0, 2, 1)), mag_r.numpy(), atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(
        np.transpose(np.asarray(f), (0, 2, 1)), f_r.numpy(), atol=3e-3, rtol=1e-2)


def test_multichannel_ipd_features_match_reference():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 7, 16000)).astype(np.float32) * 0.1
    ref_fe = _ref_feature_extractor(ipd_index="1,0;2,0;3,0;4,0;5,0;6,0")
    mag_r, f_r, re_r, im_r = ref_fe.forward(torch.from_numpy(x))
    fe = FeatureExtractor(512, 256, ipd_index="1,0;2,0;3,0;4,0;5,0;6,0")
    mag, f, spec = fe(jnp.asarray(x))
    assert f.shape[-1] == 257 * 7
    got = np.transpose(np.asarray(f), (0, 2, 1))  # (B, F', T)
    ref = f_r.numpy()
    # MVN-magnitude rows compare directly
    np.testing.assert_allclose(got[:, :257], ref[:, :257], atol=5e-3, rtol=1e-2)
    # IPD rows are angles: compare on the circle (values straddling the
    # +-pi branch cut legitimately differ by 2*pi)
    ang = np.angle(np.exp(1j * (got[:, 257:] - ref[:, 257:])))
    assert np.abs(ang).max() < 5e-3
