"""MVDR with oracle masks must beat single-channel masking on a spatial
scene — validates the beamforming math end-to-end, not just vs the oracle
formulas."""

import numpy as np

import jax.numpy as jnp

from css_tpu.executor.doa import steervec_7ch
from css_tpu.ops.mvdr import souden_mvdr


def test_mvdr_oracle_masks_beat_ch0_masking():
    rng = np.random.default_rng(0)
    c, t, f = 7, 120, 257
    sv, angles = steervec_7ch(nfreqs=f, nvecs=30)  # (F, A, C)
    a1, a2 = 3, 18  # two well-separated DOAs

    # sparse source spectra with partial overlap
    s1 = (rng.standard_normal((t, f)) + 1j * rng.standard_normal((t, f)))
    s2 = (rng.standard_normal((t, f)) + 1j * rng.standard_normal((t, f)))
    s1 *= (rng.uniform(size=(t, f)) < 0.35)
    s2 *= (rng.uniform(size=(t, f)) < 0.35)
    noise = 0.1 * (rng.standard_normal((c, t, f))
                   + 1j * rng.standard_normal((c, t, f)))
    # X[c] = s1 * sv1[c] + s2 * sv2[c] + noise
    x = (s1[None] * np.transpose(sv[:, a1])[:, None, :]
         + s2[None] * np.transpose(sv[:, a2])[:, None, :]
         + noise).astype(np.complex64)

    tgt_mask = (np.abs(s1) > 1e-6).astype(np.float32)
    noi_mask = 1.0 - tgt_mask

    out = np.asarray(souden_mvdr(jnp.asarray(x[None]),
                                 jnp.asarray(tgt_mask[None]),
                                 jnp.asarray(noi_mask[None]),
                                 diag_loading=1e-6))[0]
    ref = s1 * np.conj(sv[:, a1, 0])[None]  # source as seen at ref mic

    def spec_sdr(est, target):
        err = est - target
        return 10 * np.log10(np.sum(np.abs(target) ** 2)
                             / (np.sum(np.abs(err) ** 2) + 1e-12))

    masked_ch0 = tgt_mask * x[0]
    sdr_mvdr = spec_sdr(out, ref)
    sdr_mask = spec_sdr(masked_ch0, ref)
    assert sdr_mvdr > sdr_mask + 3.0, (
        f"MVDR {sdr_mvdr:.1f} dB should beat ch0 masking {sdr_mask:.1f} dB")
