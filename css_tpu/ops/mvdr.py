"""Mask-based MVDR beamforming math (complex, batched, XLA-native).

Numerics follow the reference's in-repo oracle (css/utils/mvdr_util.py:45-66,
the hand-written cross-check of its asteroid path): spatial covariance
matrices as mask-weighted outer products with diagonal loading, Souden MVDR
coefficients W = solve(noise_scm, tgt_scm)/trace taken at reference channel
0, applied as y[f,t] = sum_c conj(W[f,c]) * mix[c,f,t].

Everything is batched over (window, freq) and runs as one XLA program: the
7x7 Hermitian solves batch onto the MXU-backed LAPACK-free XLA solver
(SURVEY.md §2.3 "stacked Hermitian solve").

Layout: spectra are (..., C, T, F) complex time-major; masks (..., T, F).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def compute_scm(spec: jax.Array, mask: jax.Array,
                diag_loading: float = 1e-15) -> jax.Array:
    """Mask-weighted spatial covariance matrices.

    spec: (..., C, T, F) complex; mask: (..., T, F) real.
    Returns (..., F, C, C) complex (mvdr_util.py:45-52: unnormalized sum
    over frames plus diag_loading * I).
    """
    c = spec.shape[-3]
    scm = jnp.einsum("...ctf,...dtf,...tf->...fcd", spec, jnp.conj(spec),
                     mask.astype(spec.real.dtype))
    eye = jnp.eye(c, dtype=scm.dtype)
    return scm + diag_loading * eye


def souden_coefficients(noise_scm: jax.Array, tgt_scm: jax.Array,
                        ref_channel: int = 0,
                        trace_eps: float = 1e-15) -> jax.Array:
    """Souden MVDR weights (mvdr_util.py:55-61).

    noise_scm/tgt_scm: (..., F, C, C) -> W: (..., F, C); the beamformed
    output is sum_c conj(W[..., f, c]) * spec[..., c, t, f].
    """
    num = jnp.linalg.solve(noise_scm, tgt_scm)  # (..., F, C, C)
    den = jnp.trace(num, axis1=-2, axis2=-1)[..., None]  # (..., F, 1)
    den = den + trace_eps
    return (num[..., ref_channel] / den).astype(noise_scm.dtype)


def apply_beamformer(spec: jax.Array, weights: jax.Array) -> jax.Array:
    """spec: (..., C, T, F), weights: (..., F, C) -> (..., T, F)."""
    return jnp.einsum("...ctf,...fc->...tf", spec, jnp.conj(weights))


def souden_mvdr(spec: jax.Array, target_mask: jax.Array,
                noise_mask: jax.Array, diag_loading: float = 1e-15,
                ref_channel: int = 0) -> jax.Array:
    """End-to-end masked Souden MVDR: (..., C, T, F) -> (..., T, F)."""
    tgt = compute_scm(spec, target_mask, diag_loading)
    noi = compute_scm(spec, noise_mask, diag_loading)
    w = souden_coefficients(noi, tgt, ref_channel)
    return apply_beamformer(spec, w)
