"""PIT loss vs brute-force torch reference (css/objectives/pit.py:5-62)."""

import itertools

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from css_tpu.ops.pit import batch_pit_loss, mse_pairwise, pit_loss


def _ref_pit(est: np.ndarray, tgt: np.ndarray, axis: int = 0):
    e = torch.from_numpy(est)
    t = torch.from_numpy(tgt)
    k = e.shape[axis]
    cands = []
    perms = list(itertools.permutations(range(k)))
    indexer = [slice(None)] * e.ndim
    for p in perms:
        indexer[axis] = list(p)
        cands.append(torch.nn.functional.mse_loss(e[tuple(indexer)], t))
    losses = torch.stack(cands)
    m, i = torch.min(losses, dim=0)
    return m.item(), perms[int(i)]


@pytest.mark.parametrize("k", [2, 3, 4])
def test_pit_matches_reference(k):
    rng = np.random.default_rng(k)
    est = rng.standard_normal((k, 50, 257)).astype(np.float32)
    tgt = rng.standard_normal((k, 50, 257)).astype(np.float32)
    loss, perm = pit_loss(jnp.asarray(est), jnp.asarray(tgt), axis=0,
                          return_permutation=True)
    ref_loss, ref_perm = _ref_pit(est, tgt)
    np.testing.assert_allclose(float(loss), ref_loss, rtol=1e-5)
    assert tuple(np.asarray(perm)) == ref_perm


def test_pit_picks_identity_when_aligned():
    rng = np.random.default_rng(0)
    tgt = rng.standard_normal((2, 10, 5)).astype(np.float32)
    est = tgt + 0.01 * rng.standard_normal((2, 10, 5)).astype(np.float32)
    _, perm = pit_loss(jnp.asarray(est), jnp.asarray(tgt), return_permutation=True)
    assert tuple(np.asarray(perm)) == (0, 1)
    # swapped estimate -> swapped permutation
    _, perm = pit_loss(jnp.asarray(est[::-1].copy()), jnp.asarray(tgt),
                       return_permutation=True)
    assert tuple(np.asarray(perm)) == (1, 0)


def test_batch_pit_matches_per_example_average():
    rng = np.random.default_rng(7)
    est = rng.standard_normal((6, 2, 20, 17)).astype(np.float32)
    tgt = rng.standard_normal((6, 2, 20, 17)).astype(np.float32)
    loss, perms = batch_pit_loss(jnp.asarray(est), jnp.asarray(tgt))
    refs = [_ref_pit(est[b], tgt[b])[0] for b in range(6)]
    np.testing.assert_allclose(float(loss), np.mean(refs), rtol=1e-5)
    assert perms.shape == (6, 2)


def test_pit_is_jittable_and_differentiable():
    rng = np.random.default_rng(9)
    est = jnp.asarray(rng.standard_normal((4, 2, 10, 8)).astype(np.float32))
    tgt = jnp.asarray(rng.standard_normal((4, 2, 10, 8)).astype(np.float32))

    @jax.jit
    def f(e):
        return batch_pit_loss(e, tgt)[0]

    g = jax.grad(f)(est)
    assert g.shape == est.shape
    assert np.isfinite(np.asarray(g)).all()
