"""Permutation-invariant training (PIT) loss, vectorized for XLA.

The reference enumerates permutations in a Python loop per example
(css/objectives/pit.py:49-57 and the per-example batch loop in
css/objectives/mse.py:32-35). Inside jit that is replaced by a static
(K!, K) permutation index array: a single gather builds all permuted
estimates, the elementwise loss is vmapped over the permutation axis, and a
min-reduce picks the winner — one fused XLA program, batched over examples.
"""

from __future__ import annotations

import itertools
import math
from functools import lru_cache
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=None)
def permutations_array(k: int) -> np.ndarray:
    """Static (K!, K) int32 array of all permutations of range(K)."""
    if k >= 10:
        raise ValueError(f"K={k} gives {math.factorial(k)} permutations; refuse")
    return np.asarray(list(itertools.permutations(range(k))), dtype=np.int32)


def mse_pairwise(est: jax.Array, ref: jax.Array) -> jax.Array:
    """Mean squared error over all axes (matches F.mse_loss reduction='mean')."""
    return jnp.mean(jnp.square(est - ref))


def l1_pairwise(est: jax.Array, ref: jax.Array) -> jax.Array:
    return jnp.mean(jnp.abs(est - ref))


def pit_loss(
    estimate: jax.Array,
    target: jax.Array,
    axis: int = 0,
    loss_fn: Callable[[jax.Array, jax.Array], jax.Array] = mse_pairwise,
    return_permutation: bool = False,
):
    """Minimum loss over all speaker permutations of ``estimate``.

    Single-example semantics matching the reference pit_loss
    (css/objectives/pit.py:5-62): ``estimate``/``target`` have a speaker
    axis ``axis`` of size K; returns min over the K! permutations of
    ``loss_fn(permuted_estimate, target)`` (and optionally the argmin
    permutation's index row). Batch over examples with ``jax.vmap``.
    """
    k = estimate.shape[axis]
    perms = jnp.asarray(permutations_array(k))  # (K!, K)
    permuted = jnp.take(estimate, perms, axis=axis)
    # take() expands axis into (K!, K); move the K! axis to front.
    permuted = jnp.moveaxis(permuted, axis, 0)  # (K!, K, ...) rest
    target_b = jnp.moveaxis(target, axis, 0)  # (K, ...)
    losses = jax.vmap(lambda e: loss_fn(e, target_b))(permuted)  # (K!,)
    best = jnp.argmin(losses)
    min_loss = losses[best]
    if return_permutation:
        return min_loss, perms[best]
    return min_loss


def batch_pit_loss(
    estimate: jax.Array,
    target: jax.Array,
    loss_fn: Callable[[jax.Array, jax.Array], jax.Array] = mse_pairwise,
) -> Tuple[jax.Array, jax.Array]:
    """PIT over a batch: (B, K, ...) inputs -> (mean loss, (B, K) perms)."""
    f = jax.vmap(
        lambda e, t: pit_loss(e, t, axis=0, loss_fn=loss_fn, return_permutation=True)
    )
    losses, perms = f(estimate, target)
    return jnp.mean(losses), perms
