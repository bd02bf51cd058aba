"""Fused Pallas dropout (ops/dropout_pallas.py) — interpret mode on CPU."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from css_tpu.ops.dropout_pallas import fused_dropout


def test_keep_statistics():
    x = jnp.ones((512, 256), jnp.float32)
    rate = 0.1
    y = np.asarray(fused_dropout(x, jnp.int32(7), rate, True))
    kept = (y != 0).mean()
    assert abs(kept - (1 - rate)) < 0.01
    # surviving entries carry the 1/(1-rate) scale
    np.testing.assert_allclose(y[y != 0], 1.0 / (1 - rate), rtol=1e-6)


def test_deterministic_in_seed():
    x = jnp.asarray(np.random.default_rng(0).standard_normal((64, 128)),
                    jnp.float32)
    a = np.asarray(fused_dropout(x, jnp.int32(3), 0.5, True))
    b = np.asarray(fused_dropout(x, jnp.int32(3), 0.5, True))
    c = np.asarray(fused_dropout(x, jnp.int32(4), 0.5, True))
    np.testing.assert_array_equal(a, b)
    assert (a != c).any()


def test_vjp_regenerates_identical_mask():
    x = jnp.asarray(np.random.default_rng(1).standard_normal((32, 128)),
                    jnp.float32)
    rate, seed = 0.3, jnp.int32(11)
    y, vjp = jax.vjp(lambda v: fused_dropout(v, seed, rate, True), x)
    (dx,) = vjp(jnp.ones_like(y))
    # dropout is elementwise-linear: dx must be the SAME mask * scale
    mask = np.asarray(y) != 0
    np.testing.assert_allclose(np.asarray(dx)[mask], 1.0 / (1 - rate),
                               rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(dx) == 0, ~mask)


def test_bf16_and_3d_shapes():
    x = jnp.ones((4, 37, 155), jnp.bfloat16)  # odd dims (attention scores)
    y = fused_dropout(x, jnp.int32(5), 0.1, True)
    assert y.shape == x.shape and y.dtype == x.dtype
    assert np.isfinite(np.asarray(y, np.float32)).all()


def test_fast_dropout_flag_switches_conformer(monkeypatch):
    """CSS_TPU_FAST_DROPOUT=1 must not change the parameter tree, and the
    training forward must run (interpret mode off-TPU)."""
    from css_tpu.models.conformer import Conformer

    def build_and_forward():
        model = Conformer(num_blocks=1, attention_dim=16,
                          attention_heads=2, linear_units=32)
        f = jnp.zeros((1, 12, 257))
        variables = model.init({"params": jax.random.PRNGKey(0)}, f,
                               train=False)
        (y, masks), _ = model.apply(
            variables, jnp.ones((1, 12, 257)) * 0.1, train=True,
            rngs={"dropout": jax.random.PRNGKey(1)},
            mutable=["batch_stats"])
        return variables, np.asarray(masks)

    monkeypatch.delenv("CSS_TPU_FAST_DROPOUT", raising=False)
    v_stock, m_stock = build_and_forward()
    monkeypatch.setenv("CSS_TPU_FAST_DROPOUT", "1")
    v_fast, m_fast = build_and_forward()
    assert (jax.tree_util.tree_structure(v_stock)
            == jax.tree_util.tree_structure(v_fast))
    assert np.isfinite(m_fast).all()
