"""Canonical slot-ordering pressure in the MSE objective
(--mse-order-weight): confidence-gated blend of PIT with a fixed
lower-centroid-first assignment, so the model's per-window slot
convention stabilizes and stitcher boundary decisions stop being coin
flips on single-speaker overlaps."""

import numpy as np
import jax.numpy as jnp

from css_tpu.objectives.mse import MeanSquaredError


def _bands(b=2, t=20, f=64, lo=(4, 16), hi=(40, 52), swap=False):
    """Targets in disjoint bands: source1 low band, source2 high band."""
    s1 = np.zeros((b, t, f), np.float32)
    s2 = np.zeros((b, t, f), np.float32)
    s1[..., lo[0]:lo[1]] = 1.0
    s2[..., hi[0]:hi[1]] = 1.0
    y = np.stack([s2, s1] if swap else [s1, s2], axis=1)
    return jnp.asarray(y), {"source1": jnp.asarray(s1),
                            "source2": jnp.asarray(s2)}


def test_order_weight_zero_is_pure_pit():
    y_right, batch = _bands()
    y_swapped, _ = _bands(swap=True)
    obj = MeanSquaredError()
    l1, _ = obj(y_right, batch)
    l2, _ = obj(y_swapped, batch)
    assert float(l1) == float(l2) == 0.0  # PIT is order-blind


def test_order_weight_penalizes_non_canonical_order():
    y_right, batch = _bands()           # slot 0 = low band (canonical)
    y_swapped, _ = _bands(swap=True)    # slot 0 = high band
    obj = MeanSquaredError(order_weight=0.5)
    l_right, aux_r = obj(y_right, batch)
    l_swapped, aux_s = obj(y_swapped, batch)
    assert float(l_right) == 0.0
    assert float(l_swapped) > 0.1       # out-of-order costs
    assert float(aux_s["order_gap"]) > 0.0


def test_ambiguous_centroids_keep_pure_pit():
    """When the two targets have (near-)identical centroids, the
    confidence gate zeroes the ordering pressure: swapped output costs
    (almost) nothing."""
    # identical band -> centroid gap 0 -> conf ~ sigmoid(-2) ~ 0.12...
    # use overlapping bands one bin apart: gap ~1 bin, conf ~ 0.18
    y, batch = _bands(lo=(20, 32), hi=(21, 33))
    y_swapped = y[:, ::-1]
    obj = MeanSquaredError(order_weight=0.5)
    l_swapped, _ = obj(y_swapped, batch)
    obj0 = MeanSquaredError()
    l_pit, _ = obj0(y_swapped, batch)
    # bounded close to the pure-PIT loss (which is ~0 here)
    assert float(l_swapped) - float(l_pit) < 0.05


def test_order_loss_finite_gradient():
    import jax

    y, batch = _bands()
    obj = MeanSquaredError(order_weight=0.3, noise_weight=0.0)

    def f(y_pred):
        loss, _ = obj(y_pred, batch)
        return loss

    g = jax.grad(f)(y + 0.1)
    assert np.isfinite(np.asarray(g)).all()
