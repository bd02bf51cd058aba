"""BLSTM mask estimator (TPU-native).

Re-design of css/models/blstm.py:17-160. The cuDNN LSTM of the reference is
replaced by a scan-based bidirectional LSTM designed for the MXU: the input
projections for ALL timesteps are computed as one large batched matmul
outside the scan; the scan body only carries the (B, 4h) recurrent matmul
(SURVEY.md §2.3 "BLSTM via lax.scan over fused gate matmuls").

Gate order and double-bias convention match torch.nn.LSTM so reference
weights transfer 1:1 (parity-tested).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from css_tpu.models.base import MODELS, add_common_mask_args
from css_tpu.ops.features import mvn

DEFAULT_BLSTM_CONF = {"hidden_dim": 512, "num_layers": 4, "dropout_rate": 0.1}


def lstm_scan(xw: jax.Array, w_hh: jax.Array, hidden: int,
              reverse: bool = False, use_pallas: bool = False,
              differentiable: bool = False):
    """Run an LSTM over precomputed input projections.

    xw: (B, T, 4h) = x @ W_ih^T + b_ih + b_hh; w_hh: (4h, h) transposed to
    (h, 4h) by the caller. Gate order i, f, g, o (torch convention).

    ``use_pallas`` routes eval-path calls to the fused Pallas recurrence
    (whole time loop in one kernel, weights resident in VMEM) on TPU
    backends when the shapes tile cleanly; training keeps this scan,
    whose VJP XLA derives for free.
    """
    if use_pallas and jax.default_backend() in ("tpu", "axon"):
        from css_tpu.ops.lstm_pallas import (lstm_fused, lstm_fused_train,
                                             supported, train_fused_enabled)

        if supported(xw.shape[0], hidden, xw.dtype):
            if differentiable:
                if train_fused_enabled():
                    return lstm_fused_train(xw, w_hh, hidden, reverse)
            else:
                return lstm_fused(xw, w_hh, hidden, reverse=reverse)
    b = xw.shape[0]
    h0 = jnp.zeros((b, hidden), xw.dtype)
    c0 = jnp.zeros((b, hidden), xw.dtype)

    def step(carry, xw_t):
        h, c = carry
        gates = xw_t + h @ w_hh  # (B, 4h)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i = jax.nn.sigmoid(i)
        f = jax.nn.sigmoid(f)
        g = jnp.tanh(g)
        o = jax.nn.sigmoid(o)
        c = f * c + i * g
        h = o * jnp.tanh(c)
        return (h, c), h

    xs = jnp.swapaxes(xw, 0, 1)  # (T, B, 4h)
    _, hs = jax.lax.scan(step, (h0, c0), xs, reverse=reverse)
    return jnp.swapaxes(hs, 0, 1)  # (B, T, h)


class BiLSTMLayer(nn.Module):
    """One bidirectional LSTM + LayerNorm + dropout (blstm.py:131-160)."""

    h_dim: int
    dropout_rate: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = self.h_dim // 2
        outs = []
        for direction in ("fwd", "bwd"):
            w_ih = self.param(f"w_ih_{direction}", nn.initializers.lecun_normal(),
                              (4 * hidden, self.h_dim), jnp.float32)
            w_hh = self.param(f"w_hh_{direction}", nn.initializers.orthogonal(),
                              (4 * hidden, hidden), jnp.float32)
            b = self.param(f"b_{direction}", nn.initializers.zeros,
                           (4 * hidden,), jnp.float32)
            xw = x @ w_ih.T.astype(self.dtype) + b.astype(self.dtype)
            outs.append(
                lstm_scan(xw, w_hh.T.astype(self.dtype), hidden,
                          reverse=(direction == "bwd"),
                          use_pallas=True, differentiable=train)
            )
        x = jnp.concatenate(outs, axis=-1)
        x = nn.LayerNorm(name="layer_norm", epsilon=1e-5, dtype=self.dtype)(x)
        return nn.Dropout(self.dropout_rate, deterministic=not train)(x)


@MODELS.register("BLSTM")
class BLSTM(nn.Module):
    """BLSTM mask-estimation model (css/models/blstm.py:17-88)."""

    idim: int = 257
    num_bins: int = 257
    num_spk: int = 2
    num_noise: int = 1
    hidden_dim: int = 1024
    num_layers: int = 3
    dropout_rate: float = 0.1
    compute_dtype: Any = jnp.float32

    @staticmethod
    def add_args(parser):
        add_common_mask_args(parser)
        parser.add_argument("--blstm-hdim", type=int, default=1024)
        parser.add_argument("--blstm-num-layers", type=int, default=3)
        parser.add_argument("--blstm-dropout-rate", type=float, default=0.1)

    @classmethod
    def build_model(cls, conf):
        return cls(
            idim=int(conf.get("idim", 257)),
            num_bins=int(conf.get("num_bins", 257)),
            num_spk=int(conf.get("num_spk", 2)),
            num_noise=int(conf.get("num_noise", 1)),
            hidden_dim=int(conf.get("blstm_hdim", 1024)),
            num_layers=int(conf.get("blstm_num_layers", 3)),
            dropout_rate=float(conf.get("blstm_dropout_rate", 0.1)),
            compute_dtype=jnp.bfloat16 if conf.get("bf16") else jnp.float32,
        )

    @nn.compact
    def __call__(self, f, train: bool = False):
        """f: (B, T, F) -> (y_pred (B, num_spk, T, F), masks (B, T, F, S))."""
        f_orig = f
        f = mvn(f, axis=-2)  # blstm.py:80
        f = f.astype(self.compute_dtype)
        f = nn.Dense(self.hidden_dim, name="embed_linear", dtype=self.compute_dtype)(f)
        f = nn.LayerNorm(name="embed_norm", epsilon=1e-5, dtype=self.compute_dtype)(f)
        f = nn.Dropout(self.dropout_rate, deterministic=not train)(f)
        f = nn.relu(f)
        for i in range(self.num_layers):
            f = BiLSTMLayer(self.hidden_dim, self.dropout_rate,
                            name=f"encoders_{i}", dtype=self.compute_dtype)(f, train)
        n_src = self.num_spk + self.num_noise
        masks = nn.Dense(self.num_bins * n_src, name="linear",
                         dtype=self.compute_dtype)(f)
        masks = nn.relu(masks).astype(jnp.float32)
        b, t, _ = masks.shape
        masks = masks.reshape(b, t, n_src, self.num_bins)
        masks = jnp.transpose(masks, (0, 1, 3, 2))  # (B, T, F, S)
        y_pred = jnp.einsum("btfs,btf->bstf", masks[..., : self.num_spk],
                            f_orig[..., : self.num_bins])
        return y_pred, masks


def params_from_torch(state_dict, num_layers: int = 3):
    """Convert a reference torch BLSTM state_dict to flax variables."""

    def t(name):
        return np.asarray(state_dict[name].detach().cpu().numpy())

    def dense(prefix):
        return {"kernel": t(f"{prefix}.weight").T, "bias": t(f"{prefix}.bias")}

    def ln(prefix):
        return {"scale": t(f"{prefix}.weight"), "bias": t(f"{prefix}.bias")}

    params = {
        "embed_linear": dense("blstm.embed.0"),
        "embed_norm": ln("blstm.embed.1"),
        "linear": dense("linear"),
    }
    for i in range(num_layers):
        p = f"blstm.encoders.{i}"
        layer = {"layer_norm": ln(f"{p}.layer_norm")}
        for direction, suf in (("fwd", ""), ("bwd", "_reverse")):
            layer[f"w_ih_{direction}"] = t(f"{p}.lstm.weight_ih_l0{suf}")
            layer[f"w_hh_{direction}"] = t(f"{p}.lstm.weight_hh_l0{suf}")
            layer[f"b_{direction}"] = (
                t(f"{p}.lstm.bias_ih_l0{suf}") + t(f"{p}.lstm.bias_hh_l0{suf}")
            )
        params[f"encoders_{i}"] = layer
    return {"params": params}
