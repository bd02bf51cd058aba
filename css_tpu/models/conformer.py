"""Conformer mask estimator (TPU-native).

Re-design of the reference Conformer CSS model
(css/models/conformer.py:24-362): spectrogram -> per-TF masks via
utterance MVN, linear embedding, N x conformer blocks (Macaron half-FFNs,
relative-position MHSA, GLU conv module with depthwise conv + BatchNorm,
post-LN), and a linear mask head with ReLU.

Differences from the reference are layout/engineering only (numerics match,
verified by weight-transfer parity tests):
  * masks returned stacked on a trailing source axis, not a python tuple;
  * relative-position scores are a single einsum instead of the reshape
    dance at conformer.py:230-233;
  * bf16 compute supported via ``compute_dtype`` (params stay fp32).
"""

from __future__ import annotations

import math
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from css_tpu.models.base import MODELS, add_common_mask_args
from css_tpu.ops.features import mvn

DEFAULT_CONFORMER_CONF = {
    "attention_dim": 256,
    "attention_heads": 4,
    "linear_units": 1024,
    "num_blocks": 16,
    "kernel_size": 33,
    "dropout_rate": 0.1,
    "relative_pos_emb": True,
}


class FeedForward(nn.Module):
    """Pre-LN FFN (conformer.py:306-326)."""

    d_model: int
    d_inner: int
    dropout_rate: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.LayerNorm(name="layer_norm", epsilon=1e-5, dtype=self.dtype)(x)
        x = nn.Dense(self.d_inner, name="w1", dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        x = nn.Dense(self.d_model, name="w2", dtype=self.dtype)(x)
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        return x


class RelPosMultiHeadAttention(nn.Module):
    """MHSA with relative-position key bias (conformer.py:188-254).

    scores = (q k^T + q pos_k^T) / sqrt(d_k); pos_k is gathered from a
    (2*maxlen, d_k) embedding of clipped frame offsets.
    """

    n_head: int
    n_feat: int
    dropout_rate: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, pos_k: Optional[jax.Array], train: bool = False):
        b, t, _ = x.shape
        h, d_k = self.n_head, self.n_feat // self.n_head
        x = nn.LayerNorm(name="layer_norm", epsilon=1e-5, dtype=self.dtype)(x)
        q = nn.Dense(self.n_feat, name="linear_q", dtype=self.dtype)(x)
        k = nn.Dense(self.n_feat, name="linear_k", dtype=self.dtype)(x)
        v = nn.Dense(self.n_feat, name="linear_v", dtype=self.dtype)(x)
        q = q.reshape(b, t, h, d_k).transpose(0, 2, 1, 3)
        k = k.reshape(b, t, h, d_k).transpose(0, 2, 1, 3)
        v = v.reshape(b, t, h, d_k).transpose(0, 2, 1, 3)
        scores = jnp.einsum("bhtd,bhsd->bhts", q, k)
        if pos_k is not None:
            scores = scores + jnp.einsum("bhtd,tsd->bhts", q, pos_k.astype(q.dtype))
        scores = scores / math.sqrt(d_k)
        attn = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(self.dtype)
        attn = nn.Dropout(self.dropout_rate, deterministic=not train)(attn)
        out = jnp.einsum("bhts,bhsd->bhtd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, t, self.n_feat)
        out = nn.Dense(self.n_feat, name="linear_out", dtype=self.dtype)(out)
        return nn.Dropout(self.dropout_rate, deterministic=not train)(out)


class ConvModule(nn.Module):
    """GLU conv module (conformer.py:257-303).

    The reference's "pointwise" convs are Conv2d(1, 2, 1) / Conv2d(1, 1, 1)
    over a singleton channel — i.e. scalar affine maps broadcast over (T, F)
    — implemented here as explicit scalar parameters.
    """

    input_dim: int
    kernel_size: int
    dropout_rate: float
    causal: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.LayerNorm(name="layer_norm", epsilon=1e-5, dtype=self.dtype)(x)
        # scalar GLU: (w0*x + b0) * sigmoid(w1*x + b1)
        pw1_w = self.param("pw1_w", nn.initializers.normal(1.0), (2,), jnp.float32)
        pw1_b = self.param("pw1_b", nn.initializers.zeros, (2,), jnp.float32)
        a = pw1_w[0].astype(self.dtype) * x + pw1_b[0].astype(self.dtype)
        g = pw1_w[1].astype(self.dtype) * x + pw1_b[1].astype(self.dtype)
        x = a * jax.nn.sigmoid(g)
        # depthwise conv over time, channels last: (B, T, C)
        if self.causal:
            pad = [(self.kernel_size - 1, 0)]
        else:
            pad = [((self.kernel_size - 1) // 2, (self.kernel_size - 1) // 2)]
        dw = self.param(
            "dw_kernel",
            nn.initializers.lecun_normal(),
            (self.kernel_size, 1, self.input_dim),
            jnp.float32,
        )
        dw_b = self.param("dw_bias", nn.initializers.zeros, (self.input_dim,), jnp.float32)
        x = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            dw.astype(self.dtype),
            window_strides=(1,),
            padding=pad,
            dimension_numbers=("NWC", "WIO", "NWC"),
            feature_group_count=self.input_dim,
        ) + dw_b.astype(self.dtype)
        x = nn.BatchNorm(
            name="bn",
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
        )(x)
        x = nn.relu(x)
        pw2_w = self.param("pw2_w", nn.initializers.ones, (1,), jnp.float32)
        pw2_b = self.param("pw2_b", nn.initializers.zeros, (1,), jnp.float32)
        x = pw2_w[0].astype(self.dtype) * x + pw2_b[0].astype(self.dtype)
        return nn.Dropout(self.dropout_rate, deterministic=not train)(x)


class EncoderLayer(nn.Module):
    """Conformer block with Macaron residuals + post-LN (conformer.py:329-362)."""

    d_model: int
    n_head: int
    d_ffn: int
    kernel_size: int
    dropout_rate: float
    causal: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, pos_k, train: bool = False):
        x = x + 0.5 * FeedForward(
            self.d_model, self.d_ffn, self.dropout_rate,
            name="feed_forward_in", dtype=self.dtype)(x, train)
        x = x + RelPosMultiHeadAttention(
            self.n_head, self.d_model, self.dropout_rate,
            name="self_attn", dtype=self.dtype)(x, pos_k, train)
        x = x + ConvModule(
            self.d_model, self.kernel_size, self.dropout_rate, self.causal,
            name="conv", dtype=self.dtype)(x, train)
        x = x + 0.5 * FeedForward(
            self.d_model, self.d_ffn, self.dropout_rate,
            name="feed_forward_out", dtype=self.dtype)(x, train)
        return nn.LayerNorm(name="layer_norm", epsilon=1e-5, dtype=self.dtype)(x)


class ConformerEncoder(nn.Module):
    """Embedding + relative positions + N blocks (conformer.py:107-165)."""

    idim: int = 257
    attention_dim: int = 256
    attention_heads: int = 4
    linear_units: int = 1024
    num_blocks: int = 16
    kernel_size: int = 33
    dropout_rate: float = 0.1
    causal: bool = False
    relative_pos_emb: bool = True
    maxlen: int = 1000
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xs, train: bool = False):
        xs = nn.Dense(self.attention_dim, name="embed_linear", dtype=self.dtype)(xs)
        xs = nn.LayerNorm(name="embed_norm", epsilon=1e-5, dtype=self.dtype)(xs)
        xs = nn.Dropout(self.dropout_rate, deterministic=not train)(xs)
        xs = nn.relu(xs)

        pos_k = None
        if self.relative_pos_emb:
            d_k = self.attention_dim // self.attention_heads
            pe_k = self.param(
                "pe_k", nn.initializers.normal(1.0), (2 * self.maxlen, d_k),
                jnp.float32)
            t = xs.shape[1]
            pos = np.arange(t)
            rel = pos[:, None] - pos[None, :]
            rel = np.clip(rel, -self.maxlen, self.maxlen - 1) + self.maxlen
            # gather-as-matmul: pe_k[rel] as a direct gather costs a slow
            # TPU gather forward and — far worse in training — a
            # duplicate-index scatter-add VJP into the (2*maxlen, d_k)
            # table. The distinct offsets form a CONTIGUOUS range of
            # width <= 2T-1, so slice that band and expand it with a
            # constant one-hot matmul (exact: each row sums one element);
            # the VJP is another matmul plus a contiguous slice-update.
            lo, hi = int(rel.min()), int(rel.max())
            width = hi - lo + 1
            onehot = np.zeros((t * t, width), np.float32)
            onehot[np.arange(t * t), (rel - lo).reshape(-1)] = 1.0
            pe_band = jax.lax.dynamic_slice_in_dim(pe_k, lo, width, axis=0)
            pos_k = (jnp.asarray(onehot) @ pe_band).reshape(t, t, d_k)

        for i in range(self.num_blocks):
            xs = EncoderLayer(
                self.attention_dim, self.attention_heads, self.linear_units,
                self.kernel_size, self.dropout_rate, self.causal,
                name=f"encoders_{i}", dtype=self.dtype)(xs, pos_k, train)
        return xs


@MODELS.register("Conformer")
class Conformer(nn.Module):
    """Conformer mask-estimation model (css/models/conformer.py:24-104)."""

    idim: int = 257
    num_bins: int = 257
    num_spk: int = 2
    num_noise: int = 1
    attention_dim: int = 256
    attention_heads: int = 4
    linear_units: int = 1024
    num_blocks: int = 16
    kernel_size: int = 33
    dropout_rate: float = 0.1
    relative_pos_emb: bool = True
    compute_dtype: Any = jnp.float32

    @staticmethod
    def add_args(parser):
        add_common_mask_args(parser)
        parser.add_argument("--conformer-attention-dim", type=int, default=256)
        parser.add_argument("--conformer-attention-heads", type=int, default=4)
        parser.add_argument("--conformer-linear-units", type=int, default=1024)
        parser.add_argument("--conformer-num-blocks", type=int, default=16)
        parser.add_argument("--conformer-kernel-size", type=int, default=33)
        parser.add_argument("--conformer-dropout-rate", type=float, default=0.1)
        parser.add_argument("--conformer-relative-pos-emb", type=bool, default=True)

    @classmethod
    def build_model(cls, conf):
        return cls(
            idim=int(conf.get("idim", 257)),
            num_bins=int(conf.get("num_bins", 257)),
            num_spk=int(conf.get("num_spk", 2)),
            num_noise=int(conf.get("num_noise", 1)),
            attention_dim=int(conf.get("conformer_attention_dim", 256)),
            attention_heads=int(conf.get("conformer_attention_heads", 4)),
            linear_units=int(conf.get("conformer_linear_units", 1024)),
            num_blocks=int(conf.get("conformer_num_blocks", 16)),
            kernel_size=int(conf.get("conformer_kernel_size", 33)),
            dropout_rate=float(conf.get("conformer_dropout_rate", 0.1)),
            relative_pos_emb=bool(conf.get("conformer_relative_pos_emb", True)),
            compute_dtype=jnp.bfloat16 if conf.get("bf16") else jnp.float32,
        )

    @nn.compact
    def __call__(self, f, train: bool = False):
        """f: (B, T, F) magnitude features -> (y_pred, masks).

        y_pred: (B, num_spk, T, F); masks: (B, T, F, num_spk+num_noise).
        """
        f_orig = f
        f = mvn(f, axis=-2)  # conformer.py:95
        f = ConformerEncoder(
            idim=self.idim,
            attention_dim=self.attention_dim,
            attention_heads=self.attention_heads,
            linear_units=self.linear_units,
            num_blocks=self.num_blocks,
            kernel_size=self.kernel_size,
            dropout_rate=self.dropout_rate,
            relative_pos_emb=self.relative_pos_emb,
            name="conformer",
            dtype=self.compute_dtype,
        )(f.astype(self.compute_dtype), train)
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


def params_from_torch(state_dict, num_blocks: int = 16):
    """Convert a reference torch Conformer state_dict to flax variables.

    Enables parity testing and warm-starting from reference `.mdl`
    checkpoints (css/models/conformer.py parameter naming).
    """

    def t(name):
        return np.asarray(state_dict[name].detach().cpu().numpy())

    def dense(prefix):
        return {"kernel": t(f"{prefix}.weight").T, "bias": t(f"{prefix}.bias")}

    def ln(prefix):
        return {"scale": t(f"{prefix}.weight"), "bias": t(f"{prefix}.bias")}

    def ffn(prefix):
        return {
            "layer_norm": ln(f"{prefix}.layer_norm"),
            "w1": dense(f"{prefix}.net.0"),
            "w2": dense(f"{prefix}.net.3"),
        }

    params = {
        "conformer": {
            "embed_linear": dense("conformer.embed.0"),
            "embed_norm": ln("conformer.embed.1"),
            "pe_k": t("conformer.pos_emb.pe_k.weight"),
        },
        "linear": dense("linear"),
    }
    batch_stats = {"conformer": {}}
    for i in range(num_blocks):
        p = f"conformer.encoders.{i}"
        layer = {
            "feed_forward_in": ffn(f"{p}.feed_forward_in"),
            "feed_forward_out": ffn(f"{p}.feed_forward_out"),
            "self_attn": {
                "layer_norm": ln(f"{p}.self_attn.layer_norm"),
                "linear_q": dense(f"{p}.self_attn.linear_q"),
                "linear_k": dense(f"{p}.self_attn.linear_k"),
                "linear_v": dense(f"{p}.self_attn.linear_v"),
                "linear_out": dense(f"{p}.self_attn.linear_out"),
            },
            "conv": {
                "layer_norm": ln(f"{p}.conv.layer_norm"),
                "pw1_w": t(f"{p}.conv.pw_conv_1.weight").reshape(2),
                "pw1_b": t(f"{p}.conv.pw_conv_1.bias").reshape(2),
                # torch depthwise (C, 1, K) -> flax WIO (K, 1, C)
                "dw_kernel": t(f"{p}.conv.dw_conv_1d.weight").transpose(2, 1, 0),
                "dw_bias": t(f"{p}.conv.dw_conv_1d.bias"),
                "bn": {
                    "scale": t(f"{p}.conv.BN.weight"),
                    "bias": t(f"{p}.conv.BN.bias"),
                },
                "pw2_w": t(f"{p}.conv.pw_conv_2.weight").reshape(1),
                "pw2_b": t(f"{p}.conv.pw_conv_2.bias").reshape(1),
            },
            "layer_norm": ln(f"{p}.layer_norm"),
        }
        params["conformer"][f"encoders_{i}"] = layer
        batch_stats["conformer"][f"encoders_{i}"] = {
            "conv": {
                "bn": {
                    "mean": t(f"{p}.conv.BN.running_mean"),
                    "var": t(f"{p}.conv.BN.running_var"),
                }
            }
        }
    return {"params": params, "batch_stats": batch_stats}
