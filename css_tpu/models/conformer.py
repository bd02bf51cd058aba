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
from css_tpu.ops.features import cumulative_mvn, mvn

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

    def setup(self):
        self.layer_norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)
        self.w1 = nn.Dense(self.d_inner, dtype=self.dtype)
        self.w2 = nn.Dense(self.d_model, dtype=self.dtype)
        self.drop = nn.Dropout(self.dropout_rate)

    def __call__(self, x, train: bool = False):
        x = nn.relu(self.w1(self.layer_norm(x)))
        x = self.w2(self.drop(x, deterministic=not train))
        return self.drop(x, deterministic=not train)


class RelPosMultiHeadAttention(nn.Module):
    """MHSA with relative-position key bias (conformer.py:188-254).

    scores = (q k^T + q pos_k^T) / sqrt(d_k); pos_k is gathered from a
    (2*maxlen, d_k) embedding of clipped frame offsets. ``mask`` (T, S)
    restricts attention (the banded causal window of the causal model).
    """

    n_head: int
    n_feat: int
    dropout_rate: float
    dtype: Any = jnp.float32

    def setup(self):
        self.layer_norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)
        self.linear_q = nn.Dense(self.n_feat, dtype=self.dtype)
        self.linear_k = nn.Dense(self.n_feat, dtype=self.dtype)
        self.linear_v = nn.Dense(self.n_feat, dtype=self.dtype)
        self.linear_out = nn.Dense(self.n_feat, dtype=self.dtype)
        self.drop = nn.Dropout(self.dropout_rate)

    def _heads(self, x):
        b, t, _ = x.shape
        return x.reshape(b, t, self.n_head, self.n_feat // self.n_head
                         ).transpose(0, 2, 1, 3)

    def _attend(self, q, k, v, pos_k, mask, train):
        """q (B,h,T,d), k/v (B,h,S,d), pos_k (T,S,d) or None,
        mask (T,S) bool or None -> (B, T, n_feat)."""
        d_k = self.n_feat // self.n_head
        scores = jnp.einsum("bhtd,bhsd->bhts", q, k)
        if pos_k is not None:
            scores = scores + jnp.einsum("bhtd,tsd->bhts", q,
                                         pos_k.astype(q.dtype))
        # scale and mask in the compute dtype; convert to f32 only AT the
        # softmax input so XLA fuses the convert into the softmax. An
        # earlier `.astype(f32) / sqrt(d_k)` here materialized the whole
        # (B,H,T,S) score tensor in f32 and cost ~6% of chunked-inference
        # throughput (round-5 drift A/B, exp/stft_ab.log + BASELINE.md).
        scores = scores / jnp.asarray(math.sqrt(d_k), scores.dtype)
        if mask is not None:
            scores = jnp.where(mask[None, None], scores,
                               jnp.asarray(-1e9, scores.dtype))
        attn = jax.nn.softmax(scores.astype(jnp.float32), axis=-1
                              ).astype(self.dtype)
        attn = self.drop(attn, deterministic=not train)
        out = jnp.einsum("bhts,bhsd->bhtd", attn, v)
        b, _, t, _ = q.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, t, self.n_feat)
        return self.drop(self.linear_out(out), deterministic=not train)

    def __call__(self, x, pos_k: Optional[jax.Array], train: bool = False,
                 mask: Optional[jax.Array] = None):
        x = self.layer_norm(x)
        q = self._heads(self.linear_q(x))
        k = self._heads(self.linear_k(x))
        v = self._heads(self.linear_v(x))
        return self._attend(q, k, v, pos_k, mask, train)

    def stream(self, x, cache, pos_k, mask):
        """Chunk attention over [cached left context | chunk].

        cache: (k (B,h,L,d), v (B,h,L,d), valid (L,) bool). Returns
        (out, new_cache) — the cache rolls to the last L key positions.
        """
        k_c, v_c, valid = cache
        x = self.layer_norm(x)
        q = self._heads(self.linear_q(x))
        k = self._heads(self.linear_k(x))
        v = self._heads(self.linear_v(x))
        tc = q.shape[2]
        k_all = jnp.concatenate([k_c, k], axis=2)  # (B, h, L+Tc, d)
        v_all = jnp.concatenate([v_c, v], axis=2)
        valid_all = jnp.concatenate(
            [valid, jnp.ones((tc,), bool)])  # (L+Tc,)
        out = self._attend(q, k_all, v_all, pos_k,
                           mask & valid_all[None], train=False)
        l = k_c.shape[2]
        new_cache = (k_all[:, :, -l:], v_all[:, :, -l:], valid_all[-l:])
        return out, new_cache


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

    def setup(self):
        self.layer_norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)
        # scalar GLU: (w0*x + b0) * sigmoid(w1*x + b1)
        self.pw1_w = self.param("pw1_w", nn.initializers.normal(1.0), (2,),
                                jnp.float32)
        self.pw1_b = self.param("pw1_b", nn.initializers.zeros, (2,),
                                jnp.float32)
        self.dw_kernel = self.param(
            "dw_kernel", nn.initializers.lecun_normal(),
            (self.kernel_size, 1, self.input_dim), jnp.float32)
        self.dw_bias = self.param("dw_bias", nn.initializers.zeros,
                                  (self.input_dim,), jnp.float32)
        self.bn = nn.BatchNorm(momentum=0.9, epsilon=1e-5, dtype=self.dtype)
        self.pw2_w = self.param("pw2_w", nn.initializers.ones, (1,),
                                jnp.float32)
        self.pw2_b = self.param("pw2_b", nn.initializers.zeros, (1,),
                                jnp.float32)
        self.drop = nn.Dropout(self.dropout_rate)

    def _glu(self, x):
        a = (self.pw1_w[0].astype(self.dtype) * x
             + self.pw1_b[0].astype(self.dtype))
        g = (self.pw1_w[1].astype(self.dtype) * x
             + self.pw1_b[1].astype(self.dtype))
        return a * jax.nn.sigmoid(g)

    def _dw_conv(self, x, pad):
        # depthwise conv over time, channels last: (B, T, C)
        return jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            self.dw_kernel.astype(self.dtype),
            window_strides=(1,),
            padding=pad,
            dimension_numbers=("NWC", "WIO", "NWC"),
            feature_group_count=self.input_dim,
        ) + self.dw_bias.astype(self.dtype)

    def _post(self, x, train):
        x = nn.relu(self.bn(x, use_running_average=not train))
        x = (self.pw2_w[0].astype(self.dtype) * x
             + self.pw2_b[0].astype(self.dtype))
        return self.drop(x, deterministic=not train)

    def __call__(self, x, train: bool = False):
        x = self._glu(self.layer_norm(x))
        if self.causal:
            pad = [(self.kernel_size - 1, 0)]
        else:
            pad = [((self.kernel_size - 1) // 2, (self.kernel_size - 1) // 2)]
        return self._post(self._dw_conv(x, pad), train)

    def stream(self, x, tail):
        """Chunk forward carrying the last kernel_size-1 GLU outputs.

        A zero initial tail reproduces the causal left zero-padding of
        `__call__`, so chunk chaining == the full causal forward.
        """
        if not self.causal:
            raise ValueError("stream() requires causal=True")
        x = self._glu(self.layer_norm(x))
        full = jnp.concatenate([tail.astype(x.dtype), x], axis=1)
        out = self._post(self._dw_conv(full, [(0, 0)]), train=False)
        # kernel_size=1 carries no context: [-0:] would be the WHOLE array
        keep = self.kernel_size - 1
        return out, full[:, full.shape[1] - keep:]


class EncoderLayer(nn.Module):
    """Conformer block with Macaron residuals + post-LN (conformer.py:329-362)."""

    d_model: int
    n_head: int
    d_ffn: int
    kernel_size: int
    dropout_rate: float
    causal: bool = False
    dtype: Any = jnp.float32

    def setup(self):
        self.feed_forward_in = FeedForward(
            self.d_model, self.d_ffn, self.dropout_rate, dtype=self.dtype)
        self.self_attn = RelPosMultiHeadAttention(
            self.n_head, self.d_model, self.dropout_rate, dtype=self.dtype)
        self.conv = ConvModule(
            self.d_model, self.kernel_size, self.dropout_rate, self.causal,
            dtype=self.dtype)
        self.feed_forward_out = FeedForward(
            self.d_model, self.d_ffn, self.dropout_rate, dtype=self.dtype)
        self.layer_norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)

    def __call__(self, x, pos_k, train: bool = False, mask=None):
        x = x + 0.5 * self.feed_forward_in(x, train)
        x = x + self.self_attn(x, pos_k, train, mask=mask)
        x = x + self.conv(x, train)
        x = x + 0.5 * self.feed_forward_out(x, train)
        return self.layer_norm(x)

    def stream(self, x, state, pos_k, mask):
        """state = (attention kv cache, conv tail)."""
        kv, tail = state
        x = x + 0.5 * self.feed_forward_in(x, train=False)
        a, kv = self.self_attn.stream(x, kv, pos_k, mask)
        x = x + a
        c, tail = self.conv.stream(x, tail)
        x = x + c
        x = x + 0.5 * self.feed_forward_out(x, train=False)
        return self.layer_norm(x), (kv, tail)


def _relpos_band(pe_k, rel: np.ndarray, maxlen: int):
    """pe_k[clip(rel)] via a constant one-hot matmul.

    A direct gather costs a slow TPU gather forward and — far worse in
    training — a duplicate-index scatter-add VJP into the (2*maxlen, d_k)
    table. The distinct offsets form a CONTIGUOUS range, so slice that
    band and expand it with a one-hot matmul (exact: each row sums one
    element); the VJP is another matmul plus a contiguous slice-update.
    """
    t, s = rel.shape
    rel = np.clip(rel, -maxlen, maxlen - 1) + maxlen
    lo, hi = int(rel.min()), int(rel.max())
    width = hi - lo + 1
    onehot = np.zeros((t * s, width), np.float32)
    onehot[np.arange(t * s), (rel - lo).reshape(-1)] = 1.0
    pe_band = jax.lax.dynamic_slice_in_dim(pe_k, lo, width, axis=0)
    return (jnp.asarray(onehot) @ pe_band).reshape(t, s, pe_k.shape[-1])


class ConformerEncoder(nn.Module):
    """Embedding + relative positions + N blocks (conformer.py:107-165).

    ``causal=True`` additionally bands the attention: query t attends keys
    s with 0 <= t - s < left_context (plus the causal depthwise conv) —
    the streamable configuration (`stream` carries per-layer KV caches
    and conv tails; chunk chaining == the full causal forward).
    """

    idim: int = 257
    attention_dim: int = 256
    attention_heads: int = 4
    linear_units: int = 1024
    num_blocks: int = 16
    kernel_size: int = 33
    dropout_rate: float = 0.1
    causal: bool = False
    left_context: int = 128
    relative_pos_emb: bool = True
    maxlen: int = 1000
    dtype: Any = jnp.float32

    def setup(self):
        self.embed_linear = nn.Dense(self.attention_dim, dtype=self.dtype)
        self.embed_norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)
        self.embed_drop = nn.Dropout(self.dropout_rate)
        if self.relative_pos_emb:
            d_k = self.attention_dim // self.attention_heads
            self.pe_k = self.param(
                "pe_k", nn.initializers.normal(1.0), (2 * self.maxlen, d_k),
                jnp.float32)
        self.encoders = [
            EncoderLayer(
                self.attention_dim, self.attention_heads, self.linear_units,
                self.kernel_size, self.dropout_rate, self.causal,
                dtype=self.dtype)
            for _ in range(self.num_blocks)
        ]

    def _embed(self, xs, train):
        xs = self.embed_norm(self.embed_linear(xs))
        return nn.relu(self.embed_drop(xs, deterministic=not train))

    def __call__(self, xs, train: bool = False):
        xs = self._embed(xs, train)
        t = xs.shape[1]
        pos_k = None
        if self.relative_pos_emb:
            rel = np.arange(t)[:, None] - np.arange(t)[None, :]
            pos_k = _relpos_band(self.pe_k, rel, self.maxlen)
        mask = None
        if self.causal:
            rel = np.arange(t)[:, None] - np.arange(t)[None, :]
            mask = jnp.asarray((rel >= 0) & (rel < self.left_context))
        for enc in self.encoders:
            xs = enc(xs, pos_k, train, mask=mask)
        return xs

    # ------------------------------------------------------------- streaming
    def stream(self, xs, state):
        """Chunk forward with carried per-layer (kv cache, conv tail).

        Cache slot j holds absolute position (abs0 - L + j) for a chunk
        starting at abs0; the rel-offset/mask tables depend only on the
        static (chunk, L) shapes, so every chunk reuses one program.
        """
        if not self.causal:
            raise ValueError("stream() requires causal=True")
        xs = self._embed(xs, train=False)
        tc = xs.shape[1]
        l = self.left_context
        # combined key axis = [L cache slots | Tc chunk frames];
        # rel offset of query i to cache slot j is L + i - j, to chunk
        # frame j' is i - j'
        rel = np.concatenate(
            [l + np.arange(tc)[:, None] - np.arange(l)[None, :],
             np.arange(tc)[:, None] - np.arange(tc)[None, :]], axis=1)
        pos_k = (_relpos_band(self.pe_k, rel, self.maxlen)
                 if self.relative_pos_emb else None)
        mask = jnp.asarray((rel >= 0) & (rel < l))
        new_states = []
        for enc, st in zip(self.encoders, state):
            xs, st2 = enc.stream(xs, st, pos_k, mask)
            new_states.append(st2)
        return xs, tuple(new_states)


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
    causal: bool = False
    left_context: int = 128

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
        parser.add_argument("--conformer-causal", action="store_true",
                            help="banded left-context attention + causal "
                                 "conv + cumulative MVN: hop-granular "
                                 "streaming inference with carried KV "
                                 "caches (cli.separate --stream-mode hop)")
        parser.add_argument("--conformer-left-context", type=int, default=128,
                            help="attention window (frames) of the causal "
                                 "model; also the streaming KV cache size")

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
            causal=bool(conf.get("conformer_causal", False)),
            left_context=int(conf.get("conformer_left_context", 128)),
        )

    def setup(self):
        self.conformer = ConformerEncoder(
            idim=self.idim,
            attention_dim=self.attention_dim,
            attention_heads=self.attention_heads,
            linear_units=self.linear_units,
            num_blocks=self.num_blocks,
            kernel_size=self.kernel_size,
            dropout_rate=self.dropout_rate,
            causal=self.causal,
            left_context=self.left_context,
            relative_pos_emb=self.relative_pos_emb,
            dtype=self.compute_dtype,
        )
        self.linear = nn.Dense(self.num_bins * (self.num_spk + self.num_noise),
                               dtype=self.compute_dtype)

    def _mask_head(self, f):
        n_src = self.num_spk + self.num_noise
        masks = nn.relu(self.linear(f)).astype(jnp.float32)
        b, t, _ = masks.shape
        masks = masks.reshape(b, t, n_src, self.num_bins)
        return jnp.transpose(masks, (0, 1, 3, 2))  # (B, T, F, S)

    def __call__(self, f, train: bool = False):
        """f: (B, T, F) magnitude features -> (y_pred, masks).

        y_pred: (B, num_spk, T, F); masks: (B, T, F, num_spk+num_noise).
        """
        f_orig = f
        if self.causal:
            f, _ = cumulative_mvn(f)  # running stats: streamable
        else:
            f = mvn(f, axis=-2)  # conformer.py:95
        f = self.conformer(f.astype(self.compute_dtype), train)
        masks = self._mask_head(f)
        y_pred = jnp.einsum("btfs,btf->bstf", masks[..., : self.num_spk],
                            f_orig[..., : self.num_bins])
        return y_pred, masks

    # ------------------------------------------------------------- streaming
    def stream_init(self, batch: int = 1):
        """Zero carry: running-MVN stats + per-layer (KV cache, conv tail).

        Built from the dataclass config only (callable outside apply).
        """
        zeros_f = jnp.zeros((batch, self.idim), jnp.float32)
        d_k = self.attention_dim // self.attention_heads
        kv = (jnp.zeros((batch, self.attention_heads, self.left_context,
                         d_k), self.compute_dtype),
              jnp.zeros((batch, self.attention_heads, self.left_context,
                         d_k), self.compute_dtype),
              jnp.zeros((self.left_context,), bool))
        tail = jnp.zeros((batch, self.kernel_size - 1, self.attention_dim),
                         self.compute_dtype)
        return {"mvn": (jnp.zeros((), jnp.float32), zeros_f, zeros_f),
                "layers": tuple((kv, tail) for _ in range(self.num_blocks))}

    def stream(self, f, carry):
        """Causal chunk forward: (B, Tc, F), carry -> (masks, new_carry).

        Chained chunk calls reproduce the full-utterance causal
        `__call__` masks (same running MVN, same banded attention via the
        KV cache, same causal conv via the carried tail) — the
        hop-granular streaming path of `executor.hop_streaming`.
        """
        if not self.causal:
            raise ValueError("stream() requires a causal=True model")
        f, mvn_carry = cumulative_mvn(f, carry["mvn"])
        f, layers = self.conformer.stream(f.astype(self.compute_dtype),
                                          carry["layers"])
        return self._mask_head(f), {"mvn": mvn_carry, "layers": layers}


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
