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
from css_tpu.ops.features import cumulative_mvn, mvn

DEFAULT_BLSTM_CONF = {"hidden_dim": 512, "num_layers": 4, "dropout_rate": 0.1}


def lstm_scan(xw: jax.Array, w_hh: jax.Array, hidden: int,
              reverse: bool = False, use_pallas: bool = False,
              differentiable: bool = False, state=None,
              return_state: bool = False):
    """Run an LSTM over precomputed input projections.

    xw: (B, T, 4h) = x @ W_ih^T + b_ih + b_hh; w_hh: (4h, h) transposed to
    (h, 4h) by the caller. Gate order i, f, g, o (torch convention).

    ``use_pallas`` routes eval-path calls to the fused Pallas recurrence
    (whole time loop in one kernel, weights resident in VMEM) on TPU
    backends when the shapes tile cleanly; training keeps this scan,
    whose VJP XLA derives for free.

    ``state`` is an optional initial (h, c) — the carried recurrent state
    of streaming inference; ``return_state=True`` additionally returns the
    final (h, c) (forward direction only — a reverse scan has no causal
    carry to chain).
    """
    if (use_pallas and not differentiable and state is None
            and not return_state
            and jax.default_backend() in ("tpu", "axon")):
        # eval-path only: the fused TRAINING variant measured 0.5-0.6x
        # the XLA scan's free VJP on hardware and was deleted
        # (ops/lstm_pallas.py docstring)
        from css_tpu.ops.lstm_pallas import lstm_fused, supported

        if supported(xw.shape[0], hidden, xw.dtype):
            return lstm_fused(xw, w_hh, hidden, reverse=reverse)
    b = xw.shape[0]
    if state is None:
        state = (jnp.zeros((b, hidden), xw.dtype),
                 jnp.zeros((b, hidden), xw.dtype))

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
    final, hs = jax.lax.scan(step, tuple(state), xs, reverse=reverse)
    hs = jnp.swapaxes(hs, 0, 1)  # (B, T, h)
    return (hs, final) if return_state else hs


class BiLSTMLayer(nn.Module):
    """One (bi)directional LSTM + LayerNorm + dropout (blstm.py:131-160).

    ``causal=True`` drops the backward direction and widens the forward
    LSTM to the full layer width — the recurrent streaming configuration
    (hop-granular inference with carried (h, c) state via ``stream``).
    """

    h_dim: int
    dropout_rate: float
    dtype: Any = jnp.float32
    causal: bool = False

    def setup(self):
        hidden = self.h_dim if self.causal else self.h_dim // 2
        dirs = ("fwd",) if self.causal else ("fwd", "bwd")
        self._weights = tuple(
            (d,
             self.param(f"w_ih_{d}", nn.initializers.lecun_normal(),
                        (4 * hidden, self.h_dim), jnp.float32),
             self.param(f"w_hh_{d}", nn.initializers.orthogonal(),
                        (4 * hidden, hidden), jnp.float32),
             self.param(f"b_{d}", nn.initializers.zeros,
                        (4 * hidden,), jnp.float32))
            for d in dirs)
        self._hidden = hidden
        self.layer_norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)
        self.dropout = nn.Dropout(self.dropout_rate)

    def __call__(self, x, train: bool = False):
        outs = []
        for direction, w_ih, w_hh, b in self._weights:
            xw = x @ w_ih.T.astype(self.dtype) + b.astype(self.dtype)
            outs.append(
                lstm_scan(xw, w_hh.T.astype(self.dtype), self._hidden,
                          reverse=(direction == "bwd"),
                          use_pallas=True, differentiable=train)
            )
        x = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=-1)
        x = self.layer_norm(x)
        return self.dropout(x, deterministic=not train)

    def stream(self, x, state):
        """Causal chunk forward carrying (h, c); eval-path (no dropout)."""
        if not self.causal:
            raise ValueError("stream() requires causal=True")
        (_, w_ih, w_hh, b), = self._weights
        xw = x @ w_ih.T.astype(self.dtype) + b.astype(self.dtype)
        hs, new_state = lstm_scan(xw, w_hh.T.astype(self.dtype),
                                  self._hidden, state=state,
                                  return_state=True)
        return self.layer_norm(hs), new_state


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
    causal: bool = False

    @staticmethod
    def add_args(parser):
        add_common_mask_args(parser)
        parser.add_argument("--blstm-hdim", type=int, default=1024)
        parser.add_argument("--blstm-num-layers", type=int, default=3)
        parser.add_argument("--blstm-dropout-rate", type=float, default=0.1)
        parser.add_argument("--blstm-causal", action="store_true",
                            help="unidirectional LSTM + cumulative MVN: "
                                 "hop-granular streaming inference with "
                                 "carried state (cli.separate "
                                 "--stream-mode hop)")

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
            causal=bool(conf.get("blstm_causal", False)),
        )

    def setup(self):
        self.embed_linear = nn.Dense(self.hidden_dim,
                                     dtype=self.compute_dtype)
        self.embed_norm = nn.LayerNorm(epsilon=1e-5, dtype=self.compute_dtype)
        self.embed_dropout = nn.Dropout(self.dropout_rate)
        self.encoders = [
            BiLSTMLayer(self.hidden_dim, self.dropout_rate,
                        dtype=self.compute_dtype, causal=self.causal)
            for _ in range(self.num_layers)
        ]
        self.linear = nn.Dense(self.num_bins * (self.num_spk + self.num_noise),
                               dtype=self.compute_dtype)

    def _mask_head(self, f):
        n_src = self.num_spk + self.num_noise
        masks = nn.relu(self.linear(f)).astype(jnp.float32)
        b, t, _ = masks.shape
        masks = masks.reshape(b, t, n_src, self.num_bins)
        return jnp.transpose(masks, (0, 1, 3, 2))  # (B, T, F, S)

    def __call__(self, f, train: bool = False):
        """f: (B, T, F) -> (y_pred (B, num_spk, T, F), masks (B, T, F, S))."""
        f_orig = f
        if self.causal:
            f, _ = cumulative_mvn(f)  # running stats: streamable
        else:
            f = mvn(f, axis=-2)  # blstm.py:80
        f = f.astype(self.compute_dtype)
        f = nn.relu(self.embed_dropout(
            self.embed_norm(self.embed_linear(f)), deterministic=not train))
        for enc in self.encoders:
            f = enc(f, train)
        masks = self._mask_head(f)
        y_pred = jnp.einsum("btfs,btf->bstf", masks[..., : self.num_spk],
                            f_orig[..., : self.num_bins])
        return y_pred, masks

    # ------------------------------------------------------------- streaming
    def stream_init(self, batch: int = 1):
        """Zero carry for `stream`: running-MVN stats + per-layer (h, c)."""
        dt = self.compute_dtype
        zeros_f = jnp.zeros((batch, self.idim), jnp.float32)
        layers = tuple(
            (jnp.zeros((batch, self.hidden_dim), dt),
             jnp.zeros((batch, self.hidden_dim), dt))
            for _ in range(self.num_layers))
        return {"mvn": (jnp.zeros((), jnp.float32), zeros_f, zeros_f),
                "layers": layers}

    def stream(self, f, carry):
        """Causal chunk forward: (B, Tc, F), carry -> (masks, new_carry).

        Chained chunk calls reproduce the full-utterance `__call__` masks
        exactly (same running-MVN math, same recurrence) — the hop-granular
        streaming path of `executor.hop_streaming`.
        """
        if not self.causal:
            raise ValueError("stream() requires a causal=True model")
        f, mvn_carry = cumulative_mvn(f, carry["mvn"])
        f = f.astype(self.compute_dtype)
        f = nn.relu(self.embed_norm(self.embed_linear(f)))
        states = []
        for enc, st in zip(self.encoders, carry["layers"]):
            f, st2 = enc.stream(f, st)
            states.append(st2)
        return self._mask_head(f), {"mvn": mvn_carry,
                                    "layers": tuple(states)}


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
