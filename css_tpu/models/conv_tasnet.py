"""Conv-TasNet time-domain separator (TPU-native).

Re-design of css/models/conv_tasnet.py:17-329: learned conv encoder,
channelwise LayerNorm + 1x1 bottleneck, R repeats of X dilated depthwise
residual blocks, mask head, transposed-conv decoder. All convs are
lax.conv_general_dilated with channels-last layout (XLA maps pointwise
convs onto the MXU and the dilated depthwise convs onto the VPU).

Returns only the speaker outputs, dropping the trailing noise stream
(conv_tasnet.py:155).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from css_tpu.models.base import MODELS

DEFAULT_CONV_TASNET_CONF = {
    "num_filters": 512,
    "filter_length": 16,
    "bottleneck_channels": 128,
    "conv_channels": 512,
    "kernel_size": 3,
    "num_blocks": 8,
    "num_layers": 3,
}


def global_layer_norm(x, scale, bias, eps=1e-5):
    """gLN over (channel, time) jointly (conv_tasnet.py:158-197); x: (B, T, C)."""
    mean = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=(1, 2), keepdims=True)
    return scale * (x - mean) / jnp.sqrt(var + eps) + bias


class Norm(nn.Module):
    """'gln' | 'cln' norms of the reference (conv_tasnet.py:223-231).

    'cln' in that codebase is channelwise LayerNorm (normalize over C per
    frame), not a cumulative norm.
    """

    kind: str
    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.kind == "cln":
            return nn.LayerNorm(name="ln", epsilon=1e-5, dtype=self.dtype)(x)
        if self.kind == "gln":
            scale = self.param("scale", nn.initializers.ones, (self.dim,), jnp.float32)
            bias = self.param("bias", nn.initializers.zeros, (self.dim,), jnp.float32)
            return global_layer_norm(x, scale.astype(x.dtype), bias.astype(x.dtype))
        raise ValueError(f"unknown norm {self.kind!r}")


def prelu(x, a):
    return jnp.where(x >= 0, x, a * x)


class Conv1DBlock(nn.Module):
    """Dilated depthwise residual block (conv_tasnet.py:274-329)."""

    in_channels: int
    out_channels: int
    kernel_size: int
    dilation: int
    norm: str
    causal: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = nn.Dense(self.out_channels, name="conv1x1", dtype=self.dtype)(x)
        a1 = self.param("prelu1_a", nn.initializers.constant(0.25), (1,), jnp.float32)
        c = prelu(c, a1.astype(c.dtype))
        c = Norm(self.norm, self.out_channels, name="norm_1", dtype=self.dtype)(c)
        pad = self.dilation * (self.kernel_size - 1)
        padding = [(pad, 0)] if self.causal else [(pad // 2, pad // 2)]
        dw = self.param("dw_kernel", nn.initializers.lecun_normal(),
                        (self.kernel_size, 1, self.out_channels), jnp.float32)
        dw_b = self.param("dw_bias", nn.initializers.zeros,
                          (self.out_channels,), jnp.float32)
        c = jax.lax.conv_general_dilated(
            c, dw.astype(c.dtype), window_strides=(1,), padding=padding,
            rhs_dilation=(self.dilation,),
            dimension_numbers=("NWC", "WIO", "NWC"),
            feature_group_count=self.out_channels,
        ) + dw_b.astype(c.dtype)
        a2 = self.param("prelu2_a", nn.initializers.constant(0.25), (1,), jnp.float32)
        c = prelu(c, a2.astype(c.dtype))
        c = Norm(self.norm, self.out_channels, name="norm_2", dtype=self.dtype)(c)
        c = nn.Dense(self.in_channels, name="sc_conv", dtype=self.dtype)(c)
        return x + c


@MODELS.register("ConvTasNet")
class ConvTasNet(nn.Module):
    """Waveform -> separated waveforms (css/models/conv_tasnet.py:17-155)."""

    num_spk: int = 2
    num_noise: int = 1
    num_filters: int = 256
    filter_length: int = 16
    bottleneck_channels: int = 128
    conv_channels: int = 256
    kernel_size: int = 3
    num_blocks: int = 8
    num_layers: int = 3
    norm: str = "gln"
    activate: str = "relu"
    causal: bool = False
    compute_dtype: Any = jnp.float32

    @staticmethod
    def add_args(parser):
        parser.add_argument("--conv-tasnet-num-filters", type=int, default=256)
        parser.add_argument("--conv-tasnet-filter-length", type=int, default=16)
        parser.add_argument("--conv-tasnet-bottleneck-channels", type=int, default=128)
        parser.add_argument("--conv-tasnet-conv-channels", type=int, default=256)
        parser.add_argument("--conv-tasnet-kernel-size", type=int, default=3)
        parser.add_argument("--conv-tasnet-num-blocks", type=int, default=8)
        parser.add_argument("--conv-tasnet-num-layers", type=int, default=3)
        parser.add_argument("--conv-tasnet-norm", type=str, default="gln",
                            choices=["gln", "cln"])

    @classmethod
    def build_model(cls, conf):
        return cls(
            num_spk=int(conf.get("num_spk", 2)),
            num_noise=int(conf.get("num_noise", 1)),
            num_filters=int(conf.get("conv_tasnet_num_filters", 256)),
            filter_length=int(conf.get("conv_tasnet_filter_length", 16)),
            bottleneck_channels=int(conf.get("conv_tasnet_bottleneck_channels", 128)),
            conv_channels=int(conf.get("conv_tasnet_conv_channels", 256)),
            kernel_size=int(conf.get("conv_tasnet_kernel_size", 3)),
            num_blocks=int(conf.get("conv_tasnet_num_blocks", 8)),
            num_layers=int(conf.get("conv_tasnet_num_layers", 3)),
            norm=conf.get("conv_tasnet_norm", "gln"),
            compute_dtype=jnp.bfloat16 if conf.get("bf16") else jnp.float32,
        )

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: (B, N) waveform -> (B, num_spk, N') separated waveforms."""
        if x.ndim == 1:
            x = x[None]
        n_src = self.num_spk + self.num_noise
        stride = self.filter_length // 2
        x = x[..., None].astype(self.compute_dtype)  # (B, N, 1)
        enc_k = self.param("encoder_kernel", nn.initializers.lecun_normal(),
                           (self.filter_length, 1, self.num_filters), jnp.float32)
        enc_b = self.param("encoder_bias", nn.initializers.zeros,
                           (self.num_filters,), jnp.float32)
        w = jax.lax.conv_general_dilated(
            x, enc_k.astype(x.dtype), window_strides=(stride,), padding=[(0, 0)],
            dimension_numbers=("NWC", "WIO", "NWC"),
        ) + enc_b.astype(x.dtype)  # (B, T, N)
        e = Norm("cln", self.num_filters, name="layer_n_s",
                 dtype=self.compute_dtype)(w)
        e = nn.Dense(self.bottleneck_channels, name="bottleneck",
                     dtype=self.compute_dtype)(e)
        for r in range(self.num_layers):
            for b_i in range(self.num_blocks):
                e = Conv1DBlock(
                    self.bottleneck_channels, self.conv_channels,
                    self.kernel_size, 2 ** b_i, self.norm, self.causal,
                    name=f"separation_{r}_{b_i}", dtype=self.compute_dtype)(e)
        m = nn.Dense(n_src * self.num_filters, name="gen_masks",
                     dtype=self.compute_dtype)(e)  # (B, T, S*N)
        bsz, t, _ = m.shape
        m = m.reshape(bsz, t, n_src, self.num_filters)
        if self.activate == "relu":
            m = nn.relu(m)
        elif self.activate == "sigmoid":
            m = jax.nn.sigmoid(m)
        else:
            m = jax.nn.softmax(m, axis=2)
        d = w[:, :, None, :] * m  # (B, T, S, N)
        dec_k = self.param("decoder_kernel", nn.initializers.lecun_normal(),
                           (self.filter_length, self.num_filters, 1), jnp.float32)
        dec_b = self.param("decoder_bias", nn.initializers.zeros, (1,), jnp.float32)
        # Transposed conv decoder per source, written as a fractionally
        # strided conv: dilate input by `stride`, pad L-1, correlate with the
        # time-flipped kernel — exactly torch ConvTranspose1d(padding=0).
        d = jnp.transpose(d, (0, 2, 1, 3)).reshape(bsz * n_src, t, self.num_filters)
        s = jax.lax.conv_general_dilated(
            d, jnp.flip(dec_k, axis=0).astype(d.dtype),
            window_strides=(1,),
            padding=[(self.filter_length - 1, self.filter_length - 1)],
            lhs_dilation=(stride,),
            dimension_numbers=("NWC", "WIO", "NWC"),
        ) + dec_b.astype(d.dtype)  # (B*S, N', 1)
        s = s[..., 0].reshape(bsz, n_src, -1).astype(jnp.float32)
        return s[:, : self.num_spk]  # drop noise stream (conv_tasnet.py:155)


def params_from_torch(state_dict, num_layers: int = 3, num_blocks: int = 8,
                      norm: str = "gln"):
    """Convert a reference torch ConvTasNet state_dict to flax variables."""

    def t(name):
        return np.asarray(state_dict[name].detach().cpu().numpy())

    def dense_from_conv1x1(prefix):
        # torch conv1d 1x1 weight (O, I, 1) -> dense kernel (I, O)
        return {"kernel": t(f"{prefix}.weight")[:, :, 0].T,
                "bias": t(f"{prefix}.bias")}

    def norm_params(prefix, kind):
        if kind == "cln":
            return {"ln": {"scale": t(f"{prefix}.weight"),
                           "bias": t(f"{prefix}.bias")}}
        return {"scale": t(f"{prefix}.weight").reshape(-1),
                "bias": t(f"{prefix}.bias").reshape(-1)}

    params = {
        # encoder conv (N, 1, L) -> (L, 1, N)
        "encoder_kernel": t("encoder.weight").transpose(2, 1, 0),
        "encoder_bias": t("encoder.bias"),
        "layer_n_s": norm_params("LayerN_S", "cln"),
        "bottleneck": dense_from_conv1x1("BottleN_S"),
        "gen_masks": dense_from_conv1x1("gen_masks"),
        # decoder ConvTranspose1d weight (in=N, out=1, L) -> WIO (L, N, 1)
        "decoder_kernel": t("decoder.weight").transpose(2, 0, 1),
        "decoder_bias": t("decoder.bias"),
    }
    for r in range(num_layers):
        for b_i in range(num_blocks):
            p = f"separation.{r}.{b_i}"
            params[f"separation_{r}_{b_i}"] = {
                "conv1x1": dense_from_conv1x1(f"{p}.conv1x1"),
                "prelu1_a": t(f"{p}.PReLU_1.weight"),
                "norm_1": norm_params(f"{p}.norm_1", norm),
                "dw_kernel": t(f"{p}.dwconv.weight").transpose(2, 1, 0),
                "dw_bias": t(f"{p}.dwconv.bias"),
                "prelu2_a": t(f"{p}.PReLU_2.weight"),
                "norm_2": norm_params(f"{p}.norm_2", norm),
                "sc_conv": dense_from_conv1x1(f"{p}.Sc_conv"),
            }
    return {"params": params}
