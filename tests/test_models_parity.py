"""Numerical parity of the flax models vs the reference torch models
(weights transferred 1:1; eval mode). SURVEY.md §6: "mask allclose vs
reference PyTorch forward" is the parity baseline."""

import sys

import numpy as np
import pytest
import torch

import jax.numpy as jnp

sys.path.insert(0, "/root/reference")


def _randomize_bn_stats(module, rng):
    for m in module.modules():
        if isinstance(m, torch.nn.BatchNorm1d):
            m.running_mean.data = torch.from_numpy(
                rng.standard_normal(m.running_mean.shape).astype(np.float32) * 0.1)
            m.running_var.data = torch.from_numpy(
                (1.0 + 0.1 * rng.standard_normal(m.running_var.shape)).astype(
                    np.float32).clip(0.5))


@pytest.mark.slow
def test_conformer_parity():
    from css.models.conformer import Conformer as RefConformer

    from css_tpu.models.conformer import Conformer, params_from_torch

    torch.manual_seed(0)
    conf = {
        "attention_dim": 64, "attention_heads": 2, "linear_units": 96,
        "num_blocks": 2, "kernel_size": 5, "dropout_rate": 0.0,
        "relative_pos_emb": True,
    }
    ref = RefConformer(in_features=33, num_bins=33, num_spk=2, num_noise=1,
                       conformer_conf=conf).eval()
    rng = np.random.default_rng(0)
    _randomize_bn_stats(ref, rng)

    x = rng.standard_normal((3, 24, 33)).astype(np.float32)
    with torch.no_grad():
        y_ref, masks_ref = ref(torch.from_numpy(x))

    model = Conformer(idim=33, num_bins=33, num_spk=2, num_noise=1,
                      attention_dim=64, attention_heads=2, linear_units=96,
                      num_blocks=2, kernel_size=5, dropout_rate=0.0)
    variables = params_from_torch(ref.state_dict(), num_blocks=2)
    y, masks = model.apply(variables, jnp.asarray(x), train=False)

    np.testing.assert_allclose(np.asarray(y), y_ref.numpy(), atol=2e-4, rtol=1e-3)
    for s in range(3):
        np.testing.assert_allclose(
            np.asarray(masks[..., s]), masks_ref[s].numpy(), atol=2e-4, rtol=1e-3)


def test_blstm_parity():
    from css.models.blstm import BLSTM as RefBLSTM

    from css_tpu.models.blstm import BLSTM, params_from_torch

    torch.manual_seed(1)
    conf = {"hidden_dim": 32, "num_layers": 2, "dropout_rate": 0.0}
    ref = RefBLSTM(in_features=21, num_bins=21, num_spk=2, num_noise=1,
                   blstm_conf=conf).eval()
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 19, 21)).astype(np.float32)
    with torch.no_grad():
        y_ref, masks_ref = ref(torch.from_numpy(x))

    model = BLSTM(idim=21, num_bins=21, num_spk=2, num_noise=1,
                  hidden_dim=32, num_layers=2, dropout_rate=0.0)
    variables = params_from_torch(ref.state_dict(), num_layers=2)
    y, masks = model.apply(variables, jnp.asarray(x), train=False)

    np.testing.assert_allclose(np.asarray(y), y_ref.numpy(), atol=2e-4, rtol=1e-3)
    for s in range(3):
        np.testing.assert_allclose(
            np.asarray(masks[..., s]), masks_ref[s].numpy(), atol=2e-4, rtol=1e-3)


@pytest.mark.parametrize("norm", ["gln", "cln"])
def test_conv_tasnet_parity(norm):
    from css.models.conv_tasnet import ConvTasNet as RefConvTasNet

    from css_tpu.models.conv_tasnet import ConvTasNet, params_from_torch

    torch.manual_seed(2)
    conf = {
        "num_filters": 16, "filter_length": 8, "bottleneck_channels": 12,
        "conv_channels": 16, "kernel_size": 3, "num_blocks": 3,
        "num_layers": 2, "norm": norm,
    }
    ref = RefConvTasNet(num_spk=2, num_noise=1, conv_tasnet_conf=conf).eval()
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 512)).astype(np.float32) * 0.1
    with torch.no_grad():
        y_ref = ref(torch.from_numpy(x))

    model = ConvTasNet(num_spk=2, num_noise=1, num_filters=16, filter_length=8,
                       bottleneck_channels=12, conv_channels=16, kernel_size=3,
                       num_blocks=3, num_layers=2, norm=norm)
    variables = params_from_torch(ref.state_dict(), num_layers=2, num_blocks=3,
                                  norm=norm)
    y = model.apply(variables, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(y), y_ref.numpy(), atol=1e-4, rtol=1e-3)


@pytest.mark.slow
def test_models_init_and_train_mode_run():
    """Fresh init + train-mode forward (dropout/BN) works for all models."""
    import jax

    from css_tpu.models import MODELS

    rng = np.random.default_rng(3)
    key = jax.random.PRNGKey(0)
    f = jnp.asarray(rng.standard_normal((2, 16, 33)).astype(np.float32))

    conformer = MODELS["Conformer"](idim=33, num_bins=33, attention_dim=32,
                                    attention_heads=2, linear_units=48,
                                    num_blocks=1, kernel_size=5)
    variables = conformer.init({"params": key, "dropout": key}, f, train=True)
    (y, m), updates = conformer.apply(
        variables, f, train=True, rngs={"dropout": key},
        mutable=["batch_stats"])
    assert y.shape == (2, 2, 16, 33) and m.shape == (2, 16, 33, 3)

    blstm = MODELS["BLSTM"](idim=33, num_bins=33, hidden_dim=16, num_layers=1)
    variables = blstm.init({"params": key, "dropout": key}, f, train=True)
    y, m = blstm.apply(variables, f, train=True, rngs={"dropout": key})
    assert y.shape == (2, 2, 16, 33)

    wav = jnp.asarray(rng.standard_normal((2, 256)).astype(np.float32))
    tasnet = MODELS["ConvTasNet"](num_filters=8, filter_length=8,
                                  bottleneck_channels=8, conv_channels=8,
                                  num_blocks=2, num_layers=1)
    variables = tasnet.init({"params": key}, wav, train=True)
    y = tasnet.apply(variables, wav, train=True)
    assert y.shape[0] == 2 and y.shape[1] == 2
