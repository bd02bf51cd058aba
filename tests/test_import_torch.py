"""Round-trip: reference torch .mdl -> css_tpu checkpoint -> forward parity."""

from css_tpu.trainer.checkpoint import load_checkpoint
import sys

import numpy as np
import torch

import jax.numpy as jnp

sys.path.insert(0, "/root/reference")


def test_import_reference_blstm_checkpoint(tmp_path):
    from css.models.blstm import BLSTM as RefBLSTM

    from css_tpu.cli import import_torch
    from css_tpu.models.blstm import BLSTM

    torch.manual_seed(0)
    ref = RefBLSTM(in_features=33, num_bins=33, num_spk=2, num_noise=1,
                   blstm_conf={"hidden_dim": 16, "num_layers": 1,
                               "dropout_rate": 0.0}).eval()
    mdl = {"model": ref.state_dict(), "epoch": 7, "loss": 0.5,
           "objective": {}, "optimizer": {}, "lr_sched": {}}
    src = tmp_path / "7.1.mdl"
    torch.save(mdl, src)

    dst = tmp_path / "imported.mdl"
    import_torch.main([str(src), str(dst), "--model", "BLSTM",
                       "--num-layers", "1"])
    ckpt = load_checkpoint(dst)
    assert ckpt["epoch"] == 7

    model = BLSTM(idim=33, num_bins=33, hidden_dim=16, num_layers=1,
                  dropout_rate=0.0)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 12, 33)).astype(np.float32)
    y, masks = model.apply({"params": ckpt["params"]}, jnp.asarray(x),
                           train=False)
    with torch.no_grad():
        y_ref, masks_ref = ref(torch.from_numpy(x))
    np.testing.assert_allclose(np.asarray(y), y_ref.numpy(), atol=2e-4,
                               rtol=1e-3)
