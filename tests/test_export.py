"""StableHLO export/serve path vs the live-model path."""

import numpy as np

import jax
import jax.numpy as jnp

from css_tpu.cli.export import export_forward, load_exported
from css_tpu.executor.separator import Separator
from css_tpu.models.blstm import BLSTM


def _model_and_vars():
    model = BLSTM(idim=257, num_bins=257, hidden_dim=16, num_layers=1,
                  dropout_rate=0.0)
    f = jnp.zeros((1, 10, 257))
    variables = model.init({"params": jax.random.PRNGKey(0)}, f, train=False)
    return model, variables


def test_exported_forward_matches_live(tmp_path):
    model, variables = _model_and_vars()
    blob = export_forward(model, variables, batch_size=4, num_frames=150,
                          feature_dim=257)
    path = tmp_path / "fwd.stablehlo"
    path.write_bytes(blob)
    call = load_exported(path)

    rng = np.random.default_rng(0)
    f = jnp.asarray(rng.uniform(0, 1, (4, 150, 257)).astype(np.float32))
    got = np.asarray(call(f))
    out = model.apply(variables, f, train=False)
    ref = np.asarray(jnp.minimum(out[1], 1.0))
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_separator_exported_backend_matches_live(tmp_path):
    model, variables = _model_and_vars()
    blob = export_forward(model, variables, batch_size=4, num_frames=150,
                          feature_dim=257)
    path = tmp_path / "fwd.stablehlo"
    path.write_bytes(blob)

    rng = np.random.default_rng(1)
    wav = rng.standard_normal(16000 * 6).astype(np.float32) * 0.05
    live = Separator(model, variables, batch_size=4)
    masks_live, mags_live = live.separate(wav)
    served = Separator(None, None, exported_path=str(path), batch_size=4)
    masks_exp, mags_exp = served.separate(wav)
    np.testing.assert_allclose(masks_exp, masks_live, atol=1e-5)
    np.testing.assert_allclose(mags_exp, mags_live, atol=1e-5)
