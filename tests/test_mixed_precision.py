"""bf16 compute path: models keep fp32 params, compute in bfloat16."""

import numpy as np

import jax
import jax.numpy as jnp

from css_tpu.data import SyntheticCorpus
from css_tpu.data.mixer import MixtureSynthesizer
from css_tpu.models.blstm import BLSTM
from css_tpu.models.conformer import Conformer
from css_tpu.objectives.mse import MeanSquaredError
from css_tpu.trainer import LRSchedule, Trainer
import pytest


def test_bf16_training_step_is_finite_and_params_fp32():
    model = BLSTM(idim=257, num_bins=257, hidden_dim=32, num_layers=1,
                  dropout_rate=0.0, compute_dtype=jnp.bfloat16)
    trainer = Trainer(model, MeanSquaredError(), LRSchedule(lr=1e-3),
                      optim="adam", grad_thresh=5.0)
    corpus = SyntheticCorpus(num_speakers=4, utts_per_speaker=2,
                             min_dur=2.5, max_dur=4.0)
    loader = MixtureSynthesizer(corpus, batch_size=4, min_window=2.0,
                                max_window=2.0, seed=0)
    rng = jax.random.PRNGKey(0)
    state = trainer.init_state(rng, next(loader))
    for leaf in jax.tree.leaves(state.params):
        assert leaf.dtype == jnp.float32  # fp32 master params
    state, m = trainer._train_step(state, next(loader), rng)
    assert np.isfinite(float(m["loss"]))
    state, m2 = trainer._train_step(state, next(loader), rng)
    assert np.isfinite(float(m2["loss"]))


@pytest.mark.slow
def test_bf16_forward_close_to_fp32():
    rng = np.random.default_rng(0)
    f = jnp.asarray(rng.uniform(0, 1, (2, 30, 257)).astype(np.float32))
    kw = dict(idim=257, num_bins=257, attention_dim=32, attention_heads=2,
              linear_units=48, num_blocks=1, kernel_size=5, dropout_rate=0.0)
    m32 = Conformer(**kw)
    variables = m32.init({"params": jax.random.PRNGKey(0)}, f, train=False)
    m16 = Conformer(**kw, compute_dtype=jnp.bfloat16)
    y32, k32 = m32.apply(variables, f, train=False)
    y16, k16 = m16.apply(variables, f, train=False)
    assert y16.dtype == jnp.float32  # outputs are upcast
    # bf16 has ~3 decimal digits; relative agreement is coarse but bounded
    denom = np.abs(np.asarray(y32)).max() + 1e-6
    assert np.abs(np.asarray(y16) - np.asarray(y32)).max() / denom < 0.1
