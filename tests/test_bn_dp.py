"""BatchNorm under data parallelism: sharded-batch statistics must equal
single-device statistics (SURVEY.md §7 hard-part 7 — the reference's
ConvModule BatchNorm would need explicit cross-replica sync in DDP; with
jit-sharded batches XLA computes the global batch mean automatically)."""

import numpy as np

import jax
import jax.numpy as jnp

from css_tpu.data import SyntheticCorpus
from css_tpu.data.mixer import MixtureSynthesizer
from css_tpu.models.conformer import Conformer
from css_tpu.objectives.mse import MeanSquaredError
from css_tpu.parallel import DataParallel, make_mesh
from css_tpu.trainer import LRSchedule, Trainer
import pytest


@pytest.mark.slow
def test_conformer_batchnorm_stats_match_across_dp():
    model = Conformer(idim=257, num_bins=257, attention_dim=32,
                      attention_heads=2, linear_units=48, num_blocks=1,
                      kernel_size=5, dropout_rate=0.0)
    corpus = SyntheticCorpus(num_speakers=4, utts_per_speaker=2,
                             min_dur=2.5, max_dur=4.0)
    loader = MixtureSynthesizer(corpus, batch_size=8, min_window=2.0,
                                max_window=2.0, seed=0)
    batch = next(loader)
    rng = jax.random.PRNGKey(0)

    def make_trainer():
        return Trainer(model, MeanSquaredError(), LRSchedule(lr=1e-3),
                       optim="sgd", grad_thresh=5.0)

    t1 = make_trainer()
    s1 = t1.init_state(rng, batch)
    s1, m1 = t1._train_step(s1, dict(batch), rng)

    dp = DataParallel(make_trainer(), make_mesh())
    s2 = dp.init_state(rng, batch)
    s2, m2 = dp.train_step(s2, dict(batch), rng)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    bn1 = s1.batch_stats["conformer"]["encoders_0"]["conv"]["bn"]
    bn2 = s2.batch_stats["conformer"]["encoders_0"]["conv"]["bn"]
    np.testing.assert_allclose(np.asarray(bn1["mean"]), np.asarray(bn2["mean"]),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(bn1["var"]), np.asarray(bn2["var"]),
                               atol=1e-6)
