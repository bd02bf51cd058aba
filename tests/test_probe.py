"""Held-out quality probe (trainer/probe.py): checkpoint selection must
track separation quality, not validation MSE (BASELINE.md round 2 measured
val-MSE selection anti-correlated with held-out SI-SNRi)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from css_tpu.data import SyntheticCorpus
from css_tpu.models.blstm import BLSTM
from css_tpu.trainer.probe import HeldOutProbe


@pytest.fixture(scope="module")
def probe_and_model():
    corpus = SyntheticCorpus(num_speakers=4, utts_per_speaker=2, seed=123)
    probe = HeldOutProbe(corpus, sessions=2, session_sec=6.0, seed=123)
    model = BLSTM(hidden_dim=32, num_layers=1)
    feats = jnp.zeros((1, 150, 257), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, feats,
                           train=False)
    return probe, model, variables


def test_probe_finite_and_deterministic(probe_and_model):
    probe, model, variables = probe_and_model
    v1 = probe(model, variables)
    v2 = probe(model, variables)
    assert np.isfinite(v1)
    assert v1 == v2
    # an untrained model cannot beat the IRM oracle (~+10 dB here)
    assert v1 < 10.0


def test_probe_no_recompile_across_params(probe_and_model):
    """New parameter values reuse the compiled program (params are an
    argument, not a closure constant — unlike Separator's serving jit)."""
    probe, model, variables = probe_and_model
    v1 = probe(model, variables)
    bumped = jax.tree.map(lambda x: x + 0.01, variables)
    fn_before = probe._fn
    v2 = probe(model, bumped)
    assert probe._fn is fn_before
    assert v1 != v2  # params actually flowed through


def test_probe_fixed_material(probe_and_model):
    """Sessions are fixed at construction: a second probe with the same
    seed sees identical material (fair comparison across epochs/runs)."""
    probe, _, _ = probe_and_model
    corpus = SyntheticCorpus(num_speakers=4, utts_per_speaker=2, seed=123)
    probe2 = HeldOutProbe(corpus, sessions=2, session_sec=6.0, seed=123)
    np.testing.assert_array_equal(np.asarray(probe.mixes),
                                  np.asarray(probe2.mixes))


def test_probe_three_speakers():
    """K=3 probe runs (round-3 ADVICE: num_spk=3 crashed at the first
    epoch-end probe against hardcoded 2-speaker references)."""
    corpus = SyntheticCorpus(num_speakers=5, utts_per_speaker=2, seed=123)
    probe = HeldOutProbe(corpus, sessions=1, session_sec=4.0, seed=123,
                         num_spk=3)
    model = BLSTM(hidden_dim=16, num_layers=1, num_spk=3)
    feats = jnp.zeros((1, 150, 257), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, feats,
                           train=False)
    assert probe.refs.shape[1] == 3
    assert np.isfinite(probe(model, variables))


def test_probe_spatial_mode():
    """7ch probe: far-field sessions, [mag0, IPD] features, same stitch +
    ch0 resynthesis (round-3 VERDICT next #5 — spatialized models fell
    back to the anti-correlated val loss)."""
    IPD = "1,0;2,0;3,0;4,0;5,0;6,0"
    corpus = SyntheticCorpus(num_speakers=4, utts_per_speaker=2, seed=123)
    probe = HeldOutProbe(corpus, sessions=1, session_sec=4.0, seed=123,
                         mode="spatial", ipd_index=IPD)
    assert probe.mixes.ndim == 3 and probe.mixes.shape[1] == 7
    model = BLSTM(idim=257 * 7, hidden_dim=16, num_layers=1)
    feats = jnp.zeros((1, 150, 257 * 7), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, feats,
                           train=False)
    v1 = probe(model, variables)
    assert np.isfinite(v1)
    # params actually flow through the compiled program
    bumped = jax.tree.map(lambda x: x + 0.01, variables)
    assert probe(model, bumped) != v1


def test_probe_time_mode():
    """Waveform-model probe: windowed forward + per-window PIT SI-SNRi
    (ConvTasNet previously fell back to val loss)."""
    from css_tpu.models.conv_tasnet import ConvTasNet

    corpus = SyntheticCorpus(num_speakers=4, utts_per_speaker=2, seed=123)
    probe = HeldOutProbe(corpus, sessions=1, session_sec=4.0, seed=123,
                         mode="time")
    model = ConvTasNet(num_filters=16, bottleneck_channels=8,
                       conv_channels=8, num_blocks=2, num_layers=1)
    wav = jnp.zeros((1, 4000), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, wav,
                           train=False)
    v1 = probe(model, variables)
    assert np.isfinite(v1)
    bumped = jax.tree.map(lambda x: x + 0.01, variables)
    assert probe(model, bumped) != v1
