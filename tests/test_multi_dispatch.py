"""Multi-step dispatch: G scanned steps == G single-step programs.

`Trainer.train_one_epoch(steps_per_dispatch=G)` stacks G same-shape
batches and runs them as one lax.scan program (dispatch amortization for
hosts where a jit call costs milliseconds). These tests pin the contract:
G>1 must be STEP-FOR-STEP identical to G=1 — params, optimizer state,
BatchNorm stats, step counter — including when the epoch length leaves a
remainder group and when the loader yields mixed shapes (fallback path).
"""

import itertools

import numpy as np
import pytest

import jax

from css_tpu.data import SyntheticCorpus
from css_tpu.data.mixer import MixtureSynthesizer
from css_tpu.models.blstm import BLSTM
from css_tpu.models.conformer import Conformer
from css_tpu.objectives.mse import MeanSquaredError
from css_tpu.trainer import LRSchedule, Trainer


def _trainer(model):
    # sgd: updates are LINEAR in the gradients, so scan-vs-unrolled XLA
    # rounding differences stay at f32 epsilon and strict parity holds
    # (adam's m/sqrt(v) amplifies 1e-7 grad rounding to ~lr-scale diffs
    # on near-zero-gradient params — measured, not a wiring bug)
    sched = LRSchedule(lr=1e-3, warmup=2, fixed=0, decay=0.0)
    return Trainer(model, MeanSquaredError(), sched, optim="sgd",
                   grad_thresh=5.0, input_domain="stft")


def _fixed_batches(n, batch_size=4, win=32000, seed=0):
    host = np.random.default_rng(seed)
    return [
        {"mix": host.standard_normal((batch_size, win)).astype(np.float32) * 0.1,
         "source1": host.standard_normal((batch_size, win)).astype(np.float32) * 0.05,
         "source2": host.standard_normal((batch_size, win)).astype(np.float32) * 0.05,
         "ovl": np.float32(0.5)}
        for _ in range(n)
    ]


def _copy_batches(batches):
    return [dict(b) for b in batches]


def _run(trainer, state, batches, g):
    rng = jax.random.PRNGKey(7)
    state, avg = trainer.train_one_epoch(
        state, iter(_copy_batches(batches)), len(batches), rng,
        steps_per_dispatch=g)
    return state, avg


def _assert_states_equal(s1, s2):
    assert int(s1.step) == int(s2.step)
    for a, b in zip(jax.tree.leaves((s1.params, s1.batch_stats, s1.opt_state)),
                    jax.tree.leaves((s2.params, s2.batch_stats, s2.opt_state))):
        np.testing.assert_allclose(np.asarray(a, np.float64),
                                   np.asarray(b, np.float64),
                                   rtol=2e-5, atol=2e-6)


@pytest.mark.parametrize("g", [3, 7])
@pytest.mark.slow
def test_scanned_steps_match_single_dispatch(g):
    """7 batches with G=3 (2 full groups + remainder 1) and G=7 (one
    group) must reproduce the G=1 trajectory exactly — dropout keys come
    from fold_in(step) inside the program, so grouping is invisible.
    Conformer exercises BatchNorm batch_stats through the scan carry."""
    model = Conformer(idim=257, num_bins=257, attention_dim=32,
                      attention_heads=2, linear_units=64, num_blocks=2,
                      dropout_rate=0.1)
    batches = _fixed_batches(7)
    trainer1 = _trainer(model)
    state1 = trainer1.init_state(jax.random.PRNGKey(0), dict(batches[0]))
    state1, avg1 = _run(trainer1, state1, batches, 1)

    trainer2 = _trainer(model)
    state2 = trainer2.init_state(jax.random.PRNGKey(0), dict(batches[0]))
    state2, avg2 = _run(trainer2, state2, batches, g)

    _assert_states_equal(state1, state2)
    np.testing.assert_allclose(avg1, avg2, rtol=2e-5)


@pytest.mark.slow
def test_mixed_shapes_fall_back_to_single_dispatch():
    """A shape change inside a group must not break (or skew) training:
    the group falls back to per-batch programs and the result still
    matches G=1."""
    model = BLSTM(idim=257, num_bins=257, hidden_dim=32, num_layers=1,
                  dropout_rate=0.0)
    batches = (_fixed_batches(2, win=32000, seed=0)
               + _fixed_batches(2, win=48000, seed=1)
               + _fixed_batches(1, win=32000, seed=2))
    trainer1 = _trainer(model)
    state1 = trainer1.init_state(jax.random.PRNGKey(0), dict(batches[0]))
    state1, _ = _run(trainer1, state1, batches, 1)

    trainer2 = _trainer(model)
    state2 = trainer2.init_state(jax.random.PRNGKey(0), dict(batches[0]))
    state2, _ = _run(trainer2, state2, batches, 4)

    _assert_states_equal(state1, state2)


def test_epoch_logging_with_groups():
    """iter/bsize/audio-sec metrics stay correct at group granularity."""
    model = BLSTM(idim=257, num_bins=257, hidden_dim=32, num_layers=1,
                  dropout_rate=0.0)
    batches = _fixed_batches(6)
    trainer = _trainer(model)
    state = trainer.init_state(jax.random.PRNGKey(0), dict(batches[0]))
    logs = []
    rng = jax.random.PRNGKey(7)
    state, _ = trainer.train_one_epoch(
        state, iter(_copy_batches(batches)), len(batches), rng,
        log_fn=logs.append, log_every=2, steps_per_dispatch=4)
    assert [log["iter"] for log in logs] == [4, 6]
    assert all(np.isfinite(log["loss"]) for log in logs)
    assert all(log["audio_sec_per_sec_per_chip"] > 0 for log in logs)
    assert int(state.step) == 6


def test_mixer_window_group():
    """window_group=G holds each sampled window bucket for G batches, so
    trainer groups always stack; marginal bucket distribution unchanged."""
    corpus = SyntheticCorpus(num_speakers=4, utts_per_speaker=2,
                             min_dur=4.5, max_dur=6.0)
    mixer = MixtureSynthesizer(corpus, batch_size=2, min_window=2.0,
                               max_window=4.0, bucket_step=1.0, seed=3,
                               window_group=4)
    wins = [next(mixer)["mix"].shape[1] for _ in range(16)]
    for i in range(0, 16, 4):
        assert len(set(wins[i:i + 4])) == 1
    assert len(set(wins)) > 1  # buckets do vary across groups


@pytest.mark.slow
def test_grouping_engages_through_prefetch_loader():
    """The realistic default path — 2 producer threads, shared window
    seed, PrefetchLoader(group=G), shape-aware group pulling — must run
    the large majority of steps through the scanned multi-step program
    (regression: fixed-count chunking straddled the loader's runs and
    ~2/3 of dispatches silently fell back to per-step programs)."""
    from css_tpu.data import PrefetchLoader

    corpus = SyntheticCorpus(num_speakers=4, utts_per_speaker=2,
                             min_dur=4.5, max_dur=6.0)

    def factory(i):
        return MixtureSynthesizer(corpus, batch_size=2, min_window=2.0,
                                  max_window=4.0, bucket_step=1.0,
                                  seed=100 + i, window_seed=7,
                                  window_group=4)

    loader = PrefetchLoader(factory=factory, num_threads=2, prefetch=4,
                            group=4)
    model = BLSTM(idim=257, num_bins=257, hidden_dim=16, num_layers=1,
                  dropout_rate=0.0)
    trainer = _trainer(model)
    example = next(loader)
    example.pop("ovl", None), example.pop("lens", None)
    state = trainer.init_state(jax.random.PRNGKey(0), example)

    calls = {"multi": 0, "single": 0}
    orig_multi, orig_step = trainer._train_multi, trainer._train_step

    def multi(s, stacked, rng, pools=None):
        calls["multi"] += int(stacked["mix"].shape[0])
        return orig_multi(s, stacked, rng, pools)

    def step(s, b, rng, pools=None):
        calls["single"] += 1
        return orig_step(s, b, rng, pools)

    trainer._train_multi, trainer._train_step = multi, step
    n = 24
    state, _ = trainer.train_one_epoch(state, loader, n,
                                       jax.random.PRNGKey(1),
                                       steps_per_dispatch=4)
    loader.close()
    assert calls["multi"] + calls["single"] == n
    frac = calls["multi"] / n
    assert frac >= 0.66, (
        f"only {calls['multi']}/{n} steps ran in multi-step dispatch "
        f"(singles: {calls['single']}) — grouping is not engaging")
