"""Prefetch loader: threading, multi-producer, error propagation."""

import numpy as np
import pytest

from css_tpu.data import PrefetchLoader, SyntheticCorpus
from css_tpu.data.mixer import MixtureSynthesizer


def test_single_thread_prefetch_yields_batches():
    c = SyntheticCorpus(num_speakers=4, utts_per_speaker=2)
    loader = PrefetchLoader(
        it=MixtureSynthesizer(c, batch_size=4, seed=0), prefetch=2)
    for _ in range(3):
        b = next(loader)
        assert b["mix"].shape[0] == 4
    loader.close()


def test_multi_thread_needs_factory():
    c = SyntheticCorpus(num_speakers=4, utts_per_speaker=2)
    with pytest.raises(ValueError):
        PrefetchLoader(it=MixtureSynthesizer(c, batch_size=4), num_threads=2)


def test_multi_thread_factory_produces_distinct_streams():
    c = SyntheticCorpus(num_speakers=4, utts_per_speaker=2)
    loader = PrefetchLoader(
        factory=lambda i: MixtureSynthesizer(c, batch_size=4, seed=100 + i),
        num_threads=3, prefetch=4)
    batches = [next(loader) for _ in range(6)]
    assert all(b["mix"].shape[0] == 4 for b in batches)
    loader.close()


def test_producer_error_propagates():
    def bad_iter():
        yield {"mix": np.zeros((2, 10))}
        raise RuntimeError("producer exploded")

    loader = PrefetchLoader(it=bad_iter())
    next(loader)
    with pytest.raises(RuntimeError, match="producer exploded"):
        next(loader)


def test_grouped_emission_regroups_interleaved_shapes():
    """group=G regroups an interleaved shape sequence into same-shape runs
    (multi-step dispatch stacking needs G consecutive equal shapes)."""
    def alternating():
        for i in range(12):
            win = 100 if i % 2 == 0 else 200
            yield {"mix": np.full((2, win), i, np.float32)}

    loader = PrefetchLoader(it=alternating(), prefetch=12, group=2)
    got = [next(loader) for _ in range(12)]
    shapes = [b["mix"].shape[-1] for b in got]
    for i in range(0, 12, 2):  # every pair shares a shape
        assert shapes[i] == shapes[i + 1], shapes
    # no batch lost or duplicated
    ids = sorted(int(b["mix"][0, 0]) for b in got)
    assert ids == list(range(12))
    loader.close()


def test_grouped_emission_recipe_batches():
    """Grouping keys off dm_winmark for device-mix recipe batches."""
    def recipes():
        for i in range(8):
            win = 64 if i % 2 == 0 else 128
            yield {"dm_winmark": np.zeros((0, win), np.float32),
                   "dm_src": np.full((2, 2), i, np.int32)}

    loader = PrefetchLoader(it=recipes(), prefetch=8, group=4)
    got = [next(loader) for _ in range(8)]
    shapes = [b["dm_winmark"].shape[-1] for b in got]
    for i in range(0, 8, 4):
        assert len(set(shapes[i : i + 4])) == 1, shapes
    loader.close()
