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
