"""Data pipeline: corpora, on-the-fly mixture synthesis, prefetching.

Registry mirrors css/datasets/__init__.py:19-21.
"""

from css_tpu.data.base import DATASETS  # noqa: F401
from css_tpu.data.corpus import Corpus, SyntheticCorpus, Utterance  # noqa: F401
import css_tpu.data.mixer  # noqa: F401  (registers the dataset)
from css_tpu.data.loader import PrefetchLoader  # noqa: F401


def build_dataset(name: str, corpus, conf: dict):
    return DATASETS[name].build_dataset(corpus, conf)
