"""Synthetic continuous-conversation sessions (LibriCSS-style).

The reference evaluates on LibriCSS — 10-minute continuous 2-speaker
sessions with 0-40% overlap (/root/reference/README.md:7, prepared by
scripts/python/separate_libricss.py:29). This environment has no real
corpus, so held-out quality is measured on synthetic sessions with the
same structure: alternating utterances where each turn starts a random
fraction of the previous utterance before it ends.

Used by scripts/quality_eval.py (the BASELINE.md held-out protocol) and
by trainer.probe (per-epoch checkpoint-selection probe).
"""

from __future__ import annotations

import numpy as np


def make_session(corpus, rng, dur_sec: float, sr: int = 16000,
                 overlap_frac: float = 0.3, pair=None):
    """One continuous 2-speaker conversation.

    Utterances alternate between the two speakers; each next utterance
    starts ``overlap_frac`` of the previous utterance's length before the
    previous one ends (LibriCSS-style partial overlap), jittered per turn.
    ``pair`` forces the two speakers (stratified protocols); the rng is
    consumed identically either way.

    Returns (mix (T,), srcs (2, T)) as float32.
    """
    spk = rng.choice(corpus.speakers, 2, replace=False)
    if pair is not None:
        spk = list(pair)
    n = int(dur_sec * sr)
    srcs = np.zeros((2, n), np.float32)
    pos = 0
    turn = 0
    prev_len = 0
    while pos < n:
        utts = corpus.by_speaker[spk[turn % 2]]
        wav = utts[rng.integers(len(utts))].load()
        ov = rng.uniform(0.0, 2 * overlap_frac)  # mean = overlap_frac
        start = max(0, pos - int(ov * prev_len))
        end = min(n, start + len(wav))
        srcs[turn % 2, start:end] += wav[: end - start]
        prev_len = len(wav)
        pos = start + len(wav)
        turn += 1
    mix = srcs.sum(axis=0)
    return mix, srcs
