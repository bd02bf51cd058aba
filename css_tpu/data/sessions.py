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
                 overlap_frac: float = 0.3, pair=None, num_spk: int = 2,
                 with_info: bool = False):
    """One continuous K-speaker conversation (default 2).

    Utterances rotate over the K speakers; each next utterance starts
    ``overlap_frac`` of the previous utterance's length before the
    previous one ends (LibriCSS-style partial overlap), jittered per
    turn. ``pair`` forces the speakers (stratified protocols); the rng
    is consumed identically either way, and the K=2 draw sequence is
    bit-identical to the original 2-speaker protocol.

    Returns (mix (T,), srcs (K, T)) as float32; with ``with_info`` also
    a list of the spoken Utterance objects in turn order (WER
    references — the reference scored per-utterance transcripts via an
    external ASR, SURVEY.md §5 metrics row).
    """
    spk = rng.choice(corpus.speakers, num_spk, replace=False)
    if pair is not None:
        spk = list(pair)
    n = int(dur_sec * sr)
    srcs = np.zeros((num_spk, n), np.float32)
    spoken = []
    pos = 0
    turn = 0
    prev_len = 0
    while pos < n:
        utts = corpus.by_speaker[spk[turn % num_spk]]
        utt = utts[rng.integers(len(utts))]
        wav = utt.load()
        spoken.append(utt)
        # clamp: overlap_frac >= 0.5 could draw ov >= 1 and walk `pos`
        # backwards indefinitely (no change to draws for frac < 0.475)
        ov = min(rng.uniform(0.0, 2 * overlap_frac), 0.95)
        start = max(0, pos - int(ov * prev_len))
        end = min(n, start + len(wav))
        srcs[turn % num_spk, start:end] += wav[: end - start]
        prev_len = len(wav)
        # NOTE: pos may step backwards when a long utterance is followed
        # by a short one (LibriCSS-style pile-ups); shipped protocols
        # (seeds 123/456) depend on this exact walk — do NOT force strict
        # advance, the turn bound below guarantees termination instead
        pos = start + len(wav)
        turn += 1
        if turn > 100 * max(int(dur_sec), 1):
            # safety valve (never fires at sane overlap_frac): with
            # overlap_frac >= 0.5 the expected advance can be <= 0 and
            # the walk could otherwise wander indefinitely
            break
    mix = srcs.sum(axis=0)
    if with_info:
        return mix, srcs, spoken
    return mix, srcs
