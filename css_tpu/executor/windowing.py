"""Sliding-window unfolding for chunked continuous separation."""

from __future__ import annotations

import numpy as np


def unfold(x: np.ndarray, win: int, hop: int, pad_to_one: bool = True):
    """(..., T) -> (B, ..., win) sliding windows (torch.Tensor.unfold
    semantics: drops the ragged tail, css/executor/separator.py:67).

    If the signal is shorter than one window and ``pad_to_one``, zero-pad to
    a single window.
    """
    t = x.shape[-1]
    if t < win:
        if not pad_to_one:
            raise ValueError(f"signal length {t} < window {win}")
        pad = [(0, 0)] * (x.ndim - 1) + [(0, win - t)]
        x = np.pad(x, pad)
        t = win
    num = (t - win) // hop + 1
    idx = np.arange(num)[:, None] * hop + np.arange(win)[None, :]
    out = x[..., idx]  # (..., B, win)
    return np.moveaxis(out, -2, 0)  # (B, ..., win)


def pad_for_windows(x: np.ndarray, win: int, hop: int) -> np.ndarray:
    """Right-pad (..., T) with zeros so sliding (win, hop) windows cover
    the WHOLE signal (bare ``unfold`` drops the ragged tail — up to one
    window of audio, the same truncation as separator.py:67)."""
    total = x.shape[-1]
    n_win = max(1, -(-(total - win) // hop) + 1)
    needed = (n_win - 1) * hop + win
    if needed > total:
        pad = [(0, 0)] * (x.ndim - 1) + [(0, needed - total)]
        x = np.pad(x, pad)
    return x
