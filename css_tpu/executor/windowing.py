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
