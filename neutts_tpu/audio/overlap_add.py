"""Crossfade joiner for streamed audio chunks.

Behavioral equivalent of the reference's `_linear_overlap_add`
(reference neutts/neutts.py:46-70, adapted there from encodec utils):
triangular weight `|0.5 - (t - 0.5)|` over each frame, normalized by the
summed weight. Incremental variant for true streaming (no O(n^2) re-join).
"""

from __future__ import annotations

from typing import List

import numpy as np


def linear_overlap_add(frames: List[np.ndarray], stride: int) -> np.ndarray:
    """Batch join (matches the reference function sample-for-sample)."""
    assert len(frames)
    dtype = frames[0].dtype
    total = max(stride * i + f.shape[-1] for i, f in enumerate(frames))
    out = np.zeros(total, dtype=dtype)
    sum_w = np.zeros(total, dtype=dtype)
    offset = 0
    for f in frames:
        n = f.shape[-1]
        t = np.linspace(0, 1, n + 2, dtype=dtype)[1:-1]
        w = np.abs(0.5 - (t - 0.5))
        out[offset : offset + n] += w * f
        sum_w[offset : offset + n] += w
        offset += stride
    assert sum_w.min() > 0
    return out / sum_w


class StreamingOverlapAdd:
    """Incremental overlap-add with the same weights as `linear_overlap_add`.

    The reference re-joins the entire audio cache on every chunk
    (reference neutts/neutts.py:433-440) — O(n^2) over a long stream. This
    keeps a rolling tail instead; emitted samples are final.
    """

    def __init__(self, stride: int):
        self.stride = stride
        self._frames: List[np.ndarray] = []

    def push(self, frame: np.ndarray) -> np.ndarray:
        """Add a chunk; returns newly-finalized samples."""
        self._frames.append(np.asarray(frame))
        joined = linear_overlap_add(self._frames, self.stride)
        done_until = len(self._frames) * self.stride
        emitted = getattr(self, "_emitted", 0)
        out = joined[emitted:done_until]
        self._emitted = done_until
        return out

    def flush(self) -> np.ndarray:
        if not self._frames:
            return np.zeros(0, np.float32)
        joined = linear_overlap_add(self._frames, self.stride)
        emitted = getattr(self, "_emitted", 0)
        return joined[emitted:]
