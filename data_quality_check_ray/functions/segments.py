"""Segment (per-row over flattened list values) numpy helpers.

Arrow list arrays are (values, offsets); per-row reductions over the
flattened values are the vectorized replacement for ``for row in batch``
loops in hot stages.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def list_to_numpy_segments(arr: pa.ChunkedArray | pa.ListArray):
    """-> (values_array: pa.Array, offsets: np.int64[n+1]) with offsets
    rebased to 0."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    offsets = np.asarray(arr.offsets)
    values = arr.values
    if offsets[0] != 0:
        values = values.slice(offsets[0], offsets[-1] - offsets[0])
        offsets = offsets - offsets[0]
    return values, offsets.astype(np.int64)


def segment_sum_exact(x: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Per-segment sums via cumsum diff — exact for integer inputs."""
    cs = np.concatenate([[0], np.cumsum(x, dtype=np.int64)])
    return cs[offsets[1:]] - cs[offsets[:-1]]


def segment_sum_sequential(x: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Per-segment float sums via np.add.reduceat.

    reduceat's internal accumulation order is deterministic (verified: a
    segment's sum equals reduceat over that segment alone), so this matches
    the pinned scalar spec bit-for-bit — the spec path sums each document's
    values with the same op (see pipelines/reference_rules.py).

    reduceat runs over the starts of NON-EMPTY segments only (all < len(x),
    strictly increasing): the slice between consecutive non-empty starts is
    exactly the earlier segment's extent, since the segments in between are
    empty.  (Clipping empty-segment starts into range instead would insert
    spurious split points inside valid segments.)"""
    n = len(offsets) - 1
    out = np.zeros(n, dtype=np.float64)
    starts = offsets[:-1]
    nonempty = offsets[1:] > starts
    if x.size and nonempty.any():
        out[nonempty] = np.add.reduceat(x, starts[nonempty])
    return out


def segment_sum_sequential32(x: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """float32 variant of segment_sum_sequential (accumulates in float32;
    output widened to float64 exactly).  See that function's docstring for
    the empty-segment handling."""
    n = len(offsets) - 1
    out = np.zeros(n, dtype=np.float32)
    starts = offsets[:-1]
    nonempty = offsets[1:] > starts
    if x.size and nonempty.any():
        out[nonempty] = np.add.reduceat(x, starts[nonempty])
    return out.astype(np.float64)


def row_ids_from_offsets(offsets: np.ndarray) -> np.ndarray:
    """Flattened-value index -> owning row id."""
    counts = np.diff(offsets)
    return np.repeat(np.arange(len(counts), dtype=np.int64), counts)
