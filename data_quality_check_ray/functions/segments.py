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


def pair_unique(x: np.ndarray, y: np.ndarray, return_counts: bool = False):
    """Exact unique of (x, y) int64 pairs, lexicographic order, optionally
    with multiplicities.

    Packs the pair into ONE int64 key (x * base + y) when the ranges
    provably fit — the guard runs in PYTHON ints, because an int64
    overflow in the pack would silently wrap and corrupt results while
    looking plausible (the bug class fixed in q_bigram_counts) — and
    falls back to an exact 2-column ``np.unique(..., axis=0)`` otherwise.
    One shared implementation so the overflow guard lives in one place
    (previously three divergent copies: shingle distinct, pair_partial,
    bigram counts)."""
    x = np.ascontiguousarray(x, dtype=np.int64)
    y = np.ascontiguousarray(y, dtype=np.int64)
    if len(x) == 0:
        e = np.array([], dtype=np.int64)
        return (e, e, e.copy()) if return_counts else (e, e)
    xmax, ymin = int(x.max()), int(y.min())
    base_py = int(y.max()) + 1
    if x.min() >= 0 and ymin >= 0 and xmax * base_py + base_py - 1 < (1 << 63):
        base = np.int64(base_py)
        if return_counts:
            pk, counts = np.unique(x * base + y, return_counts=True)
            return pk // base, pk % base, counts.astype(np.int64)
        pk = np.unique(x * base + y)
        return pk // base, pk % base
    up, counts = np.unique(np.stack([x, y], axis=1), axis=0,
                           return_counts=True)
    if return_counts:
        return up[:, 0], up[:, 1], counts.astype(np.int64)
    return up[:, 0], up[:, 1]
