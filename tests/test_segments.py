"""Segment helpers — including the empty-segment regression hypothesis
found (empty trailing segments must not split earlier segments)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from data_quality_check_ray.functions.segments import (
    segment_sum_exact,
    segment_sum_sequential,
    segment_sum_sequential32,
)


def _offsets_from_counts(counts):
    return np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)


def test_empty_trailing_segment_regression():
    x = np.array([1.0, 2.0])
    off = _offsets_from_counts([2, 0])
    assert segment_sum_sequential(x, off).tolist() == [3.0, 0.0]
    assert segment_sum_sequential32(x.astype(np.float32), off).tolist() == [3.0, 0.0]


def test_empty_middle_segments():
    x = np.array([1.0, 2.0, 4.0])
    off = _offsets_from_counts([1, 0, 0, 2])
    assert segment_sum_sequential(x, off).tolist() == [1.0, 0.0, 0.0, 6.0]


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=5), min_size=1, max_size=10))
def test_segment_sums_match_python_loop(counts):
    off = _offsets_from_counts(counts)
    rng = np.random.RandomState(0)
    x = rng.standard_normal(int(off[-1]))
    # the parity contract: a segment's sum equals np.add.reduceat over that
    # segment ALONE (the op both the engine and the scalar spec use) —
    # reduceat's internal accumulation order is its own (neither a strict
    # left fold nor np.add.reduce's pairwise), but it is deterministic
    expect = [
        float(np.add.reduceat(x[off[i]: off[i + 1]], np.array([0]))[0])
        if off[i + 1] > off[i]
        else 0.0
        for i in range(len(counts))
    ]
    got = segment_sum_sequential(x, off)
    assert np.allclose(got, expect, rtol=0, atol=0)
    xi = rng.randint(0, 100, int(off[-1]))
    expect_i = [int(xi[off[i]: off[i + 1]].sum()) for i in range(len(counts))]
    assert segment_sum_exact(xi, off).tolist() == expect_i


def test_pair_unique_matches_two_column_unique():
    import numpy as np

    from data_quality_check_ray.functions.segments import pair_unique

    rng = np.random.default_rng(7)
    x = rng.integers(0, 50, 500)
    y = rng.integers(0, 30, 500)
    ux, uy, c = pair_unique(x, y, return_counts=True)
    up, uc = np.unique(np.stack([x, y], axis=1), axis=0, return_counts=True)
    assert (ux == up[:, 0]).all() and (uy == up[:, 1]).all()
    assert (c == uc).all()
    # packed fast path must be refused when the pack would overflow int64
    big = np.array([(1 << 62), 5], dtype=np.int64)
    bx, by, bc = pair_unique(big, np.array([7, 9]), return_counts=True)
    assert sorted(zip(bx.tolist(), by.tolist())) == [(5, 9), ((1 << 62), 7)]
    assert bc.tolist() == [1, 1]
    # negatives force the exact path too (pack needs non-negative domains)
    nx, ny = pair_unique(np.array([-3, -3, 2]), np.array([1, 1, 4]))
    assert list(zip(nx.tolist(), ny.tolist())) == [(-3, 1), (2, 4)]
    # empty in, typed empty out
    ex, ey = pair_unique(np.array([], dtype=np.int64), np.array([], dtype=np.int64))
    assert len(ex) == 0 and len(ey) == 0
