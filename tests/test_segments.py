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
