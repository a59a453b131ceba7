"""Exact global top-k without a distributed sort (stages/topk)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from data_quality_check_ray.stages.topk import global_topk


def _ds(n, parallelism, seed=7):
    import ray.data as rd

    rng = np.random.default_rng(seed)
    tbl = pa.table({
        "id": pa.array(np.arange(n, dtype=np.int64)),
        "score": pa.array(rng.integers(0, 50, n).astype(np.int64)),
    })
    return rd.from_arrow(tbl).repartition(parallelism), tbl


@pytest.mark.parametrize("parallelism", [1, 7])
@pytest.mark.parametrize("k", [1, 10, 500])
def test_matches_full_sort(quiet_data_context, parallelism, k):
    ds, tbl = _ds(300, parallelism)
    got = global_topk(
        ds, [("score", "descending"), ("id", "ascending")], k).to_pandas()
    df = tbl.to_pandas().sort_values(
        ["score", "id"], ascending=[False, True]).head(k).reset_index(drop=True)
    assert got.equals(df)


def test_output_is_sorted_even_when_under_k(quiet_data_context):
    ds, tbl = _ds(20, 4)
    got = global_topk(
        ds, [("score", "ascending"), ("id", "ascending")], 100).to_pandas()
    df = tbl.to_pandas().sort_values(
        ["score", "id"]).reset_index(drop=True)
    assert got.equals(df)
