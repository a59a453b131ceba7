"""Bucketed hash aggregation (stages/groupagg) — parity against Ray's
sort-based groupby on every supported shape: single/multi int keys,
string keys, multi-aggregate, bucket_post, distinct, and the
num_buckets=1 / empty-input edges."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from data_quality_check_ray.stages.groupagg import (
    distinct_bucketed,
    grouped_agg_bucketed,
)


def _ds(t: pa.Table, blocks: int = 7):
    import ray.data as rd

    return rd.from_arrow(t).repartition(blocks)


@pytest.fixture()
def keyed_table():
    rng = np.random.default_rng(3)
    n = 5_000
    return pa.table({
        "k1": rng.integers(0, 900, n),
        "k2": rng.integers(-3, 3, n),
        "s": np.array([f"host{v}.example" for v in rng.integers(0, 50, n)]),
        "v": rng.integers(-100, 100, n),
    })


def test_int_key_sum_matches_sort_groupby(keyed_table, quiet_data_context):
    ds = _ds(keyed_table)
    got = (grouped_agg_bucketed(ds, keys="k1", aggs=[("v", "sum")])
           .to_pandas().sort_values("k1").reset_index(drop=True))
    want = (ds.groupby("k1").sum("v").to_pandas()
            .rename(columns={"sum(v)": "v_sum"})
            .sort_values("k1").reset_index(drop=True))
    assert got.equals(want[["k1", "v_sum"]])


def test_multi_key_multi_agg(keyed_table, quiet_data_context):
    ds = _ds(keyed_table)
    got = (grouped_agg_bucketed(ds, keys=["k1", "k2"],
                                aggs=[("v", "min"), ("v", "max")])
           .to_pandas().sort_values(["k1", "k2"]).reset_index(drop=True))
    pdf = keyed_table.to_pandas()
    want = (pdf.groupby(["k1", "k2"])["v"].agg(["min", "max"])
            .reset_index().rename(columns={"min": "v_min", "max": "v_max"})
            .sort_values(["k1", "k2"]).reset_index(drop=True))
    assert (got["v_min"] == want["v_min"]).all()
    assert (got["v_max"] == want["v_max"]).all()
    assert len(got) == len(want)


def test_string_key(keyed_table, quiet_data_context):
    ds = _ds(keyed_table)
    got = (grouped_agg_bucketed(ds, keys="s", aggs=[("v", "sum")])
           .to_pandas().sort_values("s").reset_index(drop=True))
    want = (keyed_table.to_pandas().groupby("s")["v"].sum()
            .reset_index().rename(columns={"v": "v_sum"})
            .sort_values("s").reset_index(drop=True))
    assert got.equals(want)


def test_bucket_post_filter_is_exact(keyed_table, quiet_data_context):
    # a per-key filter inside the reducer sees the FULL group (a bucket
    # owns all rows of its keys) — verify against a global filter
    ds = _ds(keyed_table)
    got = grouped_agg_bucketed(
        ds, keys="k1", aggs=[("v", "sum")],
        bucket_post=lambda t: t.filter(
            pa.compute.greater(t["v_sum"], 50)),
    ).to_pandas().sort_values("k1").reset_index(drop=True)
    pdf = keyed_table.to_pandas().groupby("k1")["v"].sum().reset_index()
    want = (pdf[pdf["v"] > 50].rename(columns={"v": "v_sum"})
            .sort_values("k1").reset_index(drop=True))
    assert got.equals(want)


def test_distinct_bucketed(keyed_table, quiet_data_context):
    ds = _ds(keyed_table)
    got = (distinct_bucketed(ds.map_batches(
        lambda b: b.select(["k1", "k2"]), batch_format="pyarrow"),
        keys=["k1", "k2"])
        .to_pandas().sort_values(["k1", "k2"]).reset_index(drop=True))
    want = (keyed_table.to_pandas()[["k1", "k2"]].drop_duplicates()
            .sort_values(["k1", "k2"]).reset_index(drop=True))
    assert got.equals(want)


def test_single_bucket_and_empty(quiet_data_context):
    import ray.data as rd

    t = pa.table({"k": pa.array([], pa.int64()),
                  "v": pa.array([], pa.int64())})
    out = grouped_agg_bucketed(rd.from_arrow(t), keys="k",
                               aggs=[("v", "sum")], num_buckets=1).to_pandas()
    assert len(out) == 0

    t2 = pa.table({"k": [1, 1, 2], "v": [10, 20, 5]})
    out2 = (grouped_agg_bucketed(rd.from_arrow(t2), keys="k",
                                 aggs=[("v", "sum")], num_buckets=1)
            .to_pandas().sort_values("k").reset_index(drop=True))
    assert list(out2["v_sum"]) == [30, 5]


def test_non_distributive_agg_rejected(quiet_data_context):
    import ray.data as rd

    t = pa.table({"k": [1], "v": [1]})
    with pytest.raises(ValueError, match="non-distributive"):
        grouped_agg_bucketed(rd.from_arrow(t), keys="k",
                             aggs=[("v", "mean")])


def test_null_keys_group_separately(quiet_data_context):
    import ray.data as rd

    t = pa.table({"k": pa.array([1, None, -1, None, 1], pa.int64()),
                  "v": pa.array([10, 20, 30, 40, 50], pa.int64())})
    out = (grouped_agg_bucketed(rd.from_arrow(t), keys="k",
                                aggs=[("v", "sum")], num_buckets=4)
           .to_pandas())
    assert len(out) == 3
    assert int(out.loc[out["k"].isna(), "v_sum"].iloc[0]) == 60
    assert int(out.loc[out["k"] == 1, "v_sum"].iloc[0]) == 60
    assert int(out.loc[out["k"] == -1, "v_sum"].iloc[0]) == 30
