"""Partitioned hash join, as-of join, HLL sketch."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from data_quality_check_ray.functions.sketches import (
    approx_distinct,
    hll_estimate,
    hll_from_ints,
    hll_merge,
)
from data_quality_check_ray.stages.joins import asof_join_grouped, hash_join


def test_hash_join_matches_pandas(quiet_data_context):
    import ray.data as rd

    rs = np.random.RandomState(5)
    left = pd.DataFrame({"k": rs.randint(0, 50, 300), "x": np.arange(300)})
    right = pd.DataFrame({"rk": np.arange(0, 60), "y": np.arange(60) * 10})
    got = (
        hash_join(
            rd.from_pandas(left).repartition(4),
            rd.from_pandas(right).repartition(2),
            key="k", right_key="rk", num_buckets=8,
        )
        .to_pandas()
        .sort_values(["k", "x"])
        .reset_index(drop=True)
    )
    expect = (
        left.merge(right.rename(columns={"rk": "k"}), on="k", how="inner")
        .sort_values(["k", "x"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[expect.columns], expect, check_dtype=False)


def test_asof_join_matches_merge_asof(quiet_data_context):
    import ray.data as rd

    rs = np.random.RandomState(6)
    left = pd.DataFrame(
        {
            "user_id": rs.randint(0, 5, 80),
            "ts": pd.to_datetime(rs.randint(0, 10**6, 80), unit="s"),
            "event_id": np.arange(80),
        }
    )
    right = pd.DataFrame(
        {
            "user_id": rs.randint(0, 5, 40),
            "ts": pd.to_datetime(rs.randint(0, 10**6, 40), unit="s"),
            "value": rs.rand(40).round(3),
        }
    )
    got = (
        asof_join_grouped(
            rd.from_pandas(left).repartition(3),
            rd.from_pandas(right).repartition(2),
            key="user_id", ts="ts", right_cols=["value"],
        )
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    expect = pd.merge_asof(
        left.sort_values("ts"),
        right.sort_values("ts").rename(columns={"ts": "ts_asof", "value": "value_asof"}),
        left_on="ts", right_on="ts_asof", by="user_id",
    ).sort_values("event_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["event_id", "value_asof"]], expect[["event_id", "value_asof"]],
        check_dtype=False,
    )


def test_hll_accuracy_and_mergeability():
    rs = np.random.RandomState(7)
    keys = rs.randint(0, 50_000, 200_000).astype(np.int64)
    exact = len(np.unique(keys))
    one = hll_estimate(hll_from_ints(keys))
    assert abs(one - exact) / exact < 0.03
    # merge of disjoint chunks == sketch of the whole
    parts = [hll_from_ints(c) for c in np.array_split(keys, 7)]
    merged = hll_estimate(hll_merge(parts))
    assert merged == one


def test_approx_distinct_on_dataset(quiet_data_context):
    import ray.data as rd

    ds = rd.from_pandas(pd.DataFrame({"user_id": np.arange(5000) % 1234})).repartition(6)
    est = approx_distinct(ds, "user_id")
    assert abs(est - 1234) / 1234 < 0.05


def test_asof_preserves_large_int64_ids(quiet_data_context):
    """Regression: union NaN-padding degraded left int64 columns to
    float64, corrupting ids >= 2^53."""
    import ray.data as rd

    big = (1 << 53) + 1234567
    left = pd.DataFrame(
        {
            "user_id": [1, 1, 2],
            "ts": pd.to_datetime([100, 200, 300], unit="s"),
            "event_id": np.array([big, big + 1, big + 2], dtype=np.int64),
        }
    )
    right = pd.DataFrame(
        {
            "user_id": [1],
            "ts": pd.to_datetime([150], unit="s"),
            "value": [7.5],
        }
    )
    out = asof_join_grouped(
        rd.from_pandas(left), rd.from_pandas(right),
        key="user_id", ts="ts", right_cols=["value"],
    ).to_pandas().sort_values("event_id").reset_index(drop=True)
    assert out["event_id"].tolist() == [big, big + 1, big + 2]  # exact int64
    assert np.isnan(out.loc[0, "value_asof"])       # before first purchase
    assert out.loc[1, "value_asof"] == 7.5
    assert np.isnan(out.loc[2, "value_asof"])       # user 2: empty right side


def test_hash_join_preserves_large_int64(quiet_data_context):
    """Regression: unified to_pandas NaN-padding degraded int64 to float64
    in the hash-join merge (ids >= 2^53 corrupted); also covers int32
    right-key vs int64 left-key cast."""
    import ray.data as rd

    big = (1 << 53) + 77
    left = pd.DataFrame({"k": np.array([big, big + 1], dtype=np.int64),
                         "x": np.array([10, 20], dtype=np.int64)})
    right = pd.DataFrame({"rk": np.array([big, big + 1], dtype=np.int64),
                          "y": np.array([7, 8], dtype=np.int64)})
    out = hash_join(
        rd.from_pandas(left), rd.from_pandas(right), key="k", right_key="rk",
        num_buckets=4,
    ).to_pandas().sort_values("k").reset_index(drop=True)
    assert out["k"].dtype == np.int64
    assert out["k"].tolist() == [big, big + 1]
    assert out["y"].tolist() == [7, 8]

    # mixed key types: right int32 key upcast to the left's int64
    right32 = pd.DataFrame({"rk": np.array([1, 2], dtype=np.int32), "y": [5, 6]})
    left64 = pd.DataFrame({"k": np.array([1, 2], dtype=np.int64), "x": [0, 0]})
    out2 = hash_join(
        rd.from_pandas(left64), rd.from_pandas(right32), key="k", right_key="rk",
        num_buckets=4,
    ).to_pandas().sort_values("k")
    assert out2["y"].tolist() == [5, 6]


def test_hash_join_salted_hot_key_matches_unsalted(quiet_data_context):
    """Skewed-key regression: one key carries half the probe side.  The
    salted join (hot probe rows split across sub-buckets, hot build rows
    replicated per sub-bucket) must return exactly the unsalted rows."""
    import ray.data as rd

    rs = np.random.RandomState(11)
    k = np.where(rs.rand(600) < 0.5, 7, rs.randint(0, 40, 600)).astype(np.int64)
    left = pd.DataFrame({"k": k, "x": np.arange(600, dtype=np.int64)})
    right = pd.DataFrame({"rk": np.arange(0, 40, dtype=np.int64),
                          "y": np.arange(40, dtype=np.int64) * 10})

    def run(**kw):
        return (
            hash_join(rd.from_pandas(left).repartition(4),
                      rd.from_pandas(right).repartition(2),
                      key="k", right_key="rk", num_buckets=8, **kw)
            .to_pandas().sort_values(["k", "x"]).reset_index(drop=True)
        )

    plain = run()
    salted = run(salt_keys=[7], salt=4)
    pd.testing.assert_frame_equal(salted[plain.columns], plain)
    expect = (left.merge(right.rename(columns={"rk": "k"}), on="k")
              .sort_values(["k", "x"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(salted[expect.columns], expect,
                                  check_dtype=False)


def test_hash_join_left_outer(quiet_data_context):
    import ray.data as rd

    left = pd.DataFrame({"k": np.array([1, 2, 3], dtype=np.int64),
                         "x": np.array([10, 20, 30], dtype=np.int64)})
    right = pd.DataFrame({"rk": np.array([2], dtype=np.int64),
                          "y": np.array([99], dtype=np.int64)})
    out = hash_join(rd.from_pandas(left), rd.from_pandas(right),
                    key="k", right_key="rk", num_buckets=4, how="left"
                    ).to_pandas().sort_values("k").reset_index(drop=True)
    assert out["k"].tolist() == [1, 2, 3]
    assert out["y"].fillna(-1).tolist() == [-1, 99, -1]


def test_simhash_scale_path_preserves_int64(quiet_data_context):
    import ray.data as rd

    from data_quality_check_ray.stages.dedup import simhash_dedup

    big = (1 << 53) + 77
    rows = [
        {"doc_id": big, "text": "alpha beta gamma delta"},
        {"doc_id": big + 1, "text": "alpha beta gamma delta"},
        {"doc_id": big + 2, "text": "totally different content here"},
    ]
    out = simhash_dedup(
        rd.from_arrow(pa.Table.from_pylist(rows)), broadcast_threshold=0
    ).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert out["doc_id"].dtype == np.int64
    assert out["doc_id"].tolist() == [big, big + 1, big + 2]
    assert out["rep_id"].tolist() == [big, big, big + 2]


def test_interval_tag_range_join(quiet_data_context):
    import ray.data as rd

    from data_quality_check_ray.stages.joins import interval_tag

    ts = pd.to_datetime([5, 15, 25, 35, 45], unit="s")
    df = pd.DataFrame({"ts": ts, "x": np.arange(5)})
    starts = np.array([0, 20, 40]) * 1_000_000   # us
    ends = np.array([10, 30, 42]) * 1_000_000
    out = interval_tag(
        rd.from_pandas(df).repartition(2), "ts", starts, ends,
        labels=np.array([100, 200, 300]),
    ).to_pandas().sort_values("x")
    assert out["window_id"].fillna(-1).tolist() == [100, -1, 200, -1, -1]

    # validation: overlapping / unsorted / empty intervals rejected
    with pytest.raises(ValueError, match="overlap"):
        interval_tag(rd.from_pandas(df), "ts",
                     np.array([0, 5]), np.array([10, 15]), np.array([1, 2]))
    with pytest.raises(ValueError, match="sorted"):
        interval_tag(rd.from_pandas(df), "ts",
                     np.array([20, 0]), np.array([30, 10]), np.array([1, 2]))
    with pytest.raises(ValueError, match="interval"):
        interval_tag(rd.from_pandas(df), "ts",
                     np.array([0]), np.array([0]), np.array([1]))


def test_qhist_accuracy_and_mergeability():
    from data_quality_check_ray.functions.sketches import (
        qhist_from_values,
        qhist_merge,
        qhist_quantile,
    )

    rs = np.random.RandomState(9)
    x = rs.lognormal(3, 2, 100_000)
    h = qhist_from_values(x)
    for q in (0.5, 0.9, 0.99):
        est, exact = qhist_quantile(h, q), np.quantile(x, q)
        assert abs(est - exact) / exact < 0.02, q
    parts = [qhist_from_values(c) for c in np.array_split(x, 5)]
    assert np.array_equal(qhist_merge(parts), h)
    # zeros and edge handling
    hz = qhist_from_values(np.zeros(10))
    assert qhist_quantile(hz, 0.5) == 0.0
    with pytest.raises(ValueError):
        qhist_from_values(np.array([-1.0]))


def test_approx_quantiles_on_dataset(quiet_data_context):
    import ray.data as rd

    from data_quality_check_ray.functions.sketches import approx_quantiles

    rs = np.random.RandomState(10)
    x = rs.lognormal(2, 1, 20_000)
    ds = rd.from_pandas(pd.DataFrame({"v": x})).repartition(6)
    est = approx_quantiles(ds, "v")
    for name, q in (("p50", 0.5), ("p90", 0.9), ("p99", 0.99)):
        exact = np.quantile(x, q)
        assert abs(est[name] - exact) / exact < 0.02, name


def test_qhist_nulls_and_inf():
    """Regression: NaN (null) values are skipped, +inf is overflow — not
    silently binned into underflow."""
    from data_quality_check_ray.functions.sketches import (
        qhist_from_values,
        qhist_quantile,
    )

    x = np.array([np.nan] * 60 + [100.0] * 40)
    h = qhist_from_values(x)
    assert abs(qhist_quantile(h, 0.5) - 100.0) / 100.0 < 0.02
    hi = qhist_from_values(np.array([1.0, np.inf]))
    assert hi[-1] == 1  # overflow bucket


def test_asof_right_int_cols_stay_int64_with_nulls(quiet_data_context):
    """Every partition must emit the SAME schema, and integer right value
    columns keep their exact int64 type (unmatched rows are typed NULLS,
    never merge_asof's float64 promotion, which silently rounds values
    >= 2^53) — including partitions where all left rows match and
    partitions whose right side is empty."""
    import ray.data as rd

    big = (1 << 53) + 987654321  # not representable in float64
    # user 1: full match (right rows precede all left rows)
    # user 2: left rows but NO right rows at all (other-partition user)
    left = pa.table({
        "k": [1, 1, 2, 2],
        "ts": np.array([10, 20, 10, 20], dtype="datetime64[us]"),
    })
    right = pa.table({
        "k": [1, 1],
        "ts": np.array([5, 15], dtype="datetime64[us]"),
        "v": pa.array([big, big + 1], type=pa.int64()),
    })
    out = asof_join_grouped(
        rd.from_arrow(left), rd.from_arrow(right), key="k", ts="ts",
        right_cols=["v"], num_parts=8,
    )
    t = pa.concat_tables(
        out.iter_batches(batch_format="pyarrow", batch_size=None)
    )
    assert t.schema.field("v_asof").type == pa.int64()
    t = t.combine_chunks()
    order = pc.sort_indices(t, sort_keys=[("k", "ascending"),
                                          ("ts", "ascending")])
    vs = t["v_asof"].take(order)
    assert vs.to_pylist() == [big, big + 1, None, None]  # exact int64


def test_bucket_sizing_never_materializes_join_inputs(
        quiet_data_context, monkeypatch):
    """The VERDICT r2 scale-killer: hash_join(num_buckets=None) used to
    materialize both inputs just to size buckets.  The core pipelines must
    now size from parquet-footer / materialized-handle metadata — assert
    the materialization fallback is never entered."""
    from data_quality_check_ray.pipelines import queries
    from data_quality_check_ray.stages import joins

    def boom(left_ds, right_ds):
        raise AssertionError(
            "_auto_buckets materialization fallback was hit"
        )

    monkeypatch.setattr(joins, "_auto_buckets", boom)
    sf = "/root/testdata/sf0.001"
    for name in ("priority_revenue", "q3_shipping", "curation_pipeline"):
        ds = queries.QUERIES[name](sf)
        assert ds.count() > 0


def test_minhash_distributed_closure_avoids_auto_buckets(
        quiet_data_context, monkeypatch):
    from data_quality_check_ray.pipelines import queries
    from data_quality_check_ray.stages import dedup, joins

    def boom(left_ds, right_ds):
        raise AssertionError(
            "_auto_buckets materialization fallback was hit"
        )

    monkeypatch.setattr(joins, "_auto_buckets", boom)
    import functools

    orig = dedup.minhash_dedup
    monkeypatch.setattr(
        dedup, "minhash_dedup", functools.partial(orig, pair_limit=0)
    )
    ds = queries.QUERIES["minhash_dedup"]("/root/testdata/sf0.001")
    assert ds.count() > 0
