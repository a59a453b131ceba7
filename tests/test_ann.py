"""Similarity search: brute-force exactness + LSH recall."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from data_quality_check_ray.stages.ann import (
    _normalize,
    brute_force_topk,
    lsh_topk,
)


def _emb_table(n=200, d=16, seed=7):
    rs = np.random.RandomState(seed)
    m = rs.standard_normal((n, d)).astype(np.float32)
    return pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array(list(m), type=pa.list_(pa.float32())),
        }
    ), m


def test_brute_force_matches_numpy_reference(quiet_data_context):
    import ray.data as rd

    t, m = _emb_table()
    queries = m[:3].astype(np.float64)
    qids = np.arange(3)
    ds = rd.from_arrow(t).repartition(4)
    out = (
        brute_force_topk(ds, queries, qids, k=5, exclude_ids={0, 1, 2}, dtype=np.float64)
        .to_pandas()
        .sort_values(["query_id", "rank"])
    )
    # numpy reference
    mn = _normalize(m.astype(np.float64))
    sims = mn[3:] @ _normalize(queries).T
    for q in range(3):
        order = np.lexsort((np.arange(3, len(m)), -sims[:, q]))[:5]
        expect_ids = (order + 3).tolist()
        got = out[out["query_id"] == q]["vec_id"].tolist()
        assert got == expect_ids, (q, got, expect_ids)


def test_topk_ranks_are_sequential(quiet_data_context):
    import ray.data as rd

    t, m = _emb_table()
    out = brute_force_topk(
        rd.from_arrow(t), m[:2].astype(np.float64), np.arange(2), k=4,
        exclude_ids={0, 1}, dtype=np.float64,
    ).to_pandas()
    for q in (0, 1):
        assert out[out["query_id"] == q]["rank"].sort_values().tolist() == [1, 2, 3, 4]


def test_lsh_prunes_but_finds_self(quiet_data_context):
    import ray.data as rd

    t, m = _emb_table()
    # query = an existing vector; LSH must keep its own bucket -> rank 1 = itself
    out = lsh_topk(
        rd.from_arrow(t), m[10:11], np.array([10]), k=3, bits=6
    ).to_pandas()
    top = out[(out["query_id"] == 10) & (out["rank"] == 1)]
    assert top["vec_id"].iloc[0] == 10
    assert np.isclose(top["sim"].iloc[0], 1.0, atol=1e-5)


def test_ivf_recall_vs_brute_force(quiet_data_context):
    import ray.data as rd
    from data_quality_check_ray.stages.ann import ivf_topk, train_ivf_centroids

    t, m = _emb_table(n=400)
    cents = train_ivf_centroids(m, n_cells=8, iters=5)
    assert cents.shape == (8, 16)
    # determinism
    assert np.array_equal(cents, train_ivf_centroids(m, n_cells=8, iters=5))

    queries = m[:3]
    qids = np.arange(3)
    ds = rd.from_arrow(t).repartition(4)
    ivf = ivf_topk(ds, queries, qids, cents, k=5, nprobe=4).to_pandas()
    bf = brute_force_topk(ds, queries.astype(np.float64), qids, k=5,
                          dtype=np.float64).to_pandas()
    # recall@5 with nprobe=4 of 8 cells should be high on random data
    hits = total = 0
    for q in range(3):
        got = set(ivf[ivf["query_id"] == q]["vec_id"])
        want = set(bf[bf["query_id"] == q]["vec_id"])
        hits += len(got & want)
        total += len(want)
    assert hits / total >= 0.6
    # the query vector itself (its own nearest neighbor) is always found
    for q in range(3):
        top1 = ivf[(ivf["query_id"] == q) & (ivf["rank"] == 1)]["vec_id"].iloc[0]
        assert top1 == q
