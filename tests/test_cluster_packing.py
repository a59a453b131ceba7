"""Distributed k-means / SemDeDup (stages/cluster) and sequence packing
(stages/packing)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from data_quality_check_ray.stages import cluster, packing


def _vec_table(mat: np.ndarray, ids=None) -> pa.Table:
    ids = np.arange(len(mat)) if ids is None else np.asarray(ids)
    return pa.table({
        "vec_id": pa.array(ids.astype(np.int64)),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(mat.astype(np.float32).ravel()), mat.shape[1]
        ).cast(pa.list_(pa.float32())),
    })


def _blobs(seed=7):
    """Three tight blobs INTERLEAVED in id order, so the smallest-3-ids
    seed rule starts with one seed per blob (seeding all from one blob is
    the classic Lloyd local optimum, not an engine property under test)."""
    rng = np.random.RandomState(seed)
    a = rng.randn(40, 4) * 0.05 + np.array([5.0, 0, 0, 0])
    b = rng.randn(40, 4) * 0.05 + np.array([0, 5.0, 0, 0])
    c = rng.randn(40, 4) * 0.05 + np.array([0, 0, 5.0, 0])
    out = np.empty((120, 4))
    out[0::3], out[1::3], out[2::3] = a, b, c
    return out


def test_kmeans_recovers_blob_centers(quiet_data_context):
    import ray.data as rd

    mat = _blobs()
    ds = rd.from_arrow(_vec_table(mat))
    cen = cluster.kmeans_fit(ds, k=3, iters=8)
    # each true center has a fitted centroid within 0.1
    true = np.array([[5, 0, 0, 0], [0, 5, 0, 0], [0, 0, 5, 0]], float)
    d = np.linalg.norm(true[:, None, :] - cen[None, :, :], axis=2).min(axis=1)
    assert (d < 0.1).all()
    out = cluster.kmeans_assign(ds, cen).to_pandas().sort_values("vec_id")
    lab = out["cluster_id"].to_numpy()
    for m in range(3):
        assert len(set(lab[m::3])) == 1
    assert len({lab[0], lab[1], lab[2]}) == 3


def test_kmeans_matches_numpy_lloyd(quiet_data_context):
    import ray.data as rd

    rng = np.random.RandomState(3)
    mat = rng.randn(100, 8)
    ds = rd.from_arrow(_vec_table(mat))
    cen = cluster.kmeans_fit(ds, k=5, iters=3)

    c = mat[:5].astype(np.float64).copy()  # init = 5 smallest ids
    x = mat.astype(np.float64)
    for _ in range(3):
        a = np.argmin(((x[:, None, :] - c[None, :, :]) ** 2).sum(2), axis=1)
        for j in range(5):
            if (a == j).any():
                c[j] = x[a == j].mean(0)
    assert np.allclose(cen, c, atol=1e-9)


def test_kmeans_empty_cluster_keeps_centroid(quiet_data_context):
    import ray.data as rd

    mat = np.array([[0.0, 0], [0.1, 0], [0.2, 0]])
    far = np.array([[100.0, 100]])
    ds = rd.from_arrow(_vec_table(mat))
    cen = cluster.kmeans_fit(ds, k=2, iters=4,
                             init=np.vstack([mat[:1], far]))
    assert np.allclose(cen[1], far[0])  # never owns a point -> unchanged
    assert np.allclose(cen[0], mat.mean(0))


def test_semdedup_flags_scaled_copies(quiet_data_context):
    import ray.data as rd

    rng = np.random.RandomState(0)
    base = rng.randn(30, 8) + 4.0
    # ids 30/31: same DIRECTION as ids 0/1 (cosine 1), different scale
    mat = np.vstack([base, base[0] * 3.0, base[1] * 0.5])
    ds = rd.from_arrow(_vec_table(mat))
    # k=1: a scaled copy is far in L2 so k>1 can legitimately place it in
    # another cluster (SemDeDup's pruning tradeoff); one cluster makes the
    # cosine flagging itself the thing under test
    out = cluster.semdedup(ds, k=1, iters=1, tau=0.999) \
        .to_pandas().set_index("vec_id")
    assert bool(out.loc[30, "is_dup"]) and out.loc[30, "rep_id"] == 0
    assert bool(out.loc[31, "is_dup"]) and out.loc[31, "rep_id"] == 1
    assert not out.loc[0, "is_dup"] and not out.loc[1, "is_dup"]
    assert out["rep_id"].isna().sum() == (~out["is_dup"]).sum()


def test_semdedup_oversized_cluster_subsplits_not_raises(
        quiet_data_context):
    """A cluster over max_cluster used to raise; it must now sub-split
    in-task and still flag near-identical pairs (which co-locate under
    any finer clustering)."""
    import ray.data as rd

    rng = np.random.RandomState(1)
    base = rng.randn(20, 4) * 0.01
    base[:10] += np.array([10.0, 0, 0, 0])   # two separable lobes so the
    base[10:] += np.array([0, 10.0, 0, 0])   # local Lloyd split works
    mat = np.vstack([base, base[3] * 2.0])   # id 20: scaled copy of id 3
    ds = rd.from_arrow(_vec_table(mat))
    out = cluster.semdedup(ds, k=1, iters=1, tau=0.999, max_cluster=5) \
        .to_pandas().set_index("vec_id")
    assert len(out) == 21
    assert bool(out.loc[20, "is_dup"]) and out.loc[20, "rep_id"] == 3


def test_semdedup_unsplittable_cluster_degrades_to_full_scan(
        quiet_data_context):
    """All-identical vectors cannot be Lloyd-split; the operator must
    degrade to the quadratic scan (bounded memory) and mark every vector
    a dup of the smallest id — never error."""
    import ray.data as rd

    mat = np.tile(np.array([1.0, 2.0, 3.0, 4.0]), (12, 1))
    ds = rd.from_arrow(_vec_table(mat))
    out = cluster.semdedup(ds, k=1, iters=1, tau=0.9, max_cluster=4) \
        .to_pandas().set_index("vec_id").sort_index()
    assert not out.loc[0, "is_dup"]
    assert out.loc[1:, "is_dup"].all()
    assert (out.loc[1:, "rep_id"] == 0).all()


def test_semdedup_auto_k(quiet_data_context):
    """k=None derives the cluster count from the corpus size: with
    max_cluster=16 over 64 vectors, auto_k targets ~2-member clusters
    (>= 8 clusters), and the run completes where a fixed k=1 would have
    tripped the old guard."""
    import ray.data as rd

    assert cluster.auto_k(64, max_cluster=16) == 32
    assert cluster.auto_k(100, max_cluster=2_000_000) == 8  # floor
    assert cluster.auto_k(3, max_cluster=2_000_000) == 3    # <= n rows
    rng = np.random.RandomState(7)
    mat = rng.randn(64, 4) * 0.1 + rng.randn(64, 1) * 5.0
    ds = rd.from_arrow(_vec_table(mat))
    out = cluster.semdedup(ds, iters=1, tau=0.9999, max_cluster=16) \
        .to_pandas()
    assert len(out) == 64
    assert out["cluster_id"].nunique() >= 8


def _docs(texts, ids=None) -> pa.Table:
    ids = list(range(len(texts))) if ids is None else ids
    return pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                     "text": pa.array(texts, type=pa.string())})


def _pack_reference(texts, ids, seq_len):
    import pandas as pd

    n = [len(t.split()) if t else 0 for t in texts]
    df = pd.DataFrame({"doc_id": ids, "n_tokens": n}).sort_values("doc_id")
    df["token_offset"] = df["n_tokens"].cumsum() - df["n_tokens"]
    ne = df["n_tokens"] > 0
    df["first_seq"] = np.where(ne, df["token_offset"] // seq_len, -1)
    df["last_seq"] = np.where(
        ne, (df["token_offset"] + df["n_tokens"] - 1) // seq_len, -1)
    df["n_seqs"] = np.where(ne, df["last_seq"] - df["first_seq"] + 1, 0)
    return df.reset_index(drop=True)


@pytest.mark.parametrize("num_ranges", [1, 4, 16])
def test_pack_sequences_matches_reference(quiet_data_context, num_ranges):
    import ray.data as rd

    rng = np.random.RandomState(5)
    texts = ["w " * rng.randint(0, 40) for _ in range(200)]
    texts[7] = ""       # empty
    texts[13] = None    # null
    ids = rng.permutation(200) * 3 + 1  # unsorted, gappy ids
    ds = rd.from_arrow(_docs(texts, list(ids))).repartition(8)
    out = packing.pack_sequences(ds, seq_len=16, num_ranges=num_ranges) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    ref = _pack_reference([t or "" for t in texts], list(ids), 16)
    assert out[ref.columns.tolist()].equals(
        ref.astype({c: "int64" for c in ref.columns}))


def test_pack_sequences_doc_spans_windows(quiet_data_context):
    import ray.data as rd

    ds = rd.from_arrow(_docs(["a b c", "d " * 40, "e f"]))
    out = packing.pack_sequences(ds, seq_len=8).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    # doc 0: tokens 0-2 (seq 0); doc 1: tokens 3-42 (seqs 0-5);
    # doc 2: tokens 43-44 (seq 5)
    assert out["first_seq"].tolist() == [0, 0, 5]
    assert out["last_seq"].tolist() == [0, 5, 5]
    assert out["n_seqs"].tolist() == [1, 6, 1]


def test_pack_sequences_empty_dataset(quiet_data_context):
    import ray.data as rd

    ds = rd.from_arrow(_docs([]))
    out = packing.pack_sequences(ds, seq_len=8)
    # to_pandas() on an empty Ray dataset drops columns; the schema is
    # the contract
    assert out.schema().names == ["doc_id", "n_tokens", "token_offset",
                                  "first_seq", "last_seq", "n_seqs"]
    assert out.count() == 0
