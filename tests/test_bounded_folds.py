"""The bounded combiner levels (round-4 driver-ingest audit) must
produce the same results as the flat driver folds they replace —
forced on small inputs by disabling the metadata gate."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


def _docs_ds(n=300, nblocks=6):
    import ray.data as rd

    rows = [{"doc_id": i,
             "text": f"alpha beta w{i % 37} gamma w{i % 11} delta common"}
            for i in range(n)]
    return rd.from_arrow(pa.Table.from_pylist(rows)).repartition(nblocks)


def test_dsir_tree_fold_equals_flat(quiet_data_context):
    from data_quality_check_ray.stages import dsir

    ds = _docs_ds()

    def is_target(b):
        return b["doc_id"].to_numpy(zero_copy_only=False) % 7 == 0

    # from_arrow datasets have metadata size -> gate says small; force
    # both paths explicitly through the helper
    def counts(small):
        def partial(b):
            uni, _, big, _ = dsir.featurize_batch(b["text"])
            c = np.bincount(uni, minlength=dsir.B)
            if len(big):
                c += np.bincount(big, minlength=dsir.B)
            nz = np.flatnonzero(c)
            return pa.table({"b": nz.astype(np.int64), "n": c[nz]})

        parts = ds.map_batches(partial, batch_format="pyarrow")
        return dsir._fold_sparse_partials(parts, ("n",), small=small)[0]

    np.testing.assert_array_equal(counts(True), counts(False))


def test_kmeans_tree_fold_equals_flat_labels(quiet_data_context,
                                             monkeypatch):
    import ray.data as rd

    from data_quality_check_ray.stages import cluster

    rng = np.random.RandomState(5)
    mat = rng.randn(120, 6) + np.repeat(np.eye(3, 6) * 8, 40, axis=0)
    t = pa.table({
        "vec_id": pa.array(np.arange(120, dtype=np.int64)),
        "embedding": pa.array([list(map(float, r)) for r in mat]),
    })
    ds = rd.from_arrow(t).repartition(5)

    cen_flat = cluster.kmeans_fit(ds, k=3, iters=3)
    monkeypatch.setattr(cluster, "_small_source", lambda d: False)
    cen_tree = cluster.kmeans_fit(ds, k=3, iters=3)
    # float summation order differs between the folds; labels must agree
    assert np.allclose(cen_flat, cen_tree, atol=1e-9)
    a = cluster.kmeans_assign(ds, cen_flat).to_pandas() \
        .sort_values("vec_id")["cluster_id"].to_numpy()
    b = cluster.kmeans_assign(ds, cen_tree).to_pandas() \
        .sort_values("vec_id")["cluster_id"].to_numpy()
    np.testing.assert_array_equal(a, b)


def test_sketch_tree_merges_equal_flat(quiet_data_context, monkeypatch):
    import ray.data as rd

    from data_quality_check_ray.functions import sketches

    t = pa.table({"user_id": pa.array(
        np.random.RandomState(2).randint(0, 500, size=3000))})
    ds = rd.from_arrow(t).repartition(7)
    flat = sketches.approx_distinct(ds, "user_id")
    monkeypatch.setattr(sketches, "_small_source", lambda d: False)
    tree = sketches.approx_distinct(ds, "user_id")
    assert flat == tree  # HLL max-merge is associative: identical sketch

    t2 = pa.table({"v": pa.array(
        np.random.RandomState(3).gamma(2.0, 10.0, size=5000))})
    ds2 = rd.from_arrow(t2).repartition(7)
    monkeypatch.undo()
    q_flat = sketches.approx_quantiles(ds2, "v")
    monkeypatch.setattr(sketches, "_small_source", lambda d: False)
    q_tree = sketches.approx_quantiles(ds2, "v")
    assert q_flat == q_tree


def test_packing_tree_plan_output_exact(quiet_data_context, monkeypatch):
    """Forcing the combiner levels changes only range BALANCE; the packed
    offsets stay the exact doc_id-ordered prefix sum."""
    import ray.data as rd

    from data_quality_check_ray.stages import packing

    ds = _docs_ds(400, 8)
    flat = packing.pack_sequences(ds, seq_len=16, num_ranges=4) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    real_size = rd.Dataset.size_bytes

    tree = None
    try:
        monkeypatch.setattr(
            rd.Dataset, "size_bytes", lambda self: 8 << 30)
        tree = packing.pack_sequences(ds, seq_len=16, num_ranges=4) \
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
    finally:
        monkeypatch.setattr(rd.Dataset, "size_bytes", real_size)
    import pandas as pd

    pd.testing.assert_frame_equal(flat, tree)
    assert (flat["token_offset"].values
            == flat["n_tokens"].cumsum().shift(fill_value=0).values).all()


def test_corpus_stats_tree_fold_equals_flat(quiet_data_context,
                                            monkeypatch):
    """bm25's corpus_stats got the same 64-way combiner level as the
    other folds (r4 verdict nit #3); the tree must be bit-identical."""
    from data_quality_check_ray.stages import search

    ds = _docs_ds()
    terms = ["alpha", "common", "w3", "missing"]
    flat = search.corpus_stats(ds, "text", terms)
    monkeypatch.setattr(search, "_small_source", lambda *_a, **_k: False)
    tree = search.corpus_stats(ds, "text", terms)
    assert flat["n_docs"] == tree["n_docs"]
    assert flat["sum_dl"] == tree["sum_dl"]
    np.testing.assert_array_equal(flat["df"], tree["df"])
