"""Dedup operators: exact, minhash-LSH, simhash."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from data_quality_check_ray.stages import dedup


def _docs_table():
    base = (
        "the quick brown fox jumps over the lazy dog and runs far away "
        "into the deep green forest near the old stone bridge today"
    )
    near = base.replace("today", "tonight")  # high jaccard
    other = "completely different content about database engines and arrow columnar formats for analytics"
    rows = [
        {"doc_id": 0, "text": base},
        {"doc_id": 1, "text": base},          # exact dup of 0
        {"doc_id": 2, "text": near},          # near dup of 0
        {"doc_id": 3, "text": other},
        {"doc_id": 4, "text": other + " extended with more words here"},
    ]
    return pa.Table.from_pylist(rows)


def test_jaccard_scalar():
    assert dedup.jaccard_scalar("a b c d e", "a b c d e") == 1.0
    assert dedup.jaccard_scalar("a b c d e", "v w x y z") == 0.0


def test_minhash_similarity_tracks_jaccard():
    t = _docs_table()
    sig = dedup.minhash_signatures(t["text"].combine_chunks())
    est01 = (sig[0] == sig[1]).mean()
    est02 = (sig[0] == sig[2]).mean()
    est03 = (sig[0] == sig[3]).mean()
    assert est01 == 1.0
    assert est02 > 0.5
    assert est03 < 0.2


def test_exact_dedup(quiet_data_context):
    import ray.data as rd

    ds = rd.from_arrow(_docs_table())
    out = dedup.exact_dedup(ds).to_pandas()
    assert len(out) == 4  # 0/1 collapse
    assert 0 in set(out["min(doc_id)"])


def test_minhash_dedup_finds_near_dups(quiet_data_context):
    import ray.data as rd

    ds = rd.from_arrow(_docs_table())
    out = dedup.minhash_dedup(ds, threshold=0.5).to_pandas().set_index("doc_id")
    assert out.loc[1, "rep_id"] == 0 and out.loc[1, "is_dup"]
    assert out.loc[2, "rep_id"] == 0 and out.loc[2, "is_dup"]
    assert not out.loc[3, "is_dup"]


def test_simhash_identical_texts_collide(quiet_data_context):
    import ray.data as rd

    ds = rd.from_arrow(_docs_table())
    out = dedup.simhash_dedup(ds).to_pandas().set_index("doc_id")
    assert out.loc[0, "simhash"] == out.loc[1, "simhash"]
    assert out.loc[1, "rep_id"] == 0
    assert out.loc[3, "simhash"] != out.loc[0, "simhash"]


def test_simhash_near_texts_close_hamming():
    t = _docs_table()
    sh = dedup.simhash64(t["text"].combine_chunks())
    ham = bin(int(sh[0]) ^ int(sh[2])).count("1")
    ham_far = bin(int(sh[0]) ^ int(sh[3])).count("1")
    assert ham < ham_far


def test_distributed_connected_components(quiet_data_context):
    import numpy as np
    import ray.data as rd

    from data_quality_check_ray.stages.dedup import connected_components_distributed

    rs = np.random.RandomState(11)
    # a few chains + rings + singleton pairs among 60 nodes
    edges = [(0, 1), (1, 2), (2, 3), (3, 4),          # chain -> label 0
             (10, 11), (11, 12), (12, 10),            # ring  -> label 10
             (20, 21), (30, 31), (40, 41), (41, 42)]
    edges += [(50 + i, 50 + i + 1) for i in range(5)]  # chain 50..55
    t = pa.table({"a": np.array([a for a, _ in edges], dtype=np.int64),
                  "b": np.array([b for _, b in edges], dtype=np.int64)})
    out = (
        connected_components_distributed(rd.from_arrow(t).repartition(3))
        .to_pandas().set_index("node")["label"].to_dict()
    )

    # union-find reference
    parent = {}
    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expect = {x: find(x) for x in parent}
    assert out == expect


def test_minhash_distributed_closure_matches_driver_path(quiet_data_context):
    """pair_limit=0 forces the fully-distributed closure (joins + CC);
    clusters must be identical to the driver union-find path."""
    import ray.data as rd

    ds = rd.from_arrow(_docs_table()).repartition(3)
    driver = (dedup.minhash_dedup(ds, threshold=0.5)
              .to_pandas().sort_values("doc_id").reset_index(drop=True))
    dist = (dedup.minhash_dedup(ds, threshold=0.5, pair_limit=0)
            .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert driver[["doc_id", "rep_id", "is_dup"]].equals(
        dist[["doc_id", "rep_id", "is_dup"]])
    assert dist.set_index("doc_id").loc[1, "rep_id"] == 0
    assert dist.set_index("doc_id").loc[2, "rep_id"] == 0


def test_exact_dedup_fast_matches_md5(quiet_data_context):
    """The vectorized 128-bit digest must collapse exactly the same rows
    as the md5 path."""
    import ray.data as rd

    ds = rd.from_arrow(_docs_table())
    fast = dedup.exact_dedup(ds).to_pandas()
    md5 = dedup.exact_dedup(ds, digest="md5").to_pandas()
    assert sorted(fast["min(doc_id)"]) == sorted(md5["min(doc_id)"])


def test_short_docs_are_not_false_minhash_dups(quiet_data_context):
    """Regression: docs with <3 words have empty shingle sets; they must
    never be clustered together (review finding: all-max sentinel
    signatures collided in every band)."""
    import ray.data as rd

    rows = [
        {"doc_id": 0, "text": "red blue"},
        {"doc_id": 1, "text": "quantum theory"},
        {"doc_id": 2, "text": "x"},
        {"doc_id": 3, "text": "the quick brown fox jumps over the lazy dog today"},
        {"doc_id": 4, "text": "the quick brown fox jumps over the lazy dog tonight"},
    ]
    out = (
        dedup.minhash_dedup(rd.from_arrow(pa.Table.from_pylist(rows)), threshold=0.5)
        .to_pandas().set_index("doc_id")
    )
    assert not out.loc[0, "is_dup"] and not out.loc[1, "is_dup"] and not out.loc[2, "is_dup"]
    assert out.loc[4, "rep_id"] == 3  # real near-dups still found
    assert dedup.jaccard_scalar("red blue", "quantum theory") == 0.0


def test_distributed_cc_long_chain_converges(quiet_data_context):
    """The 200k-corpus failure mode: a near-dup CHAIN much deeper than any
    practical plain-propagation round budget.  Pointer jumping must close
    a 300-hop path in O(log diameter) rounds."""
    import numpy as np
    import ray.data as rd

    from data_quality_check_ray.stages.dedup import (
        connected_components_distributed,
    )

    n = 300
    t = pa.table({
        "a": np.arange(n - 1, dtype=np.int64) + 1000,
        "b": np.arange(1, n, dtype=np.int64) + 1000,
    })
    out = (
        connected_components_distributed(
            rd.from_arrow(t).repartition(4), max_rounds=12
        )
        .to_pandas()
    )
    assert len(out) == n
    assert (out["label"] == 1000).all()


def test_dedup_against_prior_paths_agree_incl_nulls(quiet_data_context, tmp_path):
    """Cross-run dedup: broadcast (small prior, searchsorted membership)
    and distributed (bucketed anti-join) paths return the same kept ids;
    null text matches null text on both (IS NOT DISTINCT FROM)."""
    import ray.data as rd

    from data_quality_check_ray.stages.dedup import (
        content_digests,
        dedup_against_prior,
    )

    prior_t = pa.table({
        "doc_id": pa.array([0, 3, 6], type=pa.int64()),
        "text": pa.array(["seen before", None, "also seen"], type=pa.string()),
    })
    new_t = pa.table({
        "doc_id": pa.array([1, 2, 4, 5, 7, 8], type=pa.int64()),
        "text": pa.array(
            ["seen before",    # dup of prior
             "brand new",      # kept
             None,             # null: dup of prior null
             "brand new",      # within-new dup of 2
             "also seen",      # dup of prior
             ""],              # empty != null: kept
            type=pa.string(),
        ),
    })
    expected = [2, 8]

    # distributed path: lazy prior (metadata probe -> None)
    prior_lazy = content_digests(
        rd.from_arrow(prior_t).map_batches(lambda b: b, batch_format="pyarrow"),
        "text",
    )
    got_dist = sorted(
        dedup_against_prior(rd.from_arrow(new_t), prior_lazy)
        .to_pandas()["doc_id"].tolist()
    )
    assert got_dist == expected

    # broadcast path: digests written + read back as parquet (the real
    # cross-run flow), metadata-sized under the broadcast limit
    import pyarrow.parquet as pq

    d = tmp_path / "digests"
    d.mkdir()
    pq.write_table(
        pa.concat_tables(
            content_digests(rd.from_arrow(prior_t), "text")
            .iter_batches(batch_size=None, batch_format="pyarrow")
        ),
        str(d / "part0.parquet"),
    )
    prior_rd = rd.read_parquet(str(d))
    from data_quality_check_ray.stages.joins import cheap_size_bytes
    assert cheap_size_bytes(prior_rd) is not None  # really the broadcast path
    got_bc = sorted(
        dedup_against_prior(rd.from_arrow(new_t), prior_rd)
        .to_pandas()["doc_id"].tolist()
    )
    assert got_bc == expected
