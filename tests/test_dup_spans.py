"""Cross-document duplicate n-gram span stats (stages/decontam.dup_span_stats)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from data_quality_check_ray.stages.decontam import dup_span_stats


DOCS = [
    # docs 0 and 1 share the 5-gram run "alpha beta gamma delta epsilon zeta"
    # (two overlapping shared 5-grams each)
    {"doc_id": 0, "text": "alpha beta gamma delta epsilon zeta unique tail zero"},
    {"doc_id": 1, "text": "lead one alpha beta gamma delta epsilon zeta"},
    # doc 2 repeats ITS OWN 5-gram twice but shares nothing cross-doc:
    # intra-doc repetition must not count
    {"doc_id": 2, "text": ("solo aa bb cc dd ee xx solo aa bb cc dd ee")},
    # clean doc, no overlap
    {"doc_id": 3, "text": "completely different words in this document here"},
    # shorter than k words -> 0 grams, frac 0.0
    {"doc_id": 4, "text": "tiny doc"},
    {"doc_id": 5, "text": ""},
    {"doc_id": 6, "text": None},
]


def _scalar_reference(rows, k=5):
    """Row-at-a-time reference: shared gram = in >= 2 distinct docs."""
    grams = {}  # gram -> set(doc_id)
    per_doc = {}
    for r in rows:
        ws = ((r["text"] or "").lower()).split(" ")
        gs = [" ".join(ws[i:i + k]) for i in range(len(ws) - k + 1)]
        per_doc[r["doc_id"]] = gs
        for g in set(gs):
            grams.setdefault(g, set()).add(r["doc_id"])
    out = {}
    for did, gs in per_doc.items():
        n = len(gs)
        d = sum(1 for g in gs if len(grams[g]) >= 2)
        out[did] = (n, d, (d / n) if n else 0.0)
    return out


def _run(rows, k=5, nblocks=1, **kw):
    import ray.data as rd

    ds = rd.from_arrow(pa.Table.from_pylist(rows))
    if nblocks > 1:
        ds = ds.repartition(nblocks)
    return (dup_span_stats(ds, k=k, **kw)
            .to_pandas().set_index("doc_id").sort_index())


@pytest.mark.parametrize("nblocks", [1, 4])
def test_matches_scalar_reference_any_partitioning(quiet_data_context, nblocks):
    out = _run(DOCS, nblocks=nblocks)
    ref = _scalar_reference(DOCS)
    for did, (n, d, f) in ref.items():
        assert out.loc[did, "n_grams"] == n
        assert out.loc[did, "n_dup"] == d, f"doc {did}"
        assert out.loc[did, "dup_frac"] == pytest.approx(f)


def test_intra_doc_repetition_not_counted(quiet_data_context):
    out = _run(DOCS)
    # doc 2's repeated run is unique to doc 2 -> zero cross-doc dup spans
    assert out.loc[2, "n_dup"] == 0
    assert out.loc[2, "dup_frac"] == 0.0
    # but the same run split across TWO docs does count
    assert out.loc[0, "n_dup"] == 2 and out.loc[1, "n_dup"] == 2


def test_short_empty_null_docs(quiet_data_context):
    out = _run(DOCS)
    for did in (4, 5, 6):
        assert out.loc[did, "n_grams"] == 0
        assert out.loc[did, "n_dup"] == 0
        assert out.loc[did, "dup_frac"] == 0.0


def test_exact_duplicate_docs_fully_flagged(quiet_data_context):
    rows = [{"doc_id": i, "text": "one two three four five six seven"}
            for i in range(3)]
    out = _run(rows)
    assert (out["n_grams"] == 3).all()
    assert (out["dup_frac"] == 1.0).all()


@pytest.mark.parametrize("nblocks", [1, 4])
def test_join_path_matches_scalar_reference(quiet_data_context, nblocks):
    """broadcast_limit=0 forces the digest-bucketed membership-join
    regime (the 100-TB heavily-duplicated-corpus path); output must be
    identical to the broadcast regime, including the short/empty/null
    edge docs."""
    out = _run(DOCS, nblocks=nblocks, broadcast_limit=0)
    ref = _scalar_reference(DOCS)
    for did, (n, d, f) in ref.items():
        assert out.loc[did, "n_grams"] == n
        assert out.loc[did, "n_dup"] == d, f"doc {did}"
        assert out.loc[did, "dup_frac"] == pytest.approx(f)


def test_join_path_equals_broadcast_path_real_corpus(quiet_data_context):
    import pandas as pd
    import ray.data as rd

    ds = rd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                         columns=["doc_id", "text"])
    a = (dup_span_stats(ds, k=5).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    b = (dup_span_stats(ds, k=5, broadcast_limit=0).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b[a.columns])
    assert (a["n_dup"] > 0).any()  # corpus has real cross-doc dup spans


def _scalar_trim_reference(rows, k=5):
    """Row-at-a-time trim: token removed iff covered by a shared window."""
    grams = {}
    split = {r["doc_id"]: (r["text"] or "").split(" ") for r in rows}
    for did, ws in split.items():
        lws = [w.lower() for w in ws]
        for i in range(len(ws) - k + 1):
            grams.setdefault(" ".join(lws[i:i + k]), set()).add(did)
    out = {}
    for did, ws in split.items():
        lws = [w.lower() for w in ws]
        cov = [False] * len(ws)
        for i in range(len(ws) - k + 1):
            if len(grams[" ".join(lws[i:i + k])]) >= 2:
                for j in range(i, i + k):
                    cov[j] = True
        kept = [w for w, c in zip(ws, cov) if not c]
        out[did] = (" ".join(kept), sum(cov))
    return out


@pytest.mark.parametrize("nblocks", [1, 4])
def test_trim_matches_scalar_reference(quiet_data_context, nblocks):
    import ray.data as rd

    from data_quality_check_ray.stages.decontam import dup_span_trim

    ds = rd.from_arrow(pa.Table.from_pylist(DOCS))
    if nblocks > 1:
        ds = ds.repartition(nblocks)
    out = (dup_span_trim(ds, k=5).to_pandas()
           .set_index("doc_id").sort_index())
    ref = _scalar_trim_reference(DOCS)
    for did, (txt, nrm) in ref.items():
        assert out.loc[did, "text_trimmed"] == txt, f"doc {did}"
        assert out.loc[did, "n_tokens_removed"] == nrm, f"doc {did}"
    # semantic spot checks: shared run trimmed from BOTH owners,
    # intra-doc repetition untouched, short/empty/null docs identity
    assert out.loc[0, "text_trimmed"] == "unique tail zero"
    assert out.loc[1, "text_trimmed"] == "lead one"
    assert out.loc[2, "n_tokens_removed"] == 0
    for did in (4, 5, 6):
        assert out.loc[did, "n_tokens_removed"] == 0


def test_trim_exact_duplicate_docs_fully_removed(quiet_data_context):
    import ray.data as rd

    from data_quality_check_ray.stages.decontam import dup_span_trim

    rows = [{"doc_id": i, "text": "one two three four five six seven"}
            for i in range(3)]
    out = (dup_span_trim(rd.from_arrow(pa.Table.from_pylist(rows)), k=5)
           .to_pandas())
    assert (out["text_trimmed"] == "").all()
    assert (out["n_tokens_removed"] == 7).all()


def test_trim_preserves_original_case(quiet_data_context):
    """Gram identity is lowercased, but surviving tokens keep their
    original case."""
    import ray.data as rd

    from data_quality_check_ray.stages.decontam import dup_span_trim

    rows = [
        {"doc_id": 0, "text": "Alpha Beta Gamma Delta Epsilon KEEP Me"},
        {"doc_id": 1, "text": "alpha beta gamma delta epsilon other tail"},
    ]
    out = (dup_span_trim(rd.from_arrow(pa.Table.from_pylist(rows)), k=5)
           .to_pandas().set_index("doc_id").sort_index())
    assert out.loc[0, "text_trimmed"] == "KEEP Me"
    assert out.loc[1, "text_trimmed"] == "other tail"


@pytest.mark.parametrize("nblocks", [1, 4])
def test_trim_join_path_matches_scalar_reference(quiet_data_context,
                                                 nblocks):
    """broadcast_limit=0 forces the doc-bucket co-group trim regime (the
    heavily-duplicated-corpus path that used to raise); output must be
    identical to the broadcast regime, including short/empty/null docs."""
    import ray.data as rd

    from data_quality_check_ray.stages.decontam import dup_span_trim

    ds = rd.from_arrow(pa.Table.from_pylist(DOCS))
    if nblocks > 1:
        ds = ds.repartition(nblocks)
    out = (dup_span_trim(ds, k=5, broadcast_limit=0).to_pandas()
           .set_index("doc_id").sort_index())
    ref = _scalar_trim_reference(DOCS)
    for did, (txt, nrm) in ref.items():
        assert out.loc[did, "text_trimmed"] == txt, f"doc {did}"
        assert out.loc[did, "n_tokens_removed"] == nrm, f"doc {did}"


def test_trim_join_path_equals_broadcast_path_real_corpus(
        quiet_data_context):
    import pandas as pd
    import ray.data as rd

    from data_quality_check_ray.stages.decontam import dup_span_trim

    ds = rd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                         columns=["doc_id", "text"])
    a = (dup_span_trim(ds, k=5).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    b = (dup_span_trim(ds, k=5, broadcast_limit=0).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b[a.columns])
    assert (a["n_tokens_removed"] > 0).any()
