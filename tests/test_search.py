"""BM25 keyword ranking (stages/search)."""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pytest

from data_quality_check_ray.stages.search import (
    B,
    K1,
    bm25_scores,
    bm25_topk,
    corpus_stats,
)

DOCS = [
    "join join window scan",          # heavy on query terms
    "hash join stream",               # all three distinct terms
    "the quick brown fox",            # no query terms
    "",                               # empty doc
    None,                             # null doc
    "  window   WINDOW window  ",     # case folding + edge whitespace
]
TERMS = ["join", "window", "hash"]


def _ref_bm25(texts, terms, k1=K1, b=B):
    """Row-at-a-time reference: same tokenization spec (lower, \\s+ split,
    empties dropped), left-to-right term-order float64 accumulation."""
    toks = [(t or "").lower().split() for t in texts]
    n = len(texts)
    dl = [len(x) for x in toks]
    avgdl = sum(dl) / n if n else 1.0
    df = [sum(1 for x in toks if term in x) for term in terms]
    idf = [math.log(1.0 + ((n - d) + 0.5) / (d + 0.5)) for d in df]
    out = []
    for i in range(n):
        s = 0.0
        for t, term in enumerate(terms):
            tf = float(toks[i].count(term))
            s = s + (idf[t] * (tf * (k1 + 1))
                     / (tf + k1 * ((1 - b) + (b * dl[i]) / avgdl)))
        out.append(s)
    return out


def _ds(texts, parallelism=2):
    import ray.data as rd

    tbl = pa.table({
        "doc_id": pa.array(range(len(texts)), type=pa.int64()),
        "text": pa.array(texts, type=pa.large_string()),
    })
    return rd.from_arrow(tbl).repartition(parallelism)


def test_corpus_stats_match_reference(quiet_data_context):
    st = corpus_stats(_ds(DOCS), "text", TERMS)
    assert st["n_docs"] == len(DOCS)
    assert st["sum_dl"] == sum(len((t or "").lower().split()) for t in DOCS)
    assert st["df"].tolist() == [2, 2, 1]


def test_scores_bitwise_match_scalar_reference(quiet_data_context):
    got = (bm25_scores(_ds(DOCS), "text", "doc_id", TERMS)
           .to_pandas().set_index("doc_id")["bm25"].sort_index())
    exp = _ref_bm25(DOCS, TERMS)
    assert np.array_equal(got.to_numpy(), np.array(exp)), (got.tolist(), exp)


def test_scores_partitioning_independent(quiet_data_context):
    a = (bm25_scores(_ds(DOCS, 1), "text", "doc_id", TERMS)
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    b_ = (bm25_scores(_ds(DOCS, 4), "text", "doc_id", TERMS)
          .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert np.array_equal(a["bm25"].to_numpy(), b_["bm25"].to_numpy())


def test_topk_order_and_limit(quiet_data_context):
    top = bm25_topk(_ds(DOCS), "text", "doc_id", TERMS, k=3).to_pandas()
    assert len(top) == 3
    # descending score; rarest-term doc (hash, df=1) outranks the rest
    assert list(top["bm25"]) == sorted(top["bm25"], reverse=True)
    exp = _ref_bm25(DOCS, TERMS)
    want = sorted(range(len(DOCS)), key=lambda i: (-exp[i], i))[:3]
    assert list(top["doc_id"]) == want


def test_no_query_terms_scores_zero(quiet_data_context):
    got = (bm25_scores(_ds(["a b c", "d e"]), "text", "doc_id", ["zzz"])
           .to_pandas())
    assert (got["bm25"] == 0.0).all()


@pytest.mark.parametrize("k", [1, 10])
def test_topk_k_larger_than_corpus(quiet_data_context, k):
    top = bm25_topk(_ds(["join", "x"]), "text", "doc_id", TERMS, k=k)
    assert len(top.to_pandas()) == min(k, 2)


# ---------------------------------------------------------------------------
# TF-IDF keywords
# ---------------------------------------------------------------------------

def _ref_tfidf(texts, k=3):
    toks = [(t or "").lower().split() for t in texts]
    n = len(texts)
    vocab = {w for x in toks for w in x}
    df = {w: sum(1 for x in toks if w in x) for w in vocab}
    rows = []
    for i, x in enumerate(toks):
        scored = sorted(
            ((c * math.log(n / df[w]), w)
             for w, c in {w: x.count(w) for w in set(x)}.items()),
            key=lambda p: (-p[0], p[1]))
        for r, (s, w) in enumerate(scored[:k], 1):
            rows.append((i, w, s, r))
    return rows


@pytest.mark.parametrize("parallelism", [1, 4])
def test_tfidf_matches_scalar_reference(quiet_data_context, parallelism):
    from data_quality_check_ray.stages.search import tfidf_topk_terms

    texts = ["common rare alpha", "common beta beta", "common", "", None,
             "rare rare zeta common"]
    got = (tfidf_topk_terms(_ds(texts, parallelism), "text", "doc_id", k=3)
           .to_pandas().sort_values(["doc_id", "rank"]).reset_index(drop=True))
    exp = _ref_tfidf(texts, 3)
    assert len(got) == len(exp)
    for row, (i, w, s, r) in zip(got.itertuples(index=False), exp):
        assert (row.doc_id, row.term, row.rank) == (i, w, r)
        assert row.tfidf == s  # bit-exact: one int*double multiply


def test_tfidf_empty_and_null_docs_yield_no_rows(quiet_data_context):
    from data_quality_check_ray.stages.search import tfidf_topk_terms

    got = tfidf_topk_terms(_ds(["", None, "   "]), "text", "doc_id",
                           k=3).to_pandas()
    assert len(got) == 0


def test_tfidf_df_broadcast_guard(quiet_data_context):
    from data_quality_check_ray.stages.search import tfidf_topk_terms

    with pytest.raises(ValueError, match="broadcast limit"):
        tfidf_topk_terms(_ds(["a b c d e"]), "text", "doc_id",
                         broadcast_limit=0).to_pandas()
