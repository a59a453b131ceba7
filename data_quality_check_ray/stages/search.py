"""Distributed BM25 keyword ranking over a document corpus.

Okapi BM25 (Robertson-Sparck Jones probabilistic relevance framework;
the Lucene variant with the +1 inside the idf log so scores stay
non-negative) re-expressed Ray-Data-first.  The reference repo has no
search operator — this is part of the training-data/similarity-search
surface the engine adds beyond the reference's per-record validation
core (SURVEY.md §2.6 "absent in reference").

Two streaming sweeps over the text column, zero shuffles:

  pass 1 (stats)  — ``corpus_stats``: per-block Arrow partials -> ONE
                    tiny combine.  The exchange is one row of
                    (2 + |terms|) int64 per block (corpus size N, total
                    token count for avgdl, per-query-term document
                    frequencies); text never moves.
  pass 2 (score)  — ``bm25_topk``: (terms, idf, avgdl) broadcast via
                    ``ray.put`` ONCE; per batch one RE2 split +
                    ``pc.index_in`` against the term table + one
                    bincount gives the (doc x term) tf matrix.  The
                    BM25 sum accumulates LEFT-TO-RIGHT over terms in
                    float64 with the exact association the SQL oracle's
                    ``a + b + ...`` chain uses, so engine and oracle are
                    bit-comparable before rounding.  Per-block top-k
                    partials (k rows/block) -> one tiny final
                    sort+limit.

Tokenization is ``lower(text)`` split on the RE2 ``\\s+`` with empty
tokens dropped — the same RE2 DuckDB's ``string_split_regex`` runs, so
both sides agree byte-for-byte (unlike ``utf8_split_whitespace``, whose
unicode whitespace class differs from RE2's ASCII ``\\s``).

Scale: |terms| is user-query sized (10^0..10^2) so the df/idf state is
trivially broadcastable; full-vocabulary document frequencies would
instead use the boilerplate.py unique-digest count-shuffle pattern.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.textstats import as_single_array
from .cluster import _small_source

K1 = 1.2
B = 0.75


def _token_segments(texts) -> tuple[pa.Array, np.ndarray]:
    """(flat lowered tokens incl. empties, list offsets) for a text col."""
    t = pc.fill_null(pc.cast(as_single_array(texts), pa.large_string()), "")
    toks = as_single_array(pc.split_pattern_regex(pc.utf8_lower(t), r"\s+"))
    flat = as_single_array(pc.list_flatten(toks))
    off = np.asarray(toks.offsets, dtype=np.int64)
    off = off - off[0]  # slice-invariant
    return flat, off


def _doc_term_counts(flat: pa.Array, off: np.ndarray, terms: pa.Array
                     ) -> tuple[np.ndarray, np.ndarray]:
    """-> (dl: int64[n] non-empty token count, tf: int64[n, T])."""
    n, t_count = len(off) - 1, len(terms)
    nonempty = pc.greater(pc.binary_length(flat), 0).to_numpy(
        zero_copy_only=False)
    tok_doc = np.repeat(np.arange(n, dtype=np.int64), np.diff(off))
    dl = np.bincount(tok_doc, weights=nonempty, minlength=n).astype(np.int64)
    idx = pc.index_in(flat, value_set=terms)
    idx_np = idx.to_numpy(zero_copy_only=False)  # float w/ nan for miss
    hit = ~np.isnan(idx_np) & nonempty
    packed = tok_doc[hit] * t_count + idx_np[hit].astype(np.int64)
    tf = np.bincount(packed, minlength=n * t_count).reshape(n, t_count)
    return dl, tf


def corpus_stats(ds, text_col: str, terms: list[str]) -> dict:
    """One streaming pass -> {"n_docs", "sum_dl", "df": int64[T]}.

    Per-block partial = ONE row; combine = one coalesced Arrow sum."""
    terms_arr = pa.array(list(terms), type=pa.large_string())
    t_count = len(terms)

    def partial(b: pa.Table) -> pa.Table:
        flat, off = _token_segments(b[text_col])
        dl, tf = _doc_term_counts(flat, off, terms_arr)
        cols = {
            "n": pa.array([len(dl)], type=pa.int64()),
            "sdl": pa.array([int(dl.sum())], type=pa.int64()),
        }
        present = (tf > 0).sum(axis=0)
        for i in range(t_count):
            cols[f"df{i}"] = pa.array([int(present[i])], type=pa.int64())
        return pa.table(cols)

    def combine(b: pa.Table) -> pa.Table:
        return pa.table({
            name: pa.array([int(pc.sum(b[name]).as_py() or 0)],
                           type=pa.int64())
            for name in b.column_names
        })

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=None)
    # bounded combiner level above the small-source gate: a flat
    # repartition(1) fold ingests one 1-row partial PER BLOCK — ~10^7
    # rows x (2+|terms|) int64 at 10^12 docs — while the tree caps the
    # final task at 64 already-reduced partials.  Integer sums are
    # associative, so the tree is bit-identical to the flat fold.
    if not _small_source(ds):
        parts = parts.repartition(64).map_batches(
            combine, batch_format="pyarrow", batch_size=None)
    row = (parts.repartition(1)
             .map_batches(combine, batch_format="pyarrow", batch_size=None)
             .take_all())[0]
    return {
        "n_docs": int(row["n"]),
        "sum_dl": int(row["sdl"]),
        "df": np.array([int(row[f"df{i}"]) for i in range(t_count)],
                       dtype=np.int64),
    }


def bm25_scores(ds, text_col: str, id_col: str, terms: list[str],
                stats: dict | None = None):
    """-> Dataset(id_col, bm25: float64 raw score) for every document."""
    import ray

    if stats is None:
        stats = corpus_stats(ds, text_col, terms)
    n_docs = stats["n_docs"]
    # avgdl and idf computed ONCE from the same integer stats the oracle
    # aggregates, with the oracle's exact expression shapes.  math.log,
    # not np.log: numpy's SIMD log differs from libm by 1 ulp on some
    # inputs, and DuckDB's ln IS libm
    import math

    avgdl = float(stats["sum_dl"]) / n_docs if n_docs else 1.0
    idf = np.array([
        math.log(1.0 + ((n_docs - float(d)) + 0.5) / (float(d) + 0.5))
        for d in stats["df"]], dtype=np.float64)
    bcast = ray.put((list(terms), idf, avgdl))

    def score(b: pa.Table) -> pa.Table:
        ts, idf_v, ad = ray.get(bcast)
        terms_arr = pa.array(ts, type=pa.large_string())
        flat, off = _token_segments(b[text_col])
        dl, tf = _doc_term_counts(flat, off, terms_arr)
        dlf = dl.astype(np.float64)
        score = np.zeros(len(dl), dtype=np.float64)
        for t in range(len(ts)):  # left-to-right, matching the SQL chain
            tfv = tf[:, t].astype(np.float64)
            score = score + (idf_v[t] * (tfv * (K1 + 1))
                             / (tfv + K1 * ((1 - B) + (B * dlf) / ad)))
        return pa.table({id_col: b[id_col],
                         "bm25": pa.array(score, type=pa.float64())})

    return ds.map_batches(score, batch_format="pyarrow")


def bm25_topk(ds, text_col: str, id_col: str, terms: list[str],
              k: int = 10, stats: dict | None = None):
    """Top-k docs by (bm25 desc, id asc): per-block partial top-k
    (k candidate rows per block cross the wire) -> tiny final sort."""
    from .topk import global_topk

    scored = bm25_scores(ds, text_col, id_col, terms, stats=stats)
    return global_topk(
        scored, [("bm25", "descending"), (id_col, "ascending")], k)


# ---------------------------------------------------------------------------
# TF-IDF keyword extraction (full-vocabulary document frequencies)
# ---------------------------------------------------------------------------

#: pd.util.hash_array keys for the 128-bit term digest (16 bytes each);
#: must only agree between the df pass and the scoring pass
_TERM_KEY_LO = "tfidftermlokey00"
_TERM_KEY_HI = "tfidftermhikey11"
#: refuse to broadcast a df table larger than this — fail fast instead of
#: OOMing every scoring task.  Vocabulary grows sublinearly in corpus
#: size (Heaps' law), so real web-corpus df tables stay broadcastable
#: long after the corpus itself does not; past the limit, attach df by a
#: bucketed hash join on the digest (the dedup.dedup_against_prior dual
#: path) instead of raising.
DF_BROADCAST_BYTES = 512 << 20


def _term_digests(words: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    import pandas as pd

    obj = np.asarray(words.to_numpy(zero_copy_only=False), dtype=object)
    lo = pd.util.hash_array(obj, hash_key=_TERM_KEY_LO)
    hi = pd.util.hash_array(obj, hash_key=_TERM_KEY_HI)
    return lo.astype(np.int64), hi.astype(np.int64)


def _doc_term_pairs(b_texts, t_count_guard=None):
    """batch text col -> (dictionary words, per-pair (doc, code, tf)).

    Tokenization = the module's RE2 spec.  The (doc, code) pair counting
    runs over dictionary CODES via the shared overflow-guarded
    pair_unique kernel."""
    from ..functions.segments import pair_unique
    from ..functions.textstats import as_single_array

    flat, off = _token_segments(b_texts)
    n = len(off) - 1
    nonempty = pc.greater(pc.binary_length(flat), 0).to_numpy(
        zero_copy_only=False)
    dct = as_single_array(flat).dictionary_encode()
    codes = np.asarray(dct.indices, dtype=np.int64)
    tok_doc = np.repeat(np.arange(n, dtype=np.int64), np.diff(off))
    d, c, tf = pair_unique(tok_doc[nonempty], codes[nonempty],
                           return_counts=True)
    return dct.dictionary, d, c, tf


def tfidf_doc_frequencies(ds, text_col: str):
    """-> Dataset(fp_lo, fp_hi, df): corpus-wide document frequency per
    distinct term digest.  One 24 B/unique-term-per-block shuffle; a doc
    lives in exactly one block, so per-block distinct (doc, term) counts
    sum to the global distinct-doc count per term."""

    def partial(b: pa.Table) -> pa.Table:
        words, _, c, _ = _doc_term_pairs(b[text_col])
        if len(c) == 0:
            return pa.table({"fp_lo": pa.array([], type=pa.int64()),
                             "fp_hi": pa.array([], type=pa.int64()),
                             "df": pa.array([], type=pa.int64())})
        per_code = np.bincount(c, minlength=len(words)).astype(np.int64)
        lo, hi = _term_digests(words)
        used = per_code > 0
        return pa.table({"fp_lo": lo[used], "fp_hi": hi[used],
                         "df": per_code[used]})

    from .groupagg import grouped_agg_bucketed
    from .joins import cheap_size_bytes

    tb = cheap_size_bytes(ds)
    return grouped_agg_bucketed(
        ds.map_batches(partial, batch_format="pyarrow"),
        keys=["fp_lo", "fp_hi"], aggs=[("df", "sum")],
        input_bytes=tb // 2 if tb else None,  # 24 B/unique term per block
    ).map_batches(
        lambda t: t.rename_columns(["fp_lo", "fp_hi", "sum(df)"]),
        batch_format="pyarrow")


def tfidf_topk_terms(ds, text_col: str, id_col: str, k: int = 3,
                     n_docs: int | None = None,
                     broadcast_limit: int = DF_BROADCAST_BYTES):
    """-> Dataset(id_col, term, tfidf, rank): top-k terms per document by
    ``tf * ln(N / df)``, ties broken by term byte order.

    Two streaming sweeps (df pass above, scoring pass here) and zero
    text shuffles; the (digest -> df) table broadcasts once with a
    fail-fast size guard (see DF_BROADCAST_BYTES).  Scoring is entirely
    block-local: each doc is one row, so per-doc top-k needs no grouping
    exchange — the output IS k rows per doc."""
    import ray

    if n_docs is None:
        n_docs = ds.count()  # parquet metadata when called on a fresh read
    # digest-only (24 B/term) materialized handle: sized with a streaming
    # count BEFORE anything reaches the driver, then collected
    dfds = tfidf_doc_frequencies(ds, text_col).materialize()
    if dfds.count() * 24 > broadcast_limit:
        raise ValueError(
            f"df table exceeds the {broadcast_limit >> 20}"
            " MiB broadcast limit: attach df via a bucketed hash join on"
            " the term digest instead (dedup_against_prior dual-path)")
    dft = pa.concat_tables(
        [pa.schema([("fp_lo", pa.int64()), ("fp_hi", pa.int64()),
                    ("sum(df)", pa.int64())]).empty_table()]
        + list(dfds.iter_batches(batch_size=None, batch_format="pyarrow"))
    )
    lo = dft["fp_lo"].to_numpy(zero_copy_only=False).astype(np.int64)
    hi = dft["fp_hi"].to_numpy(zero_copy_only=False).astype(np.int64)
    dfv = dft["sum(df)"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((hi, lo))
    ref = ray.put((lo[order], hi[order], dfv[order], int(n_docs)))

    def score(b: pa.Table) -> pa.Table:
        slo, shi, sdf, n_total = ray.get(ref)
        words, d, c, tf = _doc_term_pairs(b[text_col])
        empty = pa.table({
            id_col: pa.array([], type=b[id_col].type),
            "term": pa.array([], type=pa.large_string()),
            "tfidf": pa.array([], type=pa.float64()),
            "rank": pa.array([], type=pa.int64()),
        })
        if len(d) == 0:
            return empty
        wlo, whi = _term_digests(words)
        left = np.searchsorted(slo, wlo, side="left")
        right = np.searchsorted(slo, wlo, side="right")
        dfw = np.ones(len(words), dtype=np.int64)  # unmatched: df=1 guard
        one = (right - left) == 1
        cand = left[one]
        hit = shi[cand] == whi[one]
        dfw[one] = np.where(hit, sdf[cand], 1)
        for i in np.nonzero(right - left > 1)[0]:  # fp_lo collision: rare
            js = np.nonzero(shi[left[i]:right[i]] == whi[i])[0]
            if len(js):
                dfw[i] = sdf[left[i] + js[0]]
        # libm log per UNIQUE df value (numpy's SIMD log is 1 ulp off
        # libm on some inputs; DuckDB's ln is libm) — distinct df values
        # are at most n_docs, in practice a handful per batch
        import math

        u, inv = np.unique(dfw, return_inverse=True)
        idf = np.array([math.log(n_total / int(x)) for x in u],
                       dtype=np.float64)[inv]
        s = tf.astype(np.float64) * idf[c]
        ids = b[id_col].take(pa.array(d))
        terms = words.take(pa.array(c))
        t = pa.table({id_col: ids,
                      "term": pc.cast(terms, pa.large_string()),
                      "tfidf": pa.array(s, type=pa.float64())})
        idx = pc.sort_indices(t, sort_keys=[
            (id_col, "ascending"), ("tfidf", "descending"),
            ("term", "ascending")])
        t = t.take(idx)
        di = t[id_col].to_numpy(zero_copy_only=False)
        starts = np.concatenate(
            [[0], np.flatnonzero(di[1:] != di[:-1]) + 1])
        runs = np.diff(np.concatenate([starts, [len(di)]]))
        pos = np.arange(len(di)) - np.repeat(starts, runs)
        keep = pos < k
        return t.filter(pa.array(keep)).append_column(
            "rank", pa.array(pos[keep] + 1, type=pa.int64()))

    return ds.map_batches(score, batch_format="pyarrow")
