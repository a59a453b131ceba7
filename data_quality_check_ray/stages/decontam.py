"""Benchmark decontamination (SURVEY.md §2 training-data ops).

Training corpora must not contain the evaluation benchmarks.  The
standard recipe (GPT-3 appendix C, PaLM, Llama): build the set of word
n-grams occurring in any eval document, then flag every training doc
that contains one.  Shapes as two Ray Data stages and ZERO shuffles:

    build  [map_batches + driver fold]  eval docs -> unique n-gram hash
           set, sorted, ``ray.put`` ONCE (eval sets are small by nature —
           benchmarks are thousands of docs, not billions; a limit guard
           fails fast otherwise)
    scan   [map_batches]  per training batch: vectorized shingle hashes,
           searchsorted membership, per-doc hit counts via bincount

N-gram identity = lowercased text split on single spaces, k consecutive
words — matching the SQL oracle's string_split definition; the engine
compares 63-bit polynomial word-hash digests, so engine-vs-oracle
differences reduce to hash collisions (~1e-7 at 1e6 distinct shingles).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.segments import row_ids_from_offsets
from ..functions.textstats import as_single_array

#: refuse to broadcast an eval n-gram set larger than this
EVAL_BROADCAST_BYTES = 512 << 20


def _shingle_hash_full(texts, k: int):
    """-> (h, rows, starts, words, woff): shingle digests plus the data
    a span TRIM needs — ``starts`` = each valid window's start index
    into the flat token stream, ``words`` = the ORIGINAL-case flat
    tokens (pa.Array), ``woff`` = per-doc offsets into them.

    Gram identity is unchanged from the original kernel (lowercased
    single-space split, SQL string_split parity): splitting before
    lowering is equivalent because no case mapping produces a space,
    and the per-UNIQUE-word hash is taken over the LOWERED dictionary —
    same strings, same digests."""
    from ..functions.segments import list_to_numpy_segments

    arr = as_single_array(texts)
    arr = pc.fill_null(pc.cast(arr, pa.large_string()), "")
    words_list = pc.split_pattern(arr, " ")
    wvals, woff = list_to_numpy_segments(words_list)
    words = as_single_array(wvals)
    n_rows = len(woff) - 1
    e = np.array([], dtype=np.int64)
    if len(wvals) < k:
        return e, e, e, words, woff
    dct = words.dictionary_encode()
    uniq = np.asarray(
        pc.utf8_lower(dct.dictionary).to_numpy(zero_copy_only=False),
        dtype=object)
    uh = pd.util.hash_array(uniq)
    wh = uh[np.asarray(dct.indices, dtype=np.int64)]
    row_ids = row_ids_from_offsets(woff)
    n = len(wh)
    P = np.uint64(1099511628211)
    sh = wh[: n - k + 1].copy()
    for j in range(1, k):
        sh = sh * P + wh[j: n - k + 1 + j]
    valid = row_ids[: n - k + 1] == row_ids[k - 1:]
    h = (sh[valid] >> np.uint64(1)).astype(np.int64)
    rows = row_ids[: n - k + 1][valid]
    starts = np.flatnonzero(valid).astype(np.int64)
    return h, rows, starts, words, woff


def _shingle_hash_rows(texts, k: int):
    """-> (hash per shingle int64, owning-row id per shingle int64, n_rows).

    Lower + single-space split (SQL string_split parity); shingle hash =
    polynomial combine of per-UNIQUE-word 64-bit hashes (the
    ``stages/dedup.shingle_hashes`` factoring: hashing cost scales with
    the batch VOCABULARY, not the token stream — the earlier
    per-occurrence string-join + object-array hash measured 27k docs/s at
    3.2M docs; this path removes both per-shingle allocations)."""
    h, rows, _, _, woff = _shingle_hash_full(texts, k)
    return h, rows, len(woff) - 1


def eval_ngram_set(eval_ds, text_col: str = "text", k: int = 8,
                   broadcast_limit: int = EVAL_BROADCAST_BYTES):
    """-> sorted np.int64 array of the eval corpus's distinct n-gram
    hashes (the broadcast side of ``flag_contaminated``).

    The size guard runs on a STREAMING bound BEFORE the driver collects
    anything (per-block unique-count partials summed distributedly —
    an upper bound on the global distinct count, since the true size
    only shrinks under cross-block dedup): a mistakenly-huge "eval"
    input fails fast without ever materializing on the driver."""

    def partial(b: pa.Table) -> pa.Table:
        h, _, _ = _shingle_hash_rows(b[text_col], k)
        return pa.table({"h": np.unique(h)})

    uniq = eval_ds.map_batches(partial, batch_format="pyarrow") \
        .materialize()  # digest-only (8 B/gram); consumed twice below
    if uniq.count() * 8 > broadcast_limit:
        # the streaming bound is an OVERestimate (per-block uniques can
        # repeat across blocks), so before rejecting a near-limit input,
        # dedup distributedly and re-check the EXACT distinct size — a
        # legitimate eval corpus with heavy cross-block repetition must
        # not fail a guard its true set passes.  The extra shuffle only
        # runs on the suspect path; digests only, still no text moves.
        from .groupagg import distinct_bucketed

        uniq = distinct_bucketed(
            uniq, keys="h", input_bytes=uniq.size_bytes()).materialize()
        if uniq.count() * 8 > broadcast_limit:
            raise ValueError(
                f"eval n-gram set exceeds {broadcast_limit >> 20} MiB "
                "after dedup: not an eval-benchmark-sized input — shard "
                "it or raise the limit"
            )
    parts = list(uniq.iter_batches(batch_size=None, batch_format="pyarrow"))
    if not parts:
        return np.array([], dtype=np.int64)
    return np.unique(np.concatenate(
        [p["h"].to_numpy(zero_copy_only=False) for p in parts]
    ))


def flag_contaminated(ds, eval_hashes: np.ndarray, text_col: str = "text",
                      id_col: str = "doc_id", k: int = 8):
    """-> Dataset(id_col, n_contaminated, contaminated).

    ``n_contaminated`` counts n-gram OCCURRENCES in the doc that appear
    in the eval set (a doc repeating one leaked n-gram 5 times counts 5);
    ``contaminated`` is n_contaminated > 0.  ``eval_hashes`` comes from
    ``eval_ngram_set`` and is shipped via ``ray.put`` once."""
    import ray

    ref = ray.put(np.sort(np.asarray(eval_hashes, dtype=np.int64)))

    def scan(b: pa.Table) -> pa.Table:
        ev = ray.get(ref)
        h, rows, n_rows = _shingle_hash_rows(b[text_col], k)
        if len(h) and len(ev):
            pos = np.searchsorted(ev, h)
            pos[pos == len(ev)] = 0
            hit = ev[pos] == h
            n = np.bincount(rows[hit], minlength=n_rows).astype(np.int64)
        else:
            n = np.zeros(n_rows, dtype=np.int64)
        return pa.table({
            id_col: b[id_col],
            "n_contaminated": pa.array(n),
            "contaminated": pa.array(n > 0),
        })

    return ds.map_batches(scan, batch_format="pyarrow")


def _shared_gram_set_ds(ds, text_col: str, k: int):
    """Digest-only Dataset of the k-gram hashes occurring in >= 2
    DISTINCT documents — the shared spine of ``dup_span_stats`` and
    ``dup_span_trim``.  One shuffle of (digest, partial-distinct-doc-
    count) int64 pairs; the text never moves.

    MATERIALIZED before returning (8 B/digest, the object store spills
    if huge): every caller consumes it twice — a metadata-only ``count()``
    for the broadcast-vs-join regime decision FIRST, then either the
    driver collect or the join build side — and must never re-run the
    text-shingling shuffle, nor collect anything it has not already
    sized.

    The digest merge is a BUCKETED hash aggregate (``grouped_agg_bucketed``),
    not Ray's sort-based groupby: millions of distinct int64 keys make the
    sort + per-key reduce the dominant cost (measured at sf0.1: 6.2 s
    sort-groupby vs 1.2 s bucketed, identical output).  Buckets are sized
    from the text bytes (the digest stream is <= ~3x the text)."""
    from .groupagg import grouped_agg_bucketed
    from .joins import cheap_size_bytes

    def partial(b: pa.Table) -> pa.Table:
        h, rows, _ = _shingle_hash_rows(b[text_col], k)
        if not len(h):
            return pa.table({"h": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        # unique (digest, owning-doc) pairs, then docs per digest —
        # docs never span blocks, so partials sum exactly
        order = np.lexsort((rows, h))
        hs, rs = h[order], rows[order]
        first = np.empty(len(hs), dtype=bool)
        first[0] = True
        first[1:] = (hs[1:] != hs[:-1]) | (rs[1:] != rs[:-1])
        uniq, ndocs = np.unique(hs[first], return_counts=True)
        return pa.table({"h": uniq, "n": ndocs.astype(np.int64)})

    text_bytes = cheap_size_bytes(ds)
    return grouped_agg_bucketed(
        ds.map_batches(partial, batch_format="pyarrow"),
        keys="h", aggs=[("n", "sum")],
        input_bytes=3 * text_bytes if text_bytes else None,
        bucket_post=lambda t: t.filter(
            pc.greater_equal(t["n_sum"], 2)).select(["h"]),
    ).materialize()


def _trim_rebuild(ids, words, woff: np.ndarray, covered: np.ndarray,
                  id_col: str) -> pa.Table:
    """Rebuild trimmed text from a flat token stream + coverage mask —
    the single output kernel shared by BOTH ``dup_span_trim`` regimes,
    so broadcast and join answers are identical by construction.
    ``ids``: pa.Array aligned to docs; ``words``: flat pa tokens;
    ``woff``: per-doc offsets; ``covered``: bool per token."""
    n_rows = len(woff) - 1
    keep = ~covered
    tok_rows = row_ids_from_offsets(woff)
    kept_words = words.filter(pa.array(keep))
    kept_per_doc = np.bincount(tok_rows[keep], minlength=n_rows)
    new_off = np.zeros(n_rows + 1, dtype=np.int64)
    np.cumsum(kept_per_doc, out=new_off[1:])
    lists = pa.LargeListArray.from_arrays(
        pa.array(new_off), pc.cast(kept_words, pa.large_string()))
    removed = np.bincount(tok_rows[covered], minlength=n_rows)
    return pa.table({
        id_col: ids,
        "text_trimmed": pc.binary_join(
            lists, pa.scalar(" ", pa.large_string())),
        "n_tokens_removed": pa.array(removed.astype(np.int64)),
    })


def _dup_span_join_path(ds, shared_ds, text_col: str, id_col: str, k: int):
    """Scale regime of ``dup_span_stats``: the shared-digest set exceeds
    the broadcast budget (corpus dominated by cross-doc duplication), so
    membership is a digest-bucketed hash join instead of a driver-held
    sorted array.  Output is identical to the broadcast regime.

    Dataflow (all int64-only, the text still never shuffles):

      pairs   [map_batches]   (digest, doc_id, occurrences) per unique
              (digest, doc) pair — docs never span blocks, so per-block
              occurrence counts are globally exact
      hits    [hash_join on digest]  pairs SEMI-JOIN shared digests;
              ``bucket_reduce`` pre-aggregates occurrences per doc inside
              each bucket, so the next shuffle moves per-(bucket, doc)
              partials, not per-gram rows
      n_dup   [groupby(doc).sum]
      totals  [map_batches]   (doc_id, n_grams) from a split-count only —
              no hashing; n_grams = max(0, words - k + 1)
      out     [hash_join on doc_id, left]  totals + n_dup, nulls -> 0

    Partitioning assumptions: integer ``id_col`` (the join buckets by an
    integer scramble), and bucket counts sized from read-metadata bytes
    (the pair stream is ~3-4x the text bytes in the worst case — every
    window a unique pair — so buckets are sized from 4x the input)."""
    from .joins import buckets_for_bytes, cheap_size_bytes, hash_join

    def pair_partial(b: pa.Table) -> pa.Table:
        h, rows, _ = _shingle_hash_rows(b[text_col], k)
        ids = as_single_array(b[id_col])
        if not len(h):
            return pa.table({
                "h": pa.array([], pa.int64()),
                "__doc": ids.slice(0, 0),
                "c": pa.array([], pa.int64()),
            })
        order = np.lexsort((rows, h))
        hs, rs = h[order], rows[order]
        first = np.empty(len(hs), dtype=bool)
        first[0] = True
        first[1:] = (hs[1:] != hs[:-1]) | (rs[1:] != rs[:-1])
        starts = np.flatnonzero(first)
        occ = np.diff(np.append(starts, len(hs))).astype(np.int64)
        return pa.table({
            "h": pa.array(hs[first]),
            "__doc": ids.take(pa.array(rs[first])),
            "c": pa.array(occ),
        })

    text_bytes = cheap_size_bytes(ds)
    pair_buckets = buckets_for_bytes(4 * text_bytes if text_bytes else None)
    pairs = ds.map_batches(pair_partial, batch_format="pyarrow")

    def per_doc_partial(t: pa.Table) -> pa.Table:
        g = t.group_by("__doc").aggregate([("c", "sum")])
        return g.select(["__doc", "c_sum"])

    from .groupagg import grouped_agg_bucketed

    hits = hash_join(pairs, shared_ds, key="h",
                     num_buckets=pair_buckets,
                     bucket_reduce=per_doc_partial)
    n_dup = grouped_agg_bucketed(
        hits, keys="__doc", aggs=[("c_sum", "sum")],
        num_buckets=pair_buckets,
    ).map_batches(lambda t: t.rename_columns(["__doc", "__n_dup"]),
                  batch_format="pyarrow")

    def totals_map(b: pa.Table) -> pa.Table:
        arr = as_single_array(b[text_col])
        arr = pc.fill_null(pc.cast(arr, pa.large_string()), "")
        nw = pc.list_value_length(pc.split_pattern(arr, " "))
        nw = nw.to_numpy(zero_copy_only=False).astype(np.int64)
        ng = np.maximum(nw - (k - 1), 0)
        return pa.table({id_col: b[id_col], "n_grams": pa.array(ng)})

    totals = ds.map_batches(totals_map, batch_format="pyarrow")
    doc_buckets = buckets_for_bytes(
        text_bytes // 8 if text_bytes else None)
    joined = hash_join(totals, n_dup, key=id_col, right_key="__doc",
                       how="left", num_buckets=doc_buckets)

    def finalize(b: pa.Table) -> pa.Table:
        total = b["n_grams"].to_numpy(zero_copy_only=False)
        dup = pc.fill_null(b["__n_dup"], 0).to_numpy(zero_copy_only=False)
        dup = dup.astype(np.int64)
        frac = np.where(total > 0, dup / np.maximum(total, 1), 0.0)
        return pa.table({
            id_col: b[id_col],
            "n_grams": b["n_grams"],
            "n_dup": pa.array(dup),
            "dup_frac": pa.array(frac),
        })

    return joined.map_batches(finalize, batch_format="pyarrow")


def dup_span_stats(ds, text_col: str = "text", id_col: str = "doc_id",
                   k: int = 5, broadcast_limit: int = EVAL_BROADCAST_BYTES):
    """Cross-document duplicate n-gram span statistics (the flag/measure
    half of the Lee et al. 2022 "Deduplicating Training Data" substring
    recipe, recast for Ray Data) -> Dataset(id_col, n_grams, n_dup,
    dup_frac).

    For every doc: ``n_grams`` = its k-gram window count, ``n_dup`` = how
    many of those windows also occur in AT LEAST ONE OTHER document (so
    intra-doc repetition — already covered by the Gopher rules — does not
    inflate it), ``dup_frac`` = n_dup / n_grams (0.0 for docs shorter
    than k words).  Downstream curation drops or trims docs above a
    dup_frac threshold.

    Shape: two streaming passes over the text plus ONE shuffle of
    (gram-digest, partial-distinct-doc-count) int64 pairs — 16 bytes per
    unique gram per block; the text itself never shuffles:

      count   [map_batches]  per block: shingle digests via the shared
              ``_shingle_hash_rows`` kernel, then UNIQUE (digest, doc)
              pairs -> per-digest distinct-doc partials (docs never span
              blocks, so partials sum exactly)
      merge   [groupby.sum]  global distinct-doc count per digest; keep
              digests seen in >= 2 docs
      scan    [map_batches]  broadcast the shared-digest set once
              (``ray.put``), searchsorted membership, per-doc
              occurrence fractions via bincount

    Two regimes, chosen by a STREAMING size probe (the shared-digest set
    is counted via a distributed aggregate BEFORE any driver collect —
    the driver never materializes an array it has not already sized):

    * broadcast (duplication is the exception, the common case): the
      shared set fits ``broadcast_limit`` -> collect, ``ray.put`` once,
      searchsorted membership per batch.  One digest shuffle total.
    * bucketed membership join (heavily duplicated corpus): the shared
      set stays distributed; per-doc duplicate counts come from a
      digest-bucketed hash join of the (digest, doc, occurrences)
      stream against the shared-digest table — see
      ``_dup_span_join_path``.  Three extra int-only shuffles, text
      still never moves.  Requires an integer ``id_col`` (the join
      buckets by integer key); the broadcast regime has no such
      constraint."""
    import ray

    shared_ds = _shared_gram_set_ds(ds, text_col, k)
    if shared_ds.count() * 8 > broadcast_limit:
        return _dup_span_join_path(ds, shared_ds, text_col, id_col, k)
    shared_parts = [
        p["h"].to_numpy(zero_copy_only=False)
        for p in shared_ds.iter_batches(batch_size=None,
                                        batch_format="pyarrow")
    ]
    shared = (np.sort(np.concatenate(shared_parts))
              if shared_parts else np.array([], dtype=np.int64))
    ref = ray.put(shared)

    def scan(b: pa.Table) -> pa.Table:
        sh = ray.get(ref)
        h, rows, n_rows = _shingle_hash_rows(b[text_col], k)
        total = np.bincount(rows, minlength=n_rows).astype(np.int64)
        if len(h) and len(sh):
            pos = np.searchsorted(sh, h)
            pos[pos == len(sh)] = 0
            hit = sh[pos] == h
            dup = np.bincount(rows[hit], minlength=n_rows).astype(np.int64)
        else:
            dup = np.zeros(n_rows, dtype=np.int64)
        frac = np.where(total > 0, dup / np.maximum(total, 1), 0.0)
        return pa.table({
            id_col: b[id_col],
            "n_grams": pa.array(total),
            "n_dup": pa.array(dup),
            "dup_frac": pa.array(frac),
        })

    return ds.map_batches(scan, batch_format="pyarrow")


def dup_span_trim(ds, text_col: str = "text", id_col: str = "doc_id",
                  k: int = 5, broadcast_limit: int = EVAL_BROADCAST_BYTES):
    """The REMOVE half of the Lee et al. 2022 substring-dedup recipe
    (``dup_span_stats`` measures; this trims): every token covered by at
    least one cross-document duplicate k-gram window is deleted, and the
    doc is re-joined from the survivors -> Dataset(id_col, text_trimmed,
    n_tokens_removed).

    Same dataflow as the stats operator — ONE digest shuffle to find
    grams in >= 2 docs, the shared set MATERIALIZED and size-gated by a
    metadata-only ``count()`` BEFORE the driver collects a single byte
    (the stats operator's regime probe).  Below ``broadcast_limit`` the
    set broadcasts once; above it, membership routes through the
    digest-bucketed join regime (``_dup_span_trim_join_path`` — integer
    ``id_col`` required there, like the stats join regime).  The scan
    pass marks covered tokens with a difference array over window
    starts (O(tokens), no per-window loop) and rebuilds text arrow-side
    (filter + list join).  Null text trims to '' (the split identity
    used everywhere here)."""
    import ray

    shared_ds = _shared_gram_set_ds(ds, text_col, k)
    if shared_ds.count() * 8 > broadcast_limit:
        return _dup_span_trim_join_path(ds, shared_ds, text_col, id_col, k)
    shared_parts = [
        p["h"].to_numpy(zero_copy_only=False)
        for p in shared_ds.iter_batches(batch_size=None,
                                        batch_format="pyarrow")
    ]
    shared = (np.sort(np.concatenate(shared_parts))
              if shared_parts else np.array([], dtype=np.int64))
    ref = ray.put(shared)

    def trim(b: pa.Table) -> pa.Table:
        sh = ray.get(ref)
        h, rows, starts, words, woff = _shingle_hash_full(b[text_col], k)
        n_tok = len(words)
        covered = np.zeros(n_tok, dtype=bool)
        if len(h) and len(sh):
            pos = np.searchsorted(sh, h)
            pos[pos == len(sh)] = 0
            s = starts[sh[pos] == h]
            if len(s):
                diff = np.zeros(n_tok + 1, dtype=np.int64)
                np.add.at(diff, s, 1)
                np.add.at(diff, s + k, -1)  # windows never span docs,
                # so s + k <= owning doc's end <= n_tok
                covered = np.cumsum(diff[:-1]) > 0
        return _trim_rebuild(b[id_col], words, woff, covered, id_col)

    return ds.map_batches(trim, batch_format="pyarrow")


def _dup_span_trim_join_path(ds, shared_ds, text_col: str, id_col: str,
                             k: int):
    """Scale regime of ``dup_span_trim``: the shared-digest set exceeds
    the broadcast budget (corpus dominated by cross-doc duplication), so
    duplicated-window membership routes through digest-bucketed joins.
    Output is identical to the broadcast regime (``_trim_rebuild`` is
    the shared output kernel; parity forced by ``test_dup_spans``).

    Dataflow — the only stage that moves text is the final co-group, and
    trim output is text-sized anyway, so one text shuffle is the floor:

      occ     [map_batches]  (digest, doc_id, start) per WINDOW
              OCCURRENCE, start doc-relative — occurrence-level because
              every covered token position must be marked (~24 B/window,
              the documented worst case of the stats join regime)
      hits    [hash_join on digest]  occ SEMI-JOIN shared digests;
              bucket_reduce projects to (doc_id, start)
      out     [doc-bucket co-group]  text rows and their hit rows tagged
              with the SAME integer-scrambled doc bucket, unioned
              (schema-stable null padding), grouped once — each group
              owns every hit of its docs by construction, so the
              in-group difference-array coverage + ``_trim_rebuild`` is
              globally exact.  (A plain hash_join cannot carry the
              per-doc start lists: Acero rejects list payload columns.)

    Partitioning assumptions: integer, unique ``id_col`` (both doc-keyed
    hops bucket by an integer scramble); bucket counts sized from
    read-metadata bytes (occ stream ~4x text bytes in the worst case)."""
    from ..functions.segments import list_to_numpy_segments
    from .joins import (_bucket_of, buckets_for_bytes, cheap_size_bytes,
                        hash_join)

    def occ_partial(b: pa.Table) -> pa.Table:
        h, rows, starts, _, woff = _shingle_hash_full(b[text_col], k)
        ids = as_single_array(b[id_col])
        if not len(h):
            return pa.table({
                "h": pa.array([], pa.int64()),
                "__doc": ids.slice(0, 0),
                "s": pa.array([], pa.int64()),
            })
        rel = starts - woff[rows]
        return pa.table({
            "h": pa.array(h),
            "__doc": ids.take(pa.array(rows)),
            "s": pa.array(rel.astype(np.int64)),
        })

    text_bytes = cheap_size_bytes(ds)
    occ_buckets = buckets_for_bytes(4 * text_bytes if text_bytes else None)
    occ = ds.map_batches(occ_partial, batch_format="pyarrow")
    hits = hash_join(occ, shared_ds, key="h", num_buckets=occ_buckets,
                     bucket_reduce=lambda t: t.select(["__doc", "s"]))

    # co-group buckets sized from text + worst-case hit stream (~4x)
    doc_buckets = buckets_for_bytes(
        5 * text_bytes if text_bytes else None)
    sch = ds.schema()
    _types = dict(zip(sch.names, sch.types))
    id_type, text_type = _types[id_col], _types[text_col]

    def tag_text(b: pa.Table) -> pa.Table:
        d = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            id_col: b[id_col],
            text_col: b[text_col],
            "s": pa.nulls(len(b), pa.int64()),
            "__side": pa.array(np.ones(len(b), dtype=bool)),
            "__b": pa.array(_bucket_of(d, doc_buckets)),
        })

    def tag_hits(b: pa.Table) -> pa.Table:
        d = b["__doc"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            id_col: b["__doc"].combine_chunks().cast(id_type),
            text_col: pa.nulls(len(b), text_type),
            "s": b["s"],
            "__side": pa.array(np.zeros(len(b), dtype=bool)),
            "__b": pa.array(_bucket_of(d, doc_buckets)),
        })

    both = ds.map_batches(tag_text, batch_format="pyarrow").union(
        hits.map_batches(tag_hits, batch_format="pyarrow"))
    # coalesce before the groupby shuffle (see hash_join's rationale)
    both = both.repartition(doc_buckets)

    def trim_group(g: pa.Table) -> pa.Table:
        is_txt = g["__side"].to_numpy(zero_copy_only=False)
        txt = g.filter(pa.array(is_txt))
        ids = as_single_array(txt[id_col])
        arr = pc.fill_null(pc.cast(as_single_array(txt[text_col]),
                                   pa.large_string()), "")
        wvals, woff = list_to_numpy_segments(pc.split_pattern(arr, " "))
        words = as_single_array(wvals)
        n_tok = len(words)
        covered = np.zeros(n_tok, dtype=bool)
        hit = g.filter(pa.array(~is_txt))
        if hit.num_rows and txt.num_rows:
            idnp = ids.to_numpy(zero_copy_only=False).astype(np.int64)
            order = np.argsort(idnp, kind="stable")
            hd = hit[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            hs = hit["s"].to_numpy(zero_copy_only=False).astype(np.int64)
            # every hit's doc row shares its bucket by construction
            row = order[np.searchsorted(idnp[order], hd)]
            s_glob = hs + woff[row]
            diff = np.zeros(n_tok + 1, dtype=np.int64)
            np.add.at(diff, s_glob, 1)
            np.add.at(diff, s_glob + k, -1)  # windows never span docs
            covered = np.cumsum(diff[:-1]) > 0
        return _trim_rebuild(ids, words, woff, covered, id_col)

    return both.groupby("__b").map_groups(trim_group,
                                          batch_format="pyarrow")
