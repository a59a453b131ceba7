"""Deduplication operators for large-scale training-data pipelines.

All variants follow the same scale shape (ray_guide.md / Broder 1997,
Charikar 2002 — public algorithms):

  * exact       — content-hash per batch (vectorized) -> hash-partitioned
                  ``groupby(fp).map_groups(first)``; only the 16-byte digest
                  + id shuffle, never the documents.
  * minhash-LSH — shingle -> K minhashes per batch -> explode to
                  (band_id, band_hash, doc_id) rows -> groupby(band) buckets
                  -> candidate pairs -> exact n-gram Jaccard verify ->
                  min-label cluster representative.
  * simhash     — 64-bit simhash per batch; duplicates = identical simhash
                  (banded variant would generalize to hamming<k).

Determinism: all hashing is md5/crc-based (no PYTHONHASHSEED dependence).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.segments import row_ids_from_offsets
from ..functions.textstats import as_single_array, split_words

# ---------------------------------------------------------------------------
# content hashing (vectorized helpers)
# ---------------------------------------------------------------------------


def md5_hex(texts) -> list[str]:
    """md5 hex per row (matches DuckDB ``md5(text)``) — per-row hashlib, so
    ONLY for oracle-parity queries; engine-internal dedup uses the
    vectorized ``content_hash128`` below."""
    return [
        hashlib.md5((t or "").encode("utf-8")).hexdigest() if t is not None else None
        for t in (texts.to_pylist() if hasattr(texts, "to_pylist") else texts)
    ]


def content_hash128(texts) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized 128-bit content hash: two independently-keyed 64-bit
    SipHash-style passes (pandas ``hash_array``, cython-vectorized — no
    per-row Python).  128 bits keeps the collision birthday bound far past
    10^12 docs; a single 64-bit hash would collide at ~10^9."""
    arr = as_single_array(texts) if hasattr(texts, "type") else texts
    obj = arr.to_numpy(zero_copy_only=False) if hasattr(arr, "to_numpy") else np.asarray(arr)
    obj = np.asarray(obj, dtype=object)
    lo = pd.util.hash_array(obj, hash_key="0123456789abcdef")
    hi = pd.util.hash_array(obj, hash_key="fedcba9876543210")
    return lo.astype(np.int64), hi.astype(np.int64)


def add_fingerprint(batch: pa.Table, col: str = "text", out: str = "fp") -> pa.Table:
    """Append md5-hex fingerprint of a normalized (lower, collapsed
    whitespace) text column — rolling-hash-style document fingerprint."""
    norm = pc.replace_substring_regex(
        pc.utf8_lower(pc.cast(batch[col], pa.large_string())), r"\s+", " "
    )
    return batch.append_column(out, pa.array(md5_hex(norm), type=pa.string()))


def add_content_hash(batch: pa.Table, col: str = "text", out: str = "fp") -> pa.Table:
    return batch.append_column(out, pa.array(md5_hex(batch[col]), type=pa.string()))


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(ds, text_col: str = "text", id_col: str = "doc_id",
                digest: str = "fast"):
    """Keep the min-id row per distinct text.

    Shuffle cost: only (digest, id) tuples move — the hash stage projects
    before the groupby, so at 100 TB the exchange is ~24 bytes/doc.
    ``digest="fast"`` (default) is the vectorized 128-bit path;
    ``digest="md5"`` matches DuckDB md5 (per-row Python — oracle use only).
    """
    from .groupagg import grouped_agg_bucketed
    from .joins import cheap_size_bytes

    # digest stream is ~24-40 B/doc — far below the text bytes; sizing
    # buckets from text/16 keeps reduce tasks bounded yet parallel.
    # (The bucketed hash aggregate replaced Ray's sort-groupby here:
    # with ~one group per row the sort + per-GROUP accumulator overhead
    # dominated — measured 29.6 s vs 1.5 s at 3.2M mostly-unique digests.)
    tb = cheap_size_bytes(ds)
    ib = tb // 16 if tb else None

    if digest == "md5":
        hashed = ds.map_batches(
            lambda b: add_content_hash(b, text_col).select([id_col, "fp"]),
            batch_format="pyarrow",
        )
        return grouped_agg_bucketed(
            hashed, keys="fp", aggs=[(id_col, "min")], input_bytes=ib,
        ).map_batches(
            lambda t: t.rename_columns(["fp", f"min({id_col})"]),
            batch_format="pyarrow")

    def h(b: pa.Table) -> pa.Table:
        lo, hi = content_hash128(b[text_col])
        return pa.table({"fp_lo": lo, "fp_hi": hi, id_col: b[id_col]})

    return grouped_agg_bucketed(
        ds.map_batches(h, batch_format="pyarrow"),
        keys=["fp_lo", "fp_hi"], aggs=[(id_col, "min")], input_bytes=ib,
    ).map_batches(
        lambda t: t.rename_columns(["fp_lo", "fp_hi", f"min({id_col})"]),
        batch_format="pyarrow")


# ---------------------------------------------------------------------------
# incremental (cross-run) dedup
# ---------------------------------------------------------------------------


def content_digests(ds, text_col: str = "text", id_col: str | None = None):
    """-> Dataset(fp_lo, fp_hi[, id_col]) — the persistable 128-bit digest
    table of a corpus (~16-24 bytes/doc).

    A growing-corpus pipeline writes this once per ingested partition
    (``ds.write_parquet``); the next run's ``dedup_against_prior`` reads
    it back instead of re-hashing petabytes of already-ingested text."""

    def h(b: pa.Table) -> pa.Table:
        lo, hi = content_hash128(b[text_col])
        cols = {"fp_lo": pa.array(lo), "fp_hi": pa.array(hi)}
        if id_col is not None:
            cols[id_col] = b[id_col]
        return pa.table(cols)

    return ds.map_batches(h, batch_format="pyarrow")


# broadcast-vs-shuffle switch for the prior digest table: 128 MiB of
# digests ~ 8M prior docs pinned once per node via ray.put
PRIOR_BROADCAST_BYTES = 128 << 20


def dedup_against_prior(new_ds, prior_digests, text_col: str = "text",
                        id_col: str = "doc_id",
                        broadcast_limit: int = PRIOR_BROADCAST_BYTES,
                        input_bytes: int | None = None):
    """Cross-run exact dedup: ids of new docs that are (a) not
    content-identical to ANY prior-corpus doc and (b) the min-id
    representative among content-identical new docs.  -> Dataset(id_col).

    ``prior_digests``: a ``content_digests`` Dataset (e.g. read back from
    the previous run's digest parquet).  Null text digests to the fixed
    missing-value hash on both sides, so null matches null (SQL
    ``IS NOT DISTINCT FROM`` semantics).

    Two scale paths, switched on the prior table's metadata-known bytes —
    each pays exactly ONE shuffle:

      * small prior (<= ``broadcast_limit``): digest arrays sorted once on
        the driver and ``ray.put`` ONCE; every batch membership-tests via
        ``searchsorted`` bounds on fp_lo + fp_hi verification inside the
        bounds (the prior side never shuffles), then one (digest, id)
        groupby over the SURVIVORS picks the within-run min-id reps;
      * large / unknown-size prior: ONE bucketed hash LEFT join on fp_lo
        (digest-only shuffle, ~24 B/doc each side) whose ``bucket_reduce``
        applies BOTH halves inside each reducer — fp_hi-verified anti-join
        against prior plus min-id-per-digest over the new side — exact
        because a bucket owns every joined row of its fp_lo keys, so no
        separate aggregate shuffle exists (measured: the pre-join groupby
        this replaces was 3.5 s of the 6.2 s sf0.1 wall).

    ``input_bytes``: total digest bytes of both sides (~24 B x rows) when
    the caller knows corpus row counts from read metadata — sizes the
    join's buckets without the materialize fallback.
    """
    import ray

    from .joins import cheap_size_bytes, hash_join

    new_d = content_digests(new_ds, text_col, id_col)

    sz = cheap_size_bytes(prior_digests)
    if sz is not None and sz <= broadcast_limit:
        pt = pa.concat_tables(
            prior_digests.iter_batches(batch_size=None, batch_format="pyarrow")
        ) if hasattr(prior_digests, "iter_batches") else prior_digests
        lo = pt["fp_lo"].to_numpy(zero_copy_only=False).astype(np.int64)
        hi = pt["fp_hi"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((hi, lo))
        ref = ray.put((lo[order], hi[order]))

        def keep_new(b: pa.Table) -> pa.Table:
            slo, shi = ray.get(ref)
            blo = b["fp_lo"].to_numpy(zero_copy_only=False)
            bhi = b["fp_hi"].to_numpy(zero_copy_only=False)
            left = np.searchsorted(slo, blo, side="left")
            right = np.searchsorted(slo, blo, side="right")
            hit = np.zeros(len(blo), dtype=bool)
            width = right - left
            # overwhelmingly width<=1: vectorized single-probe check
            one = width == 1
            hit[one] = shi[left[one]] == bhi[one]
            for i in np.nonzero(width > 1)[0]:  # fp_lo collisions: rare
                hit[i] = bool(
                    np.any(shi[left[i]:right[i]] == bhi[i])
                )
            return b.filter(pa.array(~hit))

        from .groupagg import grouped_agg_bucketed

        survivors = new_d.map_batches(keep_new, batch_format="pyarrow")
        return grouped_agg_bucketed(
            survivors, keys=["fp_lo", "fp_hi"], aggs=[(id_col, "min")],
            input_bytes=input_bytes or cheap_size_bytes(new_d),
        ).map_batches(
            lambda b: b.rename_columns(["fp_lo", "fp_hi", id_col])
            .select([id_col]),
            batch_format="pyarrow")

    marked = prior_digests.map_batches(
        lambda b: pa.table({
            "fp_lo": b["fp_lo"], "fp_hi_p": b["fp_hi"],
            "__hit": pa.array(np.ones(len(b), dtype=np.int64)),
        }),
        batch_format="pyarrow",
    )

    def anti_and_reps(t: pa.Table) -> pa.Table:
        hit = pc.coalesce(
            pc.and_kleene(pc.equal(t["fp_hi"], t["fp_hi_p"]),
                          pc.equal(t["__hit"], 1)),
            pa.scalar(False),
        ).to_numpy(zero_copy_only=False).astype(bool)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        lo = t["fp_lo"].to_numpy(zero_copy_only=False).astype(np.int64)
        hi = t["fp_hi"].to_numpy(zero_copy_only=False).astype(np.int64)
        # one lexsort: group joined rows by digest with ids ascending, so
        # the first row of each run is the min-id candidate and a
        # reduceat-OR over the run tells whether ANY prior digest matched
        order = np.lexsort((ids, hi, lo))
        lo, hi, ids, hit = lo[order], hi[order], ids[order], hit[order]
        starts = np.flatnonzero(
            np.r_[True, (lo[1:] != lo[:-1]) | (hi[1:] != hi[:-1])]
        )
        any_hit = np.bitwise_or.reduceat(hit, starts) if len(hit) else hit
        keep = ids[starts][~any_hit]
        return pa.table({id_col: pa.array(np.sort(keep), type=pa.int64())})

    if input_bytes is None and sz is not None:
        input_bytes = sz * 2
    return hash_join(new_d, marked, key="fp_lo", how="left",
                     input_bytes=input_bytes, bucket_reduce=anti_and_reps)


# ---------------------------------------------------------------------------
# minhash + LSH
# ---------------------------------------------------------------------------

NUM_PERM = 64
NUM_BANDS = 16  # 16 bands x 4 rows
#: cap on the minhash candidate-id broadcast a single builder task holds
#: (ids are 8 B each, <= 2 per candidate pair)
CAND_ID_LIMIT_BYTES = 2 << 30
_MERSENNE = (1 << 61) - 1


def _perm_params(num_perm: int = NUM_PERM):
    # deterministic affine permutation parameters from md5 of the index
    a = np.empty(num_perm, dtype=np.uint64)
    b = np.empty(num_perm, dtype=np.uint64)
    for i in range(num_perm):
        d = hashlib.md5(f"perm-{i}".encode()).digest()
        a[i] = (int.from_bytes(d[:8], "little") | 1) % _MERSENNE
        b[i] = int.from_bytes(d[8:16], "little") % _MERSENNE
    return a, b


_PERM_A, _PERM_B = _perm_params()


def shingle_hashes(texts: pa.Array, k: int = 3):
    """word-k-shingle crc-ish hashes -> (hashes uint64, offsets per doc).

    Vectorized: words via arrow split, shingle hash = polynomial combine of
    word hashes (crc32 per unique word only).
    """
    import zlib

    arr = as_single_array(texts)
    arr = pc.fill_null(pc.cast(arr, pa.large_string()), "")
    wvals, woff = split_words(arr)
    norm = as_single_array(pc.utf8_lower(wvals))
    dct = norm.dictionary_encode()
    uniq = dct.dictionary.to_pylist()
    uh = np.array(
        [zlib.crc32(u.encode("utf-8")) for u in uniq], dtype=np.uint64
    ) if uniq else np.empty(0, dtype=np.uint64)
    codes = np.asarray(dct.indices, dtype=np.int64)
    wh = uh[codes] if len(codes) else np.empty(0, dtype=np.uint64)

    n = len(woff) - 1
    if len(wh) < k:
        return np.empty(0, dtype=np.uint64), np.zeros(n + 1, dtype=np.int64)
    row_ids = row_ids_from_offsets(woff)
    # shingle of k consecutive words within one row
    P = np.uint64(1099511628211)
    sh = wh[: len(wh) - k + 1].copy()
    valid = row_ids[: len(wh) - k + 1] == row_ids[k - 1 :]
    for j in range(1, k):
        sh = sh * P + wh[j : len(wh) - k + 1 + j]
    sh = sh[valid]
    n_words = np.diff(woff)
    sh_counts = np.maximum(n_words - (k - 1), 0)
    sh_off = np.concatenate([[0], np.cumsum(sh_counts)]).astype(np.int64)
    return sh, sh_off


def _mod61(x: np.ndarray) -> np.ndarray:
    """x (uint64) mod 2^61-1, branch-free (x >> 61 <= 7, so one fold + one
    conditional subtract suffices)."""
    m = np.uint64(_MERSENNE)
    r = (x >> np.uint64(61)) + (x & m)
    return np.where(r >= m, r - m, r)


def _mulmod61(a: np.ndarray, h: np.ndarray) -> np.ndarray:
    """(a * h) mod 2^61-1 for a, h < 2^61 without 64-bit wrap-around.

    32-bit-half schoolbook product reduced with 2^64 === 8 and
    2^61 === 1 (mod M) — every intermediate fits uint64, so the affine
    permutation family really is mod-Mersenne (a plain uint64 multiply
    silently wraps mod 2^64 first, breaking the min-wise hash guarantee)."""
    u32 = np.uint64(0xFFFFFFFF)
    a_hi, a_lo = a >> np.uint64(32), a & u32
    h_hi, h_lo = h >> np.uint64(32), h & u32
    # a*h = a_hi*h_hi*2^64 + (a_hi*h_lo + a_lo*h_hi)*2^32 + a_lo*h_lo
    t1 = _mod61(_mod61(a_hi * h_hi) << np.uint64(3))          # *2^64 === *8
    mid = _mod61(a_hi * h_lo + a_lo * h_hi)                   # < 2^61
    m_hi, m_lo = mid >> np.uint64(29), mid & np.uint64((1 << 29) - 1)
    t2 = _mod61(m_hi + (m_lo << np.uint64(32)))               # mid*2^32
    return _mod61(t1 + t2 + _mod61(a_lo * h_lo))


def minhash_signatures(texts: pa.Array, num_perm: int = NUM_PERM) -> np.ndarray:
    """(n_docs, num_perm) uint64 minhash signatures (empty docs -> max).

    Fully vectorized: one (num_perm, n_shingles) permuted-hash matrix, then
    per-document mins via ``np.minimum.reduceat`` over the shingle
    offsets — no Python loop over documents."""
    sh, off = shingle_hashes(texts)
    n = len(off) - 1
    sig = np.full((n, num_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
    if not len(sh):
        return sig
    starts = off[:-1]
    nonempty = off[1:] > starts
    if not nonempty.any():
        return sig
    ne_starts = starts[nonempty].astype(np.int64)
    shm = _mod61(sh)[None, :]
    # hv[perm, shingle] = (a*h + b) mod mersenne — exact 128-bit-emulated
    # modular arithmetic (see _mulmod61).  Permutations go in CHUNKS of 16:
    # the full (num_perm, n_shingles) matrix plus _mulmod61's ~8
    # intermediates peaked at ~5 GB per 100k-doc block and got tasks
    # OOM-killed at 3.2M docs; chunking bounds the working set at ~1/4 of
    # that with identical output.
    chunk = 16
    for p0 in range(0, num_perm, chunk):
        p1 = min(p0 + chunk, num_perm)
        hv = _mod61(_mulmod61(_PERM_A[p0:p1, None], shm)
                    + _PERM_B[p0:p1, None])
        mins = np.minimum.reduceat(hv, ne_starts, axis=1)
        sig[nonempty, p0:p1] = mins.T
    return sig


def band_rows(batch: pa.Table, text_col: str, id_col: str) -> pa.Table:
    """Explode each doc into NUM_BANDS (band_id, band_hash, doc_id) rows.

    Docs with an empty shingle set (under k words) emit NO band rows:
    their all-max sentinel signatures would otherwise collide with each
    other in every band and cluster unrelated short docs."""
    sig = minhash_signatures(batch[text_col])
    ids = batch[id_col].to_numpy(zero_copy_only=False)
    nonempty = ~(sig == np.iinfo(np.uint64).max).all(axis=1)
    sig = sig[nonempty]
    ids = ids[nonempty]
    n = len(ids)
    rows_per = NUM_PERM // NUM_BANDS
    band_ids = np.tile(np.arange(NUM_BANDS, dtype=np.int32), n)
    doc_ids = np.repeat(ids, NUM_BANDS)
    bh = np.empty(n * NUM_BANDS, dtype=np.uint64)
    P = np.uint64(1099511628211)
    for b in range(NUM_BANDS):
        h = np.zeros(n, dtype=np.uint64)
        for r in range(rows_per):
            h = h * P + sig[:, b * rows_per + r]
        bh[b::NUM_BANDS] = h
    return pa.table(
        {
            "band_id": band_ids,
            "band_hash": bh.astype(np.int64),  # reinterpret for arrow
            "doc_id": doc_ids,
        }
    )


def jaccard_scalar(a: str, b: str, k: int = 3) -> float:
    """Exact word-k-shingle Jaccard (verification step).

    Docs with no shingles (fewer than k words) are never near-duplicates
    of anything — returning 1.0 for two empty sets would falsely cluster
    unrelated short docs."""
    def sh(t):
        w = [x.lower() for x in t.split()]
        return set(tuple(w[i : i + k]) for i in range(len(w) - k + 1))

    sa, sb = sh(a), sh(b)
    if not sa or not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)


def expand_doc_pairs(doc_lists, cap: int | None = None) -> pa.Table:
    """Shared pair expansion: iterable of doc-id lists -> (a, b) table of
    unique unordered pairs per list (a < b).  ``cap`` skips degenerate
    giant buckets (None = exact mode for oracle-checked paths)."""
    out_a: list[np.ndarray] = []
    out_b: list[np.ndarray] = []
    for docs in doc_lists:
        if len(docs) < 2:
            continue
        ids = np.unique(np.asarray(docs, dtype=np.int64))
        if len(ids) < 2 or (cap is not None and len(ids) > cap):
            continue
        ii, jj = np.triu_indices(len(ids), k=1)
        out_a.append(ids[ii])
        out_b.append(ids[jj])
    if not out_a:
        return pa.table({"a": pa.array([], type=pa.int64()),
                         "b": pa.array([], type=pa.int64())})
    return pa.table({"a": np.concatenate(out_a), "b": np.concatenate(out_b)})


def grouped_pairs(ds, key_col: str, id_col: str, cap: int | None = None,
                  num_parts: int | None = None,
                  input_bytes: int | None = None):
    """(key, id) rows -> Dataset of unique unordered candidate (a, b)
    pairs per key (a < b).

    Partition-wise expansion: rows are hash-partitioned by ``key`` (every
    row of a key lands in ONE partition), then each partition expands its
    key-runs with vectorized numpy — ``num_parts`` UDF calls total instead
    of one Python accumulator per group (a 10^8-bucket corpus would
    otherwise allocate 10^8 driver-side lists inside the aggregate).
    ``cap`` skips degenerate giant groups (the LSH bucket cap).
    ``num_parts=None`` sizes partitions from input bytes — a caller-
    supplied ``input_bytes`` estimate (derived-table callers KNOW their
    row width: minhash bands = rows x 16 B), else metadata probing, else
    a fixed 64: a fixed count would grow partitions linearly with the
    candidate set at corpus scale."""
    from .joins import _bucket_of, buckets_for_bytes, cheap_size_bytes

    if num_parts is None:
        sz = input_bytes if input_bytes is not None else cheap_size_bytes(ds)
        num_parts = buckets_for_bytes(sz) if sz is not None else 64

    def tag(b: pa.Table) -> pa.Table:
        keys = b[key_col].to_numpy(zero_copy_only=False)
        return pa.table({
            key_col: b[key_col],
            id_col: b[id_col],
            "__part": _bucket_of(keys, num_parts),
        })

    def expand(g: pa.Table) -> pa.Table:
        empty = pa.table({"a": pa.array([], type=pa.int64()),
                          "b": pa.array([], type=pa.int64())})
        bk = g[key_col].to_numpy(zero_copy_only=False)
        ids = g[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(bk) < 2:
            return empty
        order = np.lexsort((ids, bk))
        bk, ids = bk[order], ids[order]
        # drop duplicate (key, id) rows (adjacent after the sort) so each
        # id appears once per key — preserves pair-multiplicity semantics
        first = np.concatenate([[True], (bk[1:] != bk[:-1]) | (ids[1:] != ids[:-1])])
        bk, ids = bk[first], ids[first]
        run_start = np.flatnonzero(
            np.concatenate([[True], bk[1:] != bk[:-1]]))
        run_len = np.diff(np.concatenate([run_start, [len(bk)]]))
        keep = run_len >= 2
        if cap is not None:
            keep &= run_len <= cap
        if not keep.any():
            return empty
        ks, kl = run_start[keep], run_len[keep]
        # fully vectorized within-run pair expansion: element with local
        # position p pairs with the p earlier elements of its run; ids are
        # sorted within a run, so a < b holds by construction
        n_el = int(kl.sum())
        el_off = np.concatenate([[0], np.cumsum(kl)])
        local = np.arange(n_el, dtype=np.int64) - np.repeat(el_off[:-1], kl)
        gidx = np.repeat(ks, kl) + local          # global idx of each element
        total = int(local.sum())
        if total == 0:
            return empty
        b_idx = np.repeat(gidx, local)
        p_off = np.concatenate([[0], np.cumsum(local)])
        k = np.arange(total, dtype=np.int64) - np.repeat(p_off[:-1], local)
        a_idx = np.repeat(np.repeat(ks, kl), local) + k
        return pa.table({"a": ids[a_idx], "b": ids[b_idx]})

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(expand, batch_format="pyarrow")
    )


def minhash_dedup(ds, text_col: str = "text", id_col: str = "doc_id",
                  threshold: float = 0.8, pair_limit: int = 100_000):
    """Near-dup assignment: -> Dataset(doc_id, rep_id, is_dup).

    Pipeline shape (scale path): band explode [map] -> groupby(band) buckets
    [shuffle of (band, hash, id) triples only] -> candidate pairs -> verify
    Jaccard on the (small) candidate set -> min-label representative.

    Two closure paths, switched on the measured candidate-pair count:

      * <= ``pair_limit``: candidates collect to the driver, verification
        uses a broadcast id->text map, clustering is union-find — cheapest
        when the candidate set is provably small;
      * >  ``pair_limit``: everything stays distributed — candidate texts
        attach via two bucketed hash joins, per-pair Jaccard verification
        runs in map_batches, and cluster closure is
        ``connected_components_distributed`` (join + groupby-min rounds).
    """
    import ray

    # the signature kernel is CPU-bound (~3k docs/s/core): spread a small
    # 1-2-block corpus across the pool (see joins.spread_small)
    from .joins import cheap_num_rows, spread_small

    # band-table size is a KNOWN function of corpus rows (NUM_BANDS
    # (bucket, doc_id) int64 rows per doc) — grab the row count from read
    # metadata BEFORE transforms hide it, so the pair-expansion shuffle
    # width scales with the corpus instead of the fixed-64 fallback
    n_rows = cheap_num_rows(ds)
    bands_bytes = n_rows * NUM_BANDS * 16 if n_rows is not None else None

    ds = spread_small(ds)

    # explicit batch cap, sized for CACHE RESIDENCY, not just memory: the
    # signature working set is O(batch_docs x shingles/doc x perm_chunk)
    # and falls out of LLC past ~1k docs — measured on the 5k-doc corpus
    # (52 shingles/doc): 3,632 docs/s at batch 512 vs 659 at 4096, a 5.5x
    # single-core cliff.  512 docs x ~300 shingles (real web pages) x
    # chunk 16 x 8 B ~= 20 MB/task — bounded at any corpus scale.
    bands = ds.map_batches(
        lambda b: band_rows(b, text_col, id_col), batch_format="pyarrow",
        batch_size=512, zero_copy_batch=True,
    )

    def combine_key(b: pa.Table) -> pa.Table:
        # one int64 bucket key = band_id in the low bits of the band hash
        key = (
            b["band_hash"].to_numpy(zero_copy_only=False).astype(np.int64)
            * np.int64(NUM_BANDS)
            + b["band_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        )
        return pa.table({"bucket": key, "doc_id": b["doc_id"]})

    # partition-wise pair expansion (grouped_pairs): no per-bucket Python
    # accumulators, one vectorized UDF call per hash partition
    pairs_ds = grouped_pairs(
        bands.map_batches(combine_key, batch_format="pyarrow"),
        key_col="bucket", id_col="doc_id", cap=200,
        input_bytes=bands_bytes,
    ).materialize()

    if pairs_ds.count() > pair_limit:
        return _minhash_closure_distributed(
            ds, pairs_ds, text_col, id_col, threshold
        )

    pairs = pairs_ds.to_pandas().drop_duplicates()

    # verify candidates with exact jaccard (broadcast candidate texts)
    cand_ids = set(pairs["a"]).union(pairs["b"]) if len(pairs) else set()
    id_to_text = {}
    if cand_ids:
        cand_ref = ray.put(cand_ids)

        def collect(b: pa.Table) -> pa.Table:
            wanted = ray.get(cand_ref)
            mask = pc.is_in(
                b[id_col], value_set=pa.array(list(wanted), type=b[id_col].type)
            )
            return b.filter(mask).select([id_col, text_col])

        cand_tbl = ds.map_batches(collect, batch_format="pyarrow").to_pandas()
        id_to_text = dict(zip(cand_tbl[id_col], cand_tbl[text_col]))

    edges = [
        (int(r.a), int(r.b))
        for r in pairs.itertuples()
        if jaccard_scalar(id_to_text.get(r.a, ""), id_to_text.get(r.b, "")) >= threshold
    ]

    # min-label propagation (union-find on the small verified edge set)
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = min(ra, rb), max(ra, rb)
            parent[hi] = lo
            parent.setdefault(lo, lo)

    rep_map = {x: find(x) for x in parent}
    rep_ref = ray.put(rep_map)

    def assign(b: pa.Table) -> pa.Table:
        m = ray.get(rep_ref)
        ids = b[id_col].to_numpy(zero_copy_only=False)
        reps = np.array([m.get(int(i), int(i)) for i in ids], dtype=np.int64)
        return pa.table(
            {
                "doc_id": ids,
                "rep_id": reps,
                "is_dup": reps != ids,
            }
        )

    return ds.map_batches(assign, batch_format="pyarrow")


def _minhash_closure_distributed(ds, pairs_ds, text_col: str, id_col: str,
                                 threshold: float):
    """Scale path for minhash closure: no driver-side materialization.

    dedupe pairs [groupby] -> candidate-id semi-join filter [broadcast] ->
    attach both texts [2 bucketed hash joins over candidates only] ->
    exact-Jaccard verify [map_batches over candidate rows only] ->
    connected_components_distributed -> rep assignment [left hash join].
    """
    import ray

    from .joins import buckets_for_bytes, cheap_size_bytes, hash_join

    from .groupagg import distinct_bucketed

    uniq = distinct_bucketed(
        pairs_ds, keys=["a", "b"],
        input_bytes=cheap_size_bytes(pairs_ds),
    ).materialize()

    # SEMI-JOIN the text side first: only docs appearing in >=1 candidate
    # pair need their text attached, and that set is tiny relative to the
    # corpus (LSH already pruned).  Without this, both attach joins
    # shuffle the FULL text corpus through repartition+sort to keep a
    # fraction of it — at 3.2M pages (11 GB of text) the run died of
    # object-store pressure; with it, the joins move only candidate rows.
    # The candidate-id array is built in a REMOTE task directly from the
    # materialized pair blocks (the driver never ingests or holds it) and
    # broadcast by object ref; a count guard bounds the single builder's
    # heap.  A doc wrongly passed by this filter merely attaches unused
    # text — the attach joins match on exact ids — so a lossy filter
    # (Bloom) can replace the exact set beyond the guard if ever needed.
    n_cand_pairs = uniq.count()
    if n_cand_pairs * 16 > CAND_ID_LIMIT_BYTES:
        raise ValueError(
            f"{n_cand_pairs} candidate pairs exceed the "
            f"{CAND_ID_LIMIT_BYTES >> 20} MiB candidate-id budget: "
            "tighten the LSH band config (fewer false candidates) or "
            "swap the exact id set for a Bloom filter here"
        )

    @ray.remote
    def _build_cand_ids(*tables):
        parts = [t for t in tables if len(t)]
        if not parts:
            return pa.array(np.empty(0, dtype=np.int64))
        return pa.array(np.unique(np.concatenate(
            [np.concatenate([
                t["a"].to_numpy(zero_copy_only=False),
                t["b"].to_numpy(zero_copy_only=False),
            ]) for t in parts]
        )).astype(np.int64))

    cand_ref = _build_cand_ids.remote(*uniq.to_arrow_refs())

    def keep_candidates(b: pa.Table) -> pa.Table:
        wanted = ray.get(cand_ref)
        mask = pc.is_in(as_single_array(b[id_col]).cast(pa.int64()),
                        value_set=wanted)
        return b.filter(mask).select([id_col, text_col])

    # materialize once: the filtered projection feeds BOTH attach joins
    texts = ds.map_batches(
        keep_candidates, batch_format="pyarrow"
    ).materialize()
    text_bytes = texts.size_bytes() or 0
    pair_bytes = cheap_size_bytes(pairs_ds) or 0
    nb = buckets_for_bytes(text_bytes + pair_bytes)
    with_a = hash_join(uniq, texts, key="a", right_key=id_col,
                       num_buckets=nb).map_batches(
        lambda b: b.rename_columns(
            ["__text_a" if c == text_col else c for c in b.column_names]
        ),
        batch_format="pyarrow",
    )
    with_both = hash_join(with_a, texts, key="b", right_key=id_col,
                          num_buckets=nb)

    def verify(b: pa.Table) -> pa.Table:
        ta = b["__text_a"].to_pylist()
        tb = b[text_col].to_pylist()
        keep = np.array(
            [jaccard_scalar(x or "", y or "") >= threshold for x, y in zip(ta, tb)],
            dtype=bool,
        )
        return b.select(["a", "b"]).filter(pa.array(keep))

    edges = with_both.map_batches(verify, batch_format="pyarrow").materialize()

    ids = ds.map_batches(
        lambda b: pa.table({id_col: b[id_col]}), batch_format="pyarrow"
    )
    if edges.count() == 0:
        return ids.map_batches(
            lambda b: pa.table({
                "doc_id": b[id_col],
                "rep_id": b[id_col],
                "is_dup": pa.array(np.zeros(len(b), dtype=bool)),
            }),
            batch_format="pyarrow",
        )
    labels = connected_components_distributed(edges)
    # size the final left join from the ACTUAL id-projection bytes: the
    # corpus probe is None here (transformed lazy input) and candidate
    # text_bytes is an unrelated proxy (tiny when LSH pruned hard) that
    # would undersize the buckets — the id projection is ~8 B/row, so
    # materializing it for an exact count is cheap and the join consumes
    # the materialized handle instead of re-running the read
    ids_bytes = cheap_size_bytes(ids)
    if ids_bytes is None:
        ids = ids.materialize()
        ids_bytes = ids.size_bytes() or 0
    joined = hash_join(ids, labels, key=id_col, right_key="node", how="left",
                       input_bytes=ids_bytes + (cheap_size_bytes(labels) or 0))

    def assign(b: pa.Table) -> pa.Table:
        # non-candidates have a null label after the left join -> self-rep
        rep = pc.coalesce(b["label"], b[id_col])
        return pa.table({
            "doc_id": b[id_col],
            "rep_id": rep,
            "is_dup": pc.not_equal(rep, b[id_col]),
        })

    return joined.map_batches(assign, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# distributed connected components (scale path for cluster closure)
# ---------------------------------------------------------------------------


def _label_sum_exact(labels_ds) -> int:
    """Exact Python-int sum of the label column at any id magnitude.

    ``ds.sum`` wraps: 63-bit hash ids sum past int64 within ~200k rows
    (observed ArrowConversionError in the reduce).  Split each label into
    three 22-bit parts, sum parts per block (fits uint64 to ~1e13 rows per
    block), combine the tiny per-block partials in Python ints."""
    m = np.uint64((1 << 22) - 1)

    def part(b: pa.Table) -> pa.Table:
        l = b["label"].to_numpy(zero_copy_only=False).astype(np.uint64)
        return pa.table({
            "s0": pa.array([int((l & m).sum())], type=pa.int64()),
            "s1": pa.array([int(((l >> np.uint64(22)) & m).sum())],
                           type=pa.int64()),
            "s2": pa.array([int((l >> np.uint64(44)).sum())],
                           type=pa.int64()),
        })

    rows = labels_ds.map_batches(
        part, batch_format="pyarrow", batch_size=None
    ).take_all()
    return sum(
        r["s0"] + (r["s1"] << 22) + (r["s2"] << 44) for r in rows
    )


def connected_components_distributed(edges_ds, max_rounds: int = 24):
    """Edge Dataset (a:int64, b:int64) -> Dataset (node, label) where label
    is the min node id of the connected component.

    Each round = min-label propagation (ONE bucketed hash join of labels
    onto directed edges + ONE groupby-min) followed by POINTER JUMPING
    (``label <- label[label]``, one more join): jumping halves the
    distance to each component's minimum every round, so convergence is
    O(log diameter) rounds rather than O(diameter) — a 200k-doc web
    corpus produced a verified near-dup chain deeper than 8 hops, which
    plain propagation could not close in any practical round budget
    (observed non-convergence, round 3).  Labels only ever decrease and
    label[l] <= l invariantly, so the jump is exact.  Convergence is
    verified: an unchanged label SUM means a fixed point — if
    ``max_rounds`` is exhausted while labels are still changing, a
    RuntimeError is raised instead of silently returning split components.
    This is the ray_guide.md alternative to driver-side union-find when the
    candidate-pair set is NOT provably small."""
    from .joins import buckets_for_bytes, cheap_size_bytes, hash_join

    def to_nodes(b: pa.Table) -> pa.Table:
        a = b["a"].to_numpy(zero_copy_only=False)
        bb = b["b"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "node": np.concatenate([a, bb]),
                "label": np.concatenate([a, bb]),
            }
        )

    from .groupagg import grouped_agg_bucketed

    labels = (
        grouped_agg_bucketed(
            edges_ds.map_batches(to_nodes, batch_format="pyarrow"),
            keys="node", aggs=[("label", "min")],
            input_bytes=cheap_size_bytes(edges_ds),
        )
        .map_batches(
            lambda t: t.rename_columns(["node", "label"]), batch_format="pyarrow"
        )
        .materialize()
    )

    def both_dirs(b: pa.Table) -> pa.Table:
        a = b["a"].to_numpy(zero_copy_only=False)
        bb = b["b"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "node": np.concatenate([a, bb]),
                "x": np.concatenate([bb, a]),
            }
        )

    edges_both = edges_ds.map_batches(both_dirs, batch_format="pyarrow").materialize()

    # size the per-round join buckets ONCE outside the loop (both inputs
    # are materialized, so the byte counts are free; labels only shrink
    # across rounds, edges_both is constant — the first-round total is the
    # max the loop will ever see)
    nb = buckets_for_bytes(
        (edges_both.size_bytes() or 0) + (labels.size_bytes() or 0)
    )

    # max_rounds propagation rounds + ONE verification round: the
    # sum-equality check can only observe convergence a round late, so
    # without the extra round a component converging exactly at round
    # max_rounds would be wrongly rejected
    prev_sum: int | None = None
    for _ in range(max_rounds + 1):
        # each node's label flows to every neighbor: join labels onto the
        # directed edge list, re-address to the neighbor, then take the min
        # of own + incoming labels
        prop = hash_join(edges_both, labels, key="node",
                         num_buckets=nb).map_batches(
            lambda b: pa.table({"node": b["x"], "label": b["label"]}),
            batch_format="pyarrow",
        )
        labels = (
            grouped_agg_bucketed(
                prop.union(labels), keys="node", aggs=[("label", "min")],
                num_buckets=nb,
            )
            .map_batches(
                lambda t: t.rename_columns(["node", "label"]), batch_format="pyarrow"
            )
            .materialize()
        )
        # pointer jump: label <- label[label].  Every label value IS a node
        # in `labels` (labels are node ids), so an inner self-join on
        # (label == node) finds each node's grandparent label; label[l] <= l
        # makes the jump monotone and exact.  This is what turns O(diameter)
        # propagation into O(log diameter).  (The probe side renames its
        # columns first so the self-join's key rename cannot collide.)
        grand = labels.map_batches(
            lambda t: t.rename_columns(["node", "plabel"]),
            batch_format="pyarrow",
        )
        labels = hash_join(
            labels, grand, key="label", right_key="node",
            num_buckets=nb,
        ).map_batches(
            lambda b: pa.table({"node": b["node"], "label": b["plabel"]}),
            batch_format="pyarrow",
        ).materialize()
        # labels only ever decrease -> equal sums == fixed point reached
        # (exact Python-int sum: ds.sum wraps int64 on large hash ids)
        cur_sum = _label_sum_exact(labels)
        if cur_sum == prev_sum:
            return labels
        prev_sum = cur_sum
    raise RuntimeError(
        f"connected components did not converge in {max_rounds} rounds "
        "(component diameter exceeds the round budget; raise max_rounds)"
    )


# ---------------------------------------------------------------------------
# simhash
# ---------------------------------------------------------------------------


def simhash64(texts: pa.Array) -> np.ndarray:
    """64-bit simhash over word-unigram crc hashes (Charikar 2002)."""
    import zlib

    arr = as_single_array(texts)
    arr = pc.fill_null(pc.cast(arr, pa.large_string()), "")
    wvals, woff = split_words(arr)
    norm = as_single_array(pc.utf8_lower(wvals))
    dct = norm.dictionary_encode()
    uniq = dct.dictionary.to_pylist()
    # two crc32 halves -> 64 bits per unique token
    uh = np.array(
        [
            (zlib.crc32(u.encode()) << 32) | zlib.crc32(u.encode("utf-16-le"))
            for u in uniq
        ],
        dtype=np.uint64,
    ) if uniq else np.empty(0, dtype=np.uint64)
    codes = np.asarray(dct.indices, dtype=np.int64)
    wh = uh[codes] if len(codes) else np.empty(0, dtype=np.uint64)

    n = len(woff) - 1
    row_ids = row_ids_from_offsets(woff)
    out = np.zeros(n, dtype=np.uint64)
    # per-bit weighted vote via bincount (measured FASTER than unpacking a
    # (words, 64) bit matrix + one segmented reduction — the bit matrix's
    # memory traffic dominates)
    for bit in range(64):
        votes = ((wh >> np.uint64(bit)) & np.uint64(1)).astype(np.int64) * 2 - 1
        tally = np.bincount(row_ids, weights=votes, minlength=n) if len(wh) else np.zeros(n)
        out |= (tally > 0).astype(np.uint64) << np.uint64(bit)
    return out


def simhash_dedup(ds, text_col: str = "text", id_col: str = "doc_id",
                  broadcast_threshold: int = 1_000_000):
    """-> Dataset(doc_id, simhash, rep_id): rows sharing a simhash get the
    min doc_id as representative (exact-simhash collision dedup)."""
    def add(b: pa.Table) -> pa.Table:
        sh = simhash64(b[text_col]).astype(np.int64)
        return pa.table({
            "doc_id": b[id_col], "simhash": sh,
        })

    from .joins import spread_small

    # materialize the (doc_id, simhash) digests: ~16 bytes/doc, consumed
    # twice (rep groupby + assignment) — avoids re-hashing the corpus
    hashed = spread_small(ds).map_batches(
        add, batch_format="pyarrow"
    ).materialize()

    # rep assignment: groupby-min, then either broadcast the rep table
    # (small corpora — one object-store put) or a bucketed hash join
    # (at 10^9+ docs the rep table is corpus-sized; a driver dict would
    # OOM, so stay distributed)
    from .joins import hash_join

    from .groupagg import grouped_agg_bucketed

    reps = grouped_agg_bucketed(
        hashed, keys="simhash", aggs=[("doc_id", "min")],
        input_bytes=hashed.size_bytes(),
    ).map_batches(
        lambda t: t.rename_columns(["simhash", "rep_id"]), batch_format="pyarrow"
    ).materialize()

    if reps.count() <= broadcast_threshold:
        import ray

        # broadcast the rep table as a SORTED (keys, vals) array pair:
        # the per-batch lookup is one vectorized np.searchsorted (every
        # simhash in `hashed` is present in `reps` by construction), not
        # a Python dict probe per row
        rep_pdf = reps.to_pandas()
        order = np.argsort(rep_pdf["simhash"].to_numpy())
        rep_ref = ray.put((
            rep_pdf["simhash"].to_numpy()[order],
            rep_pdf["rep_id"].to_numpy()[order].astype(np.int64),
        ))

        def assign(b: pa.Table) -> pa.Table:
            keys, vals = ray.get(rep_ref)
            sh = b["simhash"].to_numpy(zero_copy_only=False)
            return b.append_column(
                "rep_id", pa.array(vals[np.searchsorted(keys, sh)])
            )

        return hashed.map_batches(assign, batch_format="pyarrow")
    from .joins import buckets_for_bytes

    return hash_join(hashed, reps, key="simhash",
                     num_buckets=buckets_for_bytes(
                         (hashed.size_bytes() or 0) + (reps.size_bytes() or 0)))
