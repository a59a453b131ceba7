"""Sequence packing: map every document into fixed-length training
context windows via an exact DISTRIBUTED PREFIX SUM of token counts.

LLM training consumes the corpus as a single token stream cut into
``seq_len`` windows; the curation engine must tell each doc which
windows it lands in (docs span window boundaries — the standard packing
used by GPT-style pretraining).  That is pure integer arithmetic on the
global token offset of each doc in doc_id order — the hard part at
10^12 docs is the global cumulative sum, done here in three passes over
16-byte DIGESTS (the text itself never moves):

    count   [map_batches]   (doc_id, n_tokens) per doc — the shared
            whitespace tokenizer (functions/textstats.split_words), same
            counts the ``token_counts`` oracle proves
    ranges  [driver fold]   stride-sampled doc_ids per block -> B
            balanced doc_id range boundaries + per-range token totals
            (k-row partials, no shuffle); driver prefix-sums range starts
    pack    [ONE digest shuffle]  groupby(range).map_groups: sort the
            range by doc_id, cumsum + range start = exact global offset
            -> first_seq / last_seq / n_seqs

Total exchange: one shuffle of (doc_id, n_tokens, range) rows.  Output
is all-int64, so the SQL oracle (window SUM OVER ORDER BY doc_id) must
match hash-exactly — no float tolerance anywhere.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.textstats import as_single_array, split_words

#: per-block stride-sample size for range-boundary estimation
_SAMPLE_PER_BLOCK = 64


def token_count_digests(ds, text_col: str = "text", id_col: str = "doc_id"):
    """-> Dataset(doc_id, n_tokens): the 16-byte/doc packing digest."""
    import pyarrow.compute as pc

    def count(b: pa.Table) -> pa.Table:
        texts = pc.fill_null(
            pc.cast(as_single_array(b[text_col]), pa.large_string()), ""
        )
        _, off = split_words(texts)
        return pa.table({
            id_col: b[id_col],
            "n_tokens": pa.array(np.diff(off).astype(np.int64)),
        })

    return ds.map_batches(count, batch_format="pyarrow")


def _range_plan(digests, id_col: str, num_ranges: int | None):
    """One streaming pass -> (boundaries, per-range token totals, n_docs).

    Per block: a stride sample of ids + the block's (doc count, token
    sum) — a ~70-row partial regardless of block size.  Totals per range
    are folded in a SECOND tiny pass once boundaries exist; to keep it to
    ONE pass we fold per-block (sample, count) here and compute range
    totals inside the pack groupby instead — but exact sequence numbers
    need range STARTS first, so the totals pass is unavoidable.  Both
    passes read digests, not text."""

    def sample(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False)
        step = max(1, len(ids) // _SAMPLE_PER_BLOCK)
        return pa.table({"sid": pa.array(np.sort(ids)[::step].astype(np.int64))})

    def resample(t: pa.Table) -> pa.Table:
        # bounded combiner: stride-resample each combiner's share down to
        # ~4096 ids, so the driver folds <= 64 x 4096 samples no matter
        # how many blocks produced partials (a flat fold ships
        # blocks x 64 ids).  Quantiles of a stride sample of sorted
        # samples are still corpus quantiles; boundaries only steer range
        # BALANCE — the packing offsets are exact for any boundaries.
        ids = np.sort(t["sid"].to_numpy(zero_copy_only=False))
        step = max(1, len(ids) // 4096)
        return pa.table({"sid": pa.array(ids[::step].astype(np.int64))})

    n_docs = digests.count()
    if n_docs == 0:
        return np.array([], dtype=np.int64), 0
    if num_ranges == 1:  # no boundaries needed — skip the sampling pass
        return np.array([], dtype=np.int64), n_docs
    samples_ds = digests.map_batches(sample, batch_format="pyarrow")
    if (digests.size_bytes() or 0) >= (4 << 30):
        samples_ds = samples_ds.repartition(64).map_batches(
            resample, batch_size=None, batch_format="pyarrow")
    sampled_ids = [
        p["sid"].to_numpy(zero_copy_only=False)
        for p in samples_ds.iter_batches(batch_size=None,
                                         batch_format="pyarrow")
        if len(p)
    ]
    s = np.sort(np.concatenate(sampled_ids))
    if num_ranges is None:
        # ~1M-doc (16 MB digest) reducer groups, capped so the boundary
        # array itself stays broadcastable
        num_ranges = int(np.clip(n_docs // 1_048_576, 1, 65_536))
    num_ranges = max(1, min(num_ranges, len(s)))
    # boundary b_i = sampled quantile; ranges = (-inf, b_1) ... [b_{B-1}, inf)
    cuts = s[np.linspace(0, len(s) - 1, num_ranges + 1).astype(np.int64)][1:-1]
    boundaries = np.unique(cuts).astype(np.int64)
    return boundaries, n_docs


def pack_sequences(ds, text_col: str = "text", id_col: str = "doc_id",
                   seq_len: int = 2048, num_ranges: int | None = None):
    """-> Dataset(doc_id, n_tokens, token_offset, first_seq, last_seq,
    n_seqs): the doc -> context-window map for training-sequence packing.

    ``token_offset`` = total tokens of all docs with smaller doc_id;
    doc occupies windows ``token_offset // seq_len`` through
    ``(token_offset + n_tokens - 1) // seq_len`` (empty docs: -1/-1/0).
    doc_id must be unique (it is the corpus key)."""
    import ray

    if seq_len <= 0:
        raise ValueError("seq_len must be positive")
    digests = token_count_digests(ds, text_col, id_col).materialize()
    boundaries, n_docs = _range_plan(digests, id_col, num_ranges)
    if n_docs == 0:
        import ray.data as rd

        empty = pa.table({c: pa.array([], type=pa.int64()) for c in (
            id_col, "n_tokens", "token_offset", "first_seq", "last_seq",
            "n_seqs")})
        return rd.from_arrow(empty)
    nb = len(boundaries) + 1
    if nb == 1:
        # single range: every doc lands in range 0 with start 0 — the
        # totals pass would fold to [0] anyway
        starts = np.zeros(1, dtype=np.int64)
    else:
        bref = ray.put(boundaries)

        # pass 2: per-range token totals (k-row partials, driver fold)
        def totals(b: pa.Table) -> pa.Table:
            bd = ray.get(bref)
            r = np.searchsorted(bd, b[id_col].to_numpy(zero_copy_only=False),
                                side="right")
            t = np.bincount(r, weights=b["n_tokens"].to_numpy(
                zero_copy_only=False), minlength=nb).astype(np.int64)
            nz = np.flatnonzero(t)
            return pa.table({"r": pa.array(nz.astype(np.int64)),
                             "t": pa.array(t[nz])})

        def combine(t: pa.Table) -> pa.Table:
            # bounded combiner: per-range partials sum associatively
            # (exact int64), so the driver folds <= 64 sparse vectors
            # instead of one per block
            acc = np.zeros(nb, dtype=np.int64)
            if len(t):
                np.add.at(acc, t["r"].to_numpy(zero_copy_only=False),
                          t["t"].to_numpy(zero_copy_only=False))
            nz = np.flatnonzero(acc)
            return pa.table({"r": pa.array(nz.astype(np.int64)),
                             "t": pa.array(acc[nz])})

        totals_ds = digests.map_batches(totals, batch_format="pyarrow")
        if (digests.size_bytes() or 0) >= (4 << 30):
            totals_ds = totals_ds.repartition(64).map_batches(
                combine, batch_size=None, batch_format="pyarrow")
        range_tokens = np.zeros(nb, dtype=np.int64)
        for p in totals_ds \
                        .iter_batches(batch_size=None, batch_format="pyarrow"):
            if len(p):
                range_tokens[p["r"].to_numpy(zero_copy_only=False)] += \
                    p["t"].to_numpy(zero_copy_only=False)
        starts = np.concatenate([[0], np.cumsum(range_tokens)[:-1]])
    sref = ray.put((boundaries, starts))

    def tag(b: pa.Table) -> pa.Table:
        bd, _ = ray.get(sref)
        r = np.searchsorted(bd, b[id_col].to_numpy(zero_copy_only=False),
                            side="right")
        return b.append_column("__range", pa.array(r.astype(np.int64)))

    def pack(g: pa.Table) -> pa.Table:
        bd, st = ray.get(sref)
        ids = g[id_col].to_numpy(zero_copy_only=False)
        n = np.asarray(g["n_tokens"].to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        order = np.argsort(ids, kind="stable")
        ids, n = ids[order], n[order]
        off = int(st[int(g["__range"][0].as_py())]) + np.cumsum(n) - n
        nonempty = n > 0
        first = np.where(nonempty, off // seq_len, -1)
        last = np.where(nonempty, (off + n - 1) // seq_len, -1)
        return pa.table({
            id_col: pa.array(ids),
            "n_tokens": pa.array(n),
            "token_offset": pa.array(off),
            "first_seq": pa.array(first),
            "last_seq": pa.array(last),
            "n_seqs": pa.array(np.where(nonempty, last - first + 1, 0)),
        })

    return (
        digests.map_batches(tag, batch_format="pyarrow")
        .groupby("__range")
        .map_groups(pack, batch_format="pyarrow")
    )
