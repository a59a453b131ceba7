"""C4-style boilerplate line removal (SURVEY.md §2 training-data ops).

The C4 cleaning recipe drops LINES that recur across the corpus (nav
bars, cookie banners, footers) rather than whole documents.  Here that
is three Ray Data stages and exactly ONE shuffle of (line-digest, count)
partials — the text itself never shuffles:

    explode   [map_batches]  doc text -> per-block UNIQUE line digests +
                             occurrence counts (np.unique partials)
    count     [groupby.sum]  global count per 128-bit line digest; keep
                             digests with count >= min_count (the removal
                             set — boilerplate is by definition the
                             heavy-hitter tail, so this set is small)
    scrub     [map_batches]  broadcast the removal set once (ray.put),
                             filter each doc's lines by digest membership,
                             reassemble with arrow list kernels

Partitioning assumption (documented per the engine's custom-operator
rule): the removal set fits one worker's heap after the count filter.
At min_count=3 that holds by construction for natural corpora (the set
is bounded by corpus_lines / min_count but in practice by the number of
distinct BOILERPLATE strings); a pathological corpus can lower
``broadcast_limit`` to fail fast rather than OOM.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.segments import row_ids_from_offsets
from ..functions.textstats import as_single_array

#: refuse to broadcast a removal set larger than this (fail fast instead
#: of silently OOMing every scrub task)
REMOVAL_BROADCAST_BYTES = 512 << 20


def _line_digests(lines: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """128-bit digest per line (two keyed SipHash passes — same collision
    budget as stages/dedup.content_hash128)."""
    obj = np.asarray(lines.to_numpy(zero_copy_only=False), dtype=object)
    lo = pd.util.hash_array(obj, hash_key="boilerlnlokey000")  # 16 bytes
    hi = pd.util.hash_array(obj, hash_key="boilerlnhikey111")
    return lo.astype(np.int64), hi.astype(np.int64)


def _split_lines(texts: pa.Array):
    """-> (flat line values, offsets, null mask of input docs)."""
    arr = as_single_array(texts)
    arr = pc.cast(arr, pa.large_string())
    nulls = pc.is_null(arr)
    ls = pc.split_pattern(pc.fill_null(arr, ""), "\n")
    flat = ls.values if hasattr(ls, "values") else ls.flatten()
    off = np.asarray(ls.offsets, dtype=np.int64)
    return flat, off, nulls


def boilerplate_digest_counts(ds, text_col: str = "text"):
    """-> Dataset(fp_lo, fp_hi, n) — global occurrence count per distinct
    line digest.  Shuffle volume: 24 bytes per UNIQUE line per block."""
    from ..functions.segments import pair_unique

    def partial(b: pa.Table) -> pa.Table:
        flat, _, _ = _split_lines(b[text_col])
        if len(flat) == 0:
            return pa.table({"fp_lo": pa.array([], type=pa.int64()),
                             "fp_hi": pa.array([], type=pa.int64()),
                             "n": pa.array([], type=pa.int64())})
        lo, hi = _line_digests(flat)
        ulo, uhi, c = pair_unique(lo, hi, return_counts=True)
        return pa.table({"fp_lo": ulo, "fp_hi": uhi, "n": c})

    from .groupagg import grouped_agg_bucketed
    from .joins import cheap_size_bytes

    tb = cheap_size_bytes(ds)
    return grouped_agg_bucketed(
        ds.map_batches(partial, batch_format="pyarrow"),
        keys=["fp_lo", "fp_hi"], aggs=[("n", "sum")],
        input_bytes=tb // 2 if tb else None,  # 24 B/unique line vs text
    ).map_batches(
        lambda t: t.rename_columns(["fp_lo", "fp_hi", "sum(n)"]),
        batch_format="pyarrow")


def remove_boilerplate_lines(ds, text_col: str = "text",
                             id_col: str = "doc_id", min_count: int = 3,
                             broadcast_limit: int = REMOVAL_BROADCAST_BYTES):
    """-> Dataset(id_col, text_clean, n_lines_removed).

    A null input text stays null (0 removed); a doc whose every line is
    boilerplate becomes the empty string.  Line identity is the exact
    byte content between ``\\n`` separators (no trimming) — the same
    definition the SQL oracle uses.
    """
    import ray

    counts = boilerplate_digest_counts(ds, text_col)
    # digest-only (16 B/line) materialized handle: sized by a streaming
    # count BEFORE anything reaches the driver, then collected
    boiler = counts.map_batches(
        lambda b: b.filter(pc.greater_equal(b["sum(n)"], min_count))
        .select(["fp_lo", "fp_hi"]),
        batch_format="pyarrow",
    ).materialize()
    if boiler.count() * 16 > broadcast_limit:
        raise ValueError(
            f"boilerplate removal set exceeds the "
            f"{broadcast_limit >> 20} MiB broadcast limit: raise "
            "min_count or the limit, or shard the corpus"
        )
    bt = pa.concat_tables(
        [pa.schema([("fp_lo", pa.int64()), ("fp_hi", pa.int64())]).empty_table()]
        + list(boiler.iter_batches(batch_size=None, batch_format="pyarrow"))
    )
    lo = bt["fp_lo"].to_numpy(zero_copy_only=False).astype(np.int64)
    hi = bt["fp_hi"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((hi, lo))
    ref = ray.put((lo[order], hi[order]))

    def scrub(b: pa.Table) -> pa.Table:
        slo, shi = ray.get(ref)
        flat, off, nulls = _split_lines(b[text_col])
        n_docs = len(b)
        if len(flat) == 0:
            clean = pa.array([None] * n_docs, type=pa.large_string())
            removed = np.zeros(n_docs, dtype=np.int64)
        else:
            llo, lhi = _line_digests(flat)
            left = np.searchsorted(slo, llo, side="left")
            right = np.searchsorted(slo, llo, side="right")
            drop = np.zeros(len(llo), dtype=bool)
            one = (right - left) == 1
            drop[one] = shi[left[one]] == lhi[one]
            for i in np.nonzero(right - left > 1)[0]:  # fp_lo collision: rare
                drop[i] = bool(np.any(shi[left[i]:right[i]] == lhi[i]))
            keep = ~drop
            rows = row_ids_from_offsets(off)
            removed = np.bincount(rows[drop], minlength=n_docs).astype(np.int64)
            kept_per_doc = np.bincount(rows[keep], minlength=n_docs)
            new_off = np.concatenate(
                [[0], np.cumsum(kept_per_doc)]
            ).astype(np.int64)
            kept_vals = flat.filter(pa.array(keep))
            lists = pa.LargeListArray.from_arrays(
                pa.array(new_off, type=pa.int64()), kept_vals
            )
            clean = pc.binary_join(lists, pa.scalar("\n", pa.large_string()))
            # null input text -> null output (fill_null("") made it [""]
            # upstream so offsets stay aligned)
            clean = pc.if_else(nulls, pa.scalar(None, pa.large_string()), clean)
            removed[nulls.to_numpy(zero_copy_only=False)] = 0
        return pa.table({
            id_col: b[id_col],
            "text_clean": clean,
            "n_lines_removed": pa.array(removed, type=pa.int64()),
        })

    return ds.map_batches(scrub, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# MassiveText-style cross-document paragraph dedup (first occurrence wins)
# ---------------------------------------------------------------------------

#: paragraph index bits inside the packed (doc_id, index) position key
POS_BITS = 20


def _packed_positions(ids: np.ndarray, off: np.ndarray,
                      pos_bits: int = POS_BITS) -> np.ndarray:
    """Per-paragraph global position key ``doc_id << pos_bits | index``
    (int64-exact; ordering by the key == ordering by (doc_id, index)).
    Fails fast on ids/paragraph-counts the packing cannot represent."""
    n_paras = np.diff(off)
    if len(n_paras) and int(n_paras.max()) >= (1 << pos_bits):
        raise ValueError(
            f"a document has >= 2^{pos_bits} paragraphs; raise pos_bits")
    if len(ids) and (int(ids.min()) < 0
                     or int(ids.max()) >= (1 << (63 - pos_bits))):
        raise ValueError(
            f"doc ids must be in [0, 2^{63 - pos_bits}) to pack with "
            f"pos_bits={pos_bits}")
    rows = row_ids_from_offsets(off)
    idx = np.arange(len(rows), dtype=np.int64) - off[:-1][rows]
    return (ids[rows] << pos_bits) | idx


def paragraph_owners(ds, text_col: str = "text", id_col: str = "doc_id",
                     pos_bits: int = POS_BITS):
    """-> Dataset(fp_lo, fp_hi, owner) for DUPLICATED paragraphs only.

    ``owner`` is the packed position of the paragraph's globally first
    occurrence (min over ``doc_id << pos_bits | index``).  Exactly ONE
    shuffle of 32-byte (digest, local-min, local-count) partial rows —
    per-block np.unique keeps the exchange at unique-paragraphs-per-block,
    and the count>=2 filter means the result holds only paragraphs that
    actually recur (singletons are trivially their own first occurrence),
    which is what keeps the broadcast side boilerplate-sized."""

    def partial(b: pa.Table) -> pa.Table:
        flat, off, nulls = _split_lines(b[text_col])
        empty = pa.table({"fp_lo": pa.array([], type=pa.int64()),
                          "fp_hi": pa.array([], type=pa.int64()),
                          "minpos": pa.array([], type=pa.int64()),
                          "n": pa.array([], type=pa.int64())})
        if len(flat) == 0:
            return empty
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = _packed_positions(ids, off, pos_bits)
        # null docs contribute NO paragraphs (fill_null("") upstream gave
        # them one phantom "" line for offset alignment — it must not be
        # able to own or duplicate a real empty paragraph)
        nn = nulls.to_numpy(zero_copy_only=False)
        if nn.any():
            keepm = ~nn[row_ids_from_offsets(off)]
            flat = flat.filter(pa.array(keepm))
            pos = pos[keepm]
            if len(flat) == 0:
                return empty
        lo, hi = _line_digests(flat)
        order = np.lexsort((pos, hi, lo))
        slo, shi, spos = lo[order], hi[order], pos[order]
        first = np.ones(len(slo), dtype=bool)
        first[1:] = (slo[1:] != slo[:-1]) | (shi[1:] != shi[:-1])
        starts = np.nonzero(first)[0]
        counts = np.diff(np.append(starts, len(slo)))
        return pa.table({"fp_lo": slo[starts], "fp_hi": shi[starts],
                         "minpos": spos[starts],  # sorted: first = min
                         "n": counts.astype(np.int64)})

    from .groupagg import grouped_agg_bucketed
    from .joins import cheap_size_bytes

    def fin(b: pa.Table) -> pa.Table:
        f = b.filter(pc.greater_equal(b["n_sum"], 2))
        return pa.table({"fp_lo": f["fp_lo"], "fp_hi": f["fp_hi"],
                         "owner": f["minpos_min"]})

    tb = cheap_size_bytes(ds)
    return grouped_agg_bucketed(
        ds.map_batches(partial, batch_format="pyarrow"),
        keys=["fp_lo", "fp_hi"], aggs=[("minpos", "min"), ("n", "sum")],
        input_bytes=tb // 2 if tb else None,
        bucket_post=fin,  # per-key filter/projection: exact per bucket
    )


def dedup_paragraphs(ds, text_col: str = "text", id_col: str = "doc_id",
                     pos_bits: int = POS_BITS,
                     broadcast_limit: int = REMOVAL_BROADCAST_BYTES):
    """Cross-document paragraph dedup, first global occurrence wins
    (the MassiveText/Gopher recipe: remove a paragraph everywhere EXCEPT
    its first occurrence, unlike C4 boilerplate removal which drops
    recurring lines everywhere).

    -> Dataset(id_col, text_dedup, n_paras_removed).  Null text stays
    null; a doc whose every paragraph occurred earlier becomes ''.

    Same shape as remove_boilerplate_lines: one digest-only count+min
    shuffle, owners of RECURRING paragraphs broadcast once (fail-fast
    size guard), text itself never shuffles.  Partitioning assumption:
    the recurring-paragraph owner table fits one worker's heap."""
    import ray

    # digest-only (24 B/paragraph) materialized handle: sized by a
    # streaming count BEFORE anything reaches the driver, then collected
    owners = paragraph_owners(ds, text_col, id_col, pos_bits).materialize()
    if owners.count() * 24 > broadcast_limit:
        raise ValueError(
            f"recurring-paragraph owner table exceeds the "
            f"{broadcast_limit >> 20} MiB broadcast limit: shard the "
            "corpus or dedup incrementally")
    ot = pa.concat_tables(
        [pa.schema([("fp_lo", pa.int64()), ("fp_hi", pa.int64()),
                    ("owner", pa.int64())]).empty_table()]
        + list(owners.iter_batches(batch_size=None, batch_format="pyarrow"))
    )
    lo = ot["fp_lo"].to_numpy(zero_copy_only=False).astype(np.int64)
    hi = ot["fp_hi"].to_numpy(zero_copy_only=False).astype(np.int64)
    own = ot["owner"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((hi, lo))
    ref = ray.put((lo[order], hi[order], own[order]))

    def scrub(b: pa.Table) -> pa.Table:
        slo, shi, sown = ray.get(ref)
        flat, off, nulls = _split_lines(b[text_col])
        n_docs = len(b)
        if len(flat) == 0:
            clean = pa.array([None] * n_docs, type=pa.large_string())
            removed = np.zeros(n_docs, dtype=np.int64)
        else:
            ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            pos = _packed_positions(ids, off, pos_bits)
            llo, lhi = _line_digests(flat)
            left = np.searchsorted(slo, llo, side="left")
            right = np.searchsorted(slo, llo, side="right")
            midx = np.full(len(llo), -1, dtype=np.int64)
            one = (right - left) == 1
            cand = left[one]
            hit = shi[cand] == lhi[one]
            midx[one] = np.where(hit, cand, -1)
            for i in np.nonzero(right - left > 1)[0]:  # fp_lo collision
                js = np.nonzero(shi[left[i]:right[i]] == lhi[i])[0]
                if len(js):
                    midx[i] = left[i] + js[0]
            matched = midx >= 0
            if len(sown):
                owner_vals = sown[np.where(matched, midx, 0)]
                drop = matched & (pos != owner_vals)
            else:  # nothing recurs corpus-wide
                drop = np.zeros(len(llo), dtype=bool)
            keep = ~drop
            rows = row_ids_from_offsets(off)
            removed = np.bincount(rows[drop], minlength=n_docs).astype(np.int64)
            kept_per_doc = np.bincount(rows[keep], minlength=n_docs)
            new_off = np.concatenate(
                [[0], np.cumsum(kept_per_doc)]).astype(np.int64)
            lists = pa.LargeListArray.from_arrays(
                pa.array(new_off, type=pa.int64()),
                flat.filter(pa.array(keep)))
            clean = pc.binary_join(lists, pa.scalar("\n", pa.large_string()))
            clean = pc.if_else(nulls, pa.scalar(None, pa.large_string()), clean)
            removed[nulls.to_numpy(zero_copy_only=False)] = 0
        return pa.table({
            id_col: b[id_col],
            "text_dedup": clean,
            "n_paras_removed": pa.array(removed, type=pa.int64()),
        })

    return ds.map_batches(scrub, batch_format="pyarrow")
