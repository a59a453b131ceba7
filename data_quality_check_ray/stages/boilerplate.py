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

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(["fp_lo", "fp_hi"]).sum("n"))


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
    boiler = counts.map_batches(
        lambda b: b.filter(pc.greater_equal(b["sum(n)"], min_count))
        .select(["fp_lo", "fp_hi"]),
        batch_format="pyarrow",
    )
    bt = pa.concat_tables(
        [pa.schema([("fp_lo", pa.int64()), ("fp_hi", pa.int64())]).empty_table()]
        + list(boiler.iter_batches(batch_size=None, batch_format="pyarrow"))
    )
    if bt.nbytes > broadcast_limit:
        raise ValueError(
            f"boilerplate removal set is {bt.nbytes >> 20} MiB "
            f"(> {broadcast_limit >> 20} MiB broadcast limit): raise "
            "min_count or the limit, or shard the corpus"
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
