"""Unicode normalization as a batch kernel.

Training corpora mix NFC/NFD encodings of the same text (same glyphs,
different codepoints), which breaks exact dedup and shingle hashing.  The
fix is canonical NFC normalization at ingest.

Vectorization strategy: ASCII is NFC-invariant, so an Arrow-side
ASCII-only prefilter skips the per-row ``unicodedata.normalize`` call for
the (dominant) ASCII share of web text — the Python loop touches only the
non-ASCII minority.  Parity with DuckDB's ``nfc_normalize`` is exact
(both implement Unicode NFC), which makes the operator oracle-checkable.
"""

from __future__ import annotations

import unicodedata

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def nfc_normalize_column(texts) -> tuple[pa.Array, pa.Array]:
    """String column -> (text_nfc, changed).

    ``changed`` is False for nulls; null text stays null.
    """
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    # ASCII rows are NFC fixed points: one vectorized check, no Python
    ascii_mask = pc.fill_null(pc.string_is_ascii(texts), True)
    idx = np.flatnonzero(~ascii_mask.to_numpy(zero_copy_only=False))
    n_rows = len(texts)
    if len(idx) == 0:
        return texts, pa.array(np.zeros(n_rows, dtype=bool))
    # pull ONLY the non-ASCII minority through Python (pc.take by index),
    # not the whole batch — the ASCII majority of web text never leaves
    # Arrow
    subset = pc.take(texts, pa.array(idx)).to_pylist()
    changed = np.zeros(n_rows, dtype=bool)
    replacements: dict[int, str] = {}
    for pos, t in zip(idx.tolist(), subset):
        if t is None:
            continue
        n = unicodedata.normalize("NFC", t)
        if n != t:
            replacements[pos] = n
            changed[pos] = True
    if not replacements:
        return texts, pa.array(changed)
    # splice the few normalized rows back: replace-by-mask via if_else
    # over a sparse replacement array aligned to the batch
    repl = np.full(n_rows, None, dtype=object)
    for pos, v in replacements.items():
        repl[pos] = v
    out = pc.if_else(pa.array(changed), pa.array(repl, type=texts.type), texts)
    return out, pa.array(changed)


def nfc_stage(batch: pa.Table, col: str = "text",
              out: str = "text_nfc") -> pa.Table:
    normed, changed = nfc_normalize_column(batch[col])
    batch = batch.append_column(out, normed)
    return batch.append_column("nfc_changed", changed)
