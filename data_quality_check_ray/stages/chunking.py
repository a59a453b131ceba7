"""Document chunking: split each doc into overlapping token windows.

Retrieval and long-context training both consume fixed-size chunks with
overlap (the RAG / FiD preprocessing step): chunk i of a w-word doc
covers words [i*stride, i*stride + chunk_tokens), stride = chunk_tokens
- overlap, and the final partial window is kept.  Pure per-doc
arithmetic — a single ``map_batches`` stage, no shuffle, text never
leaves the block it arrived in.

The whole expansion is vectorized Arrow/numpy: one whitespace split per
batch (the shared ``textstats.split_words`` kernel), chunk extents by
integer arithmetic, one flat gather of word values, one
``pc.binary_join`` to reassemble chunk text.  Reassembly normalizes
intra-chunk whitespace to single spaces — same as the SQL oracle's
``array_to_string(ws[a:b], ' ')``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.textstats import as_single_array, split_words


def chunk_batch(b: pa.Table, text_col: str, id_col: str,
                chunk_tokens: int, overlap: int) -> pa.Table:
    stride = chunk_tokens - overlap
    texts = pc.fill_null(
        pc.cast(as_single_array(b[text_col]), pa.large_string()), ""
    )
    wvals, woff = split_words(texts)
    w = np.diff(woff)
    extra = -(-(w - chunk_tokens) // stride)  # ceil, negative when short
    n_chunks = np.where(w == 0, 0, 1 + np.maximum(extra, 0)).astype(np.int64)
    total = int(n_chunks.sum())
    ids = b[id_col].combine_chunks()
    if total == 0:
        return pa.table({
            id_col: ids.take(pa.array([], type=pa.int64())),
            "chunk_id": pa.array([], type=pa.int64()),
            "n_chunks": pa.array([], type=pa.int64()),
            "chunk_text": pa.array([], type=pa.large_string()),
        })
    doc_of = np.repeat(np.arange(len(w)), n_chunks)
    firsts = np.cumsum(n_chunks) - n_chunks
    rank = np.arange(total) - np.repeat(firsts, n_chunks)
    start = rank * stride
    stop = np.minimum(start + chunk_tokens, w[doc_of])
    lens = stop - start
    goff = np.concatenate([[0], np.cumsum(lens)]).astype(np.int64)
    gidx = (np.arange(goff[-1]) - np.repeat(goff[:-1], lens)
            + np.repeat(woff[doc_of] + start, lens))
    gathered = wvals.take(pa.array(gidx))
    chunks = pa.LargeListArray.from_arrays(pa.array(goff), gathered)
    return pa.table({
        id_col: ids.take(pa.array(doc_of)),
        "chunk_id": pa.array(rank),
        "n_chunks": pa.array(n_chunks[doc_of]),
        "chunk_text": pc.binary_join(
            chunks, pa.scalar(" ", pa.large_string())),
    })


def chunk_documents(ds, text_col: str = "text", id_col: str = "doc_id",
                    chunk_tokens: int = 512, overlap: int = 64):
    """-> Dataset(id_col, chunk_id, n_chunks, chunk_text): one chunk row
    per window; docs with zero tokens emit no rows."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")

    def f(b: pa.Table) -> pa.Table:
        return chunk_batch(b, text_col, id_col, chunk_tokens, overlap)

    return ds.map_batches(f, batch_format="pyarrow")
