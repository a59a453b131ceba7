"""Exact global top-k without a distributed sort.

``Dataset.sort().limit(k)`` range-partitions and sorts EVERY row to keep
k of them — an all-to-all exchange whose cost grows with the dataset.
Top-k is instead a partial-aggregation problem: each block keeps its own
top k (vectorized ``pc.sort_indices`` + slice, so k rows per block cross
the wire), and ONE final task merges the k x #blocks candidates.  Same
shape as ann.brute_force_topk's per-block partials; this is the
row-level generalization used by host_topk / top_users / bm25_topk.

Exactness: any row in the global top k is in its own block's top k, so
the candidate set always contains the answer.  Ties are broken by the
caller's full sort-key list; callers must include a unique tiebreak
column (host, user_id, doc_id) for deterministic output.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def global_topk(ds, sort_keys: list[tuple[str, str]], k: int):
    """-> Dataset of the exact top-k rows under ``sort_keys``
    (pyarrow order strings: 'ascending' | 'descending'), output sorted."""

    def fin(b: pa.Table) -> pa.Table:
        idx = pc.sort_indices(b, sort_keys=sort_keys)
        return b.take(idx.slice(0, k))

    def local(b: pa.Table) -> pa.Table:
        return b if len(b) <= k else fin(b)

    return (ds.map_batches(local, batch_format="pyarrow")
            .repartition(1)
            .map_batches(fin, batch_format="pyarrow", batch_size=None))
