"""Hash-bucketed grouped aggregation — the fast path for high-cardinality
keys.

Ray's native ``ds.groupby(key).aggregate(...)`` is a SORT-based shuffle:
every block is sorted by the key, boundaries are sampled, and the reduce
runs Ray's per-key aggregate machinery.  For millions of distinct int64
digests that sort + per-key reduce dominates (measured on the shared-gram
spine at sf0.1: 6.2 s sort-groupby vs 1.2 s bucketed for identical
output).  The bucketed plan is the one ``stages/joins.hash_join`` already
uses for its exchange:

    tag      [map_batches]  __bucket = splitmix(key) % B  (deterministic,
             process-stable; multi-column keys polynomial-combined first)
    coalesce [repartition]  ~B blocks, so the groupby shuffle is B x B
             exchanges instead of (hundreds of blocks) x B
    reduce   [groupby(__bucket).map_groups]  ONE Arrow-native
             ``Table.group_by(keys).aggregate(...)`` per bucket —
             multi-threaded native hash aggregation, no per-key Python

Exactness: every row of a given key lands in exactly one bucket, so a
per-bucket aggregate is globally exact for any distributive aggregate
(sum / min / max / count).  At 100 TB the bucket count scales from input
bytes (``joins.buckets_for_bytes``), keeping each reduce task bounded —
the same invariant the join exchange relies on.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .joins import _bucket_of, buckets_for_bytes

#: aggregates a per-bucket reduce may compute exactly (distributive —
#: per-bucket answers ARE the global answers for that bucket's keys)
_DISTRIBUTIVE = {"sum", "min", "max", "count", "count_distinct"}


def _combined_key(t: pa.Table, keys: list[str]) -> np.ndarray:
    """Deterministic uint64 per row from one or more key columns
    (polynomial combine — the same construction the shingle and
    fingerprint kernels use).  Integer columns hash directly; string /
    other columns route through ``pd.util.hash_array`` (process-stable,
    unlike Python ``hash()``)."""
    import pandas as pd

    import pyarrow.compute as pc

    P = np.uint64(1099511628211)
    acc = None
    for k in keys:
        col = t[k]
        if pa.types.is_integer(col.type):
            # null keys bucket with -1 (deterministic; a bucket COLLISION
            # is harmless — the per-bucket Arrow group_by still separates
            # null from -1 — while a NaN->uint64 cast is UB)
            v = pc.fill_null(col, -1).to_numpy(
                zero_copy_only=False).astype(np.uint64)
        else:
            v = pd.util.hash_array(
                np.asarray(col.to_numpy(zero_copy_only=False),
                           dtype=object)).astype(np.uint64)
        acc = v if acc is None else acc * P + v
    return acc


def _resolve_buckets(ds, num_buckets, input_bytes):
    """Bucket count for an aggregation whose caller gave no size hint:
    materialize the input and size buckets from its EXACT bytes (the
    ``joins._auto_buckets`` fallback).  The unknown-size case is a
    transformed stream — usually an already-pre-aggregated partial table,
    far smaller than its source — so the materialize is cheap and the
    alternative (a fixed bucket count) is wrong at BOTH ends: too many
    buckets drown a small input in per-task overhead (measured: 2.9 s at
    64 buckets vs 0.7 s at 8 for a ~600-row host-count stream), too few
    unbound a 100-TB reduce."""
    if num_buckets is not None:
        return num_buckets, ds
    if input_bytes is None:
        ds = ds.materialize()
        input_bytes = ds.size_bytes()
    return buckets_for_bytes(input_bytes), ds


def grouped_agg_bucketed(ds, keys, aggs, num_buckets: int | None = None,
                         input_bytes: int | None = None,
                         bucket_post=None):
    """Grouped aggregation over integer key column(s) via hash buckets.

    ``keys``: key column name or list of names (integer-typed — the
    bucket hash combines them numerically).  ``aggs``: list of
    ``(column, fn)`` Arrow aggregate pairs, e.g. ``[("n", "sum")]``;
    output columns follow Arrow naming (``n_sum``).  ``bucket_post``:
    optional ``pa.Table -> pa.Table`` applied to each bucket's aggregated
    table inside the reducer (a bucket owns all rows of its keys, so a
    per-key filter/projection here is exact and runs before anything is
    re-collected — e.g. the shared-gram ``n_sum >= 2`` filter).

    Returns a Dataset of the aggregated (keys + agg columns) rows, block
    count ~= bucket count.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    for _, fn in aggs:
        if fn not in _DISTRIBUTIVE:
            raise ValueError(f"non-distributive aggregate {fn!r}: a "
                             "per-bucket reduce would be inexact")
    num_buckets, ds = _resolve_buckets(ds, num_buckets, input_bytes)

    def tag(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b.append_column("__bucket", pa.array([], pa.int64()))
        bk = _bucket_of(_combined_key(b, keys).astype(np.int64),
                        num_buckets)
        return b.append_column("__bucket", pa.array(bk))

    def reduce(g: pa.Table) -> pa.Table:
        out = g.drop_columns(["__bucket"]).group_by(keys).aggregate(aggs)
        # Arrow's key-column position in group_by output varies across
        # versions — select by NAME so the layout is pinned
        out = out.select(keys + [f"{c}_{fn}" for c, fn in aggs])
        return bucket_post(out) if bucket_post is not None else out

    return (ds.map_batches(tag, batch_format="pyarrow")
              .repartition(num_buckets)
              .groupby("__bucket")
              .map_groups(reduce, batch_format="pyarrow"))


def distinct_bucketed(ds, keys, num_buckets: int | None = None,
                      input_bytes: int | None = None):
    """DISTINCT over key column(s) via the same bucketed plan: every row
    of a given key lands in one bucket, so a per-bucket Arrow
    ``group_by(keys).aggregate([])`` (unique keys, native hash table) is
    globally exact.  Replaces ``ds.groupby(keys).count()`` + drop-count —
    which paid the sort shuffle AND a per-key accumulator for a count
    nobody read."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    num_buckets, ds = _resolve_buckets(ds, num_buckets, input_bytes)

    def tag(b: pa.Table) -> pa.Table:
        # per-block pre-dedup: shrinks the shuffle for repetition-heavy
        # streams, free otherwise
        b = b.group_by(keys).aggregate([])
        if b.num_rows == 0:
            return b.append_column("__bucket", pa.array([], pa.int64()))
        bk = _bucket_of(_combined_key(b, keys).astype(np.int64),
                        num_buckets)
        return b.append_column("__bucket", pa.array(bk))

    def reduce(g: pa.Table) -> pa.Table:
        return (g.drop_columns(["__bucket"])
                 .group_by(keys).aggregate([]).select(keys))

    return (ds.map_batches(tag, batch_format="pyarrow")
              .repartition(num_buckets)
              .groupby("__bucket")
              .map_groups(reduce, batch_format="pyarrow"))
