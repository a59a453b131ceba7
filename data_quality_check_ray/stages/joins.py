"""Distributed joins (SURVEY.md §2.4 — absent in the reference, provided
as first-class engine operators).

Three shapes, per the Ray Data join guidance:

  * broadcast join — small side `ray.put` once, dict/merge per batch
    (used by queries.q_segment_revenue);
  * partitioned hash join — BOTH sides large: add ``bucket = hash(key) %
    B`` to each side, tag provenance, union, `groupby(bucket)` and merge
    the two sides pairwise inside ``map_groups``.  Only (key, payload)
    columns shuffle, B bounds reducer fan-in; salt hot keys into
    sub-buckets when a single key exceeds a reducer;
  * as-of join — sort within key groups, `pd.merge_asof` per group.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

DEFAULT_BUCKETS = 64
# target bytes of joined input per bucket: one bucket's two sides must fit
# a single reducer's heap comfortably (Arrow hash join peaks ~2-3x input)
TARGET_BUCKET_BYTES = 128 << 20
MIN_BUCKETS, MAX_BUCKETS = 8, 4096


def _bucket_of(keys: np.ndarray, num_buckets: int) -> np.ndarray:
    # splitmix-style integer scramble — stable across processes (never
    # Python hash(), which is seed-dependent)
    x = keys.astype(np.uint64, copy=True)
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return (x % np.uint64(num_buckets)).astype(np.int64)


def buckets_for_bytes(total_bytes: int | None) -> int:
    """Input bytes -> bucket count (~128 MiB of joined input per bucket),
    so a bucket's merge stays a bounded-memory task at any input scale (a
    fixed B means bucket size grows linearly with data — the 100-TB
    failure mode)."""
    if not total_bytes or total_bytes <= 0:
        return DEFAULT_BUCKETS
    want = -(-int(total_bytes) // TARGET_BUCKET_BYTES)  # ceil div
    return int(min(MAX_BUCKETS, max(MIN_BUCKETS, want)))


def cheap_size_bytes(ds) -> int | None:
    """In-memory size of a Dataset WITHOUT executing it, or None.

    Known for (a) raw ``read_parquet`` datasets — Ray infers in-memory
    size from parquet footer metadata, including column pruning, and the
    estimate tracks the materialized size within a few % — and (b)
    already-materialized datasets.  Transformed lazy datasets return None
    (their ``size_bytes()`` would trigger a full execution — exactly the
    probe this helper exists to avoid)."""
    try:
        return ds._logical_plan.dag.infer_metadata().size_bytes
    except Exception:
        return None


def cheap_num_rows(ds) -> int | None:
    """Row count WITHOUT executing the Dataset, or None.

    Metadata-known for raw parquet reads (footer row counts, exact) and
    materialized handles; transformed lazy datasets return None.  Used to
    size downstream derived-table shuffles (e.g. minhash band rows =
    rows x NUM_BANDS) from facts the read already has."""
    try:
        n = ds._logical_plan.dag.infer_metadata().num_rows
        return int(n) if n is not None else None
    except Exception:
        return None


def spread_small(ds, max_bytes: int = 256 << 20, per_block: int = 1 << 20):
    """Repartition a SMALL input so CPU-bound per-batch kernels can use
    the whole pool: a corpus that arrives as 1-2 parquet blocks runs its
    map stage in 1-2 tasks while the rest of the pool idles (measured:
    the 5k-doc single-file test table ran minhash banding in ONE task,
    6 s instead of <1).  Gated by metadata-only bytes, so a large input
    — which already has thousands of blocks — never pays the shuffle."""
    sz = cheap_size_bytes(ds)
    if sz is not None and sz < max_bytes:
        return ds.repartition(int(max(8, min(128, sz // per_block + 1))))
    return ds


def _auto_buckets(left_ds, right_ds) -> tuple[int, object, object]:
    """Bucket count for a join whose caller gave no size hint.

    First tries metadata-only sizing (``cheap_size_bytes``) — free for
    parquet reads and materialized inputs.  Only when BOTH probes miss
    (transformed lazy inputs, non-parquet lineage) does it fall back to
    materializing the inputs, returning the materialized handles so
    sizing never runs the input pipelines a second time.  Call sites on
    the 100-TB path should pass ``num_buckets`` or ``input_bytes`` so the
    fallback never fires."""
    lb = cheap_size_bytes(left_ds)
    rb = cheap_size_bytes(right_ds)
    if lb is not None and rb is not None:
        return buckets_for_bytes(lb + rb), left_ds, right_ds
    left_ds = left_ds.materialize()
    right_ds = right_ds.materialize()
    total = (left_ds.size_bytes() or 0) + (right_ds.size_bytes() or 0)
    return buckets_for_bytes(total), left_ds, right_ds


def hash_join(left_ds, right_ds, key: str, num_buckets: int | None = None,
              how: str = "inner", suffix: str = "_r", right_key: str | None = None,
              salt_keys=None, salt: int = 8, bucket_reduce=None,
              input_bytes: int | None = None):
    """Partitioned hash join of two Datasets on an integer key column.

    -> Dataset with left columns + right columns (right key renamed to the
    left's, clashes suffixed).  Shuffle volume = the two projected sides,
    once.  ``num_buckets=None`` sizes buckets from input bytes
    (~128 MiB/bucket) so a bucket merge never outgrows one reducer;
    ``input_bytes`` lets a caller supply that total from upstream
    metadata (e.g. the pre-projection parquet reads) when the join inputs
    themselves are transformed lazy datasets — avoiding _auto_buckets'
    materialization fallback entirely.

    ``salt_keys``: keys hot enough that one reducer would drown (a giant
    host, a null-surrogate id).  Hot LEFT rows are split across ``salt``
    sub-buckets round-robin; hot RIGHT rows are replicated into every
    sub-bucket, so each sub-bucket joins a 1/salt slice of the hot probe
    side against the full hot build side — same rows out, fan-out bounded.

    ``bucket_reduce``: optional ``pa.Table -> pa.Table`` applied to each
    bucket's joined table INSIDE the reducer.  A bucket owns every row of
    its keys, so a per-key aggregation here is exact by construction —
    join+aggregate pipelines skip the second global shuffle entirely.
    (Not compatible with ``salt_keys``: a salted hot key spans
    sub-buckets, so a per-key reduce would see partial groups.)
    """
    if bucket_reduce is not None and salt_keys:
        raise ValueError("bucket_reduce requires unsalted buckets "
                         "(a salted key's groups span sub-buckets)")
    if num_buckets is None:
        if input_bytes is not None:
            num_buckets = buckets_for_bytes(input_bytes)
        else:
            num_buckets, left_ds, right_ds = _auto_buckets(left_ds, right_ds)
    hot = (np.unique(np.asarray(list(salt_keys), dtype=np.int64))
           if salt_keys else None)
    salt = max(int(salt), 1)

    # one unified schema for both sides (absent columns null-padded):
    # schema-stable blocks keep the union + hash shuffle on the arrow fast
    # path — mixed schemas fall back to slow row handling
    lschema = left_ds.schema()
    rschema = right_ds.schema()
    rk = right_key or key
    lcols = list(lschema.names)
    rcols = [key if c == rk else c for c in rschema.names]
    rcols_out = [c if c == key or c not in lcols else c + suffix for c in rcols]
    all_cols = lcols + [c for c in rcols_out if c != key]
    types: dict[str, pa.DataType] = {}
    for n, t in zip(lschema.names, lschema.types):
        types[n] = t
    for n, t in zip(rcols_out, rschema.types):
        types.setdefault(n, t)

    def tag(side: str, key_col: str, rename: list[str] | None):
        def f(b: pa.Table) -> pa.Table:
            if rename:
                b = b.rename_columns(rename)
            arrays, names = [], []
            for c in all_cols:
                names.append(c)
                if c in b.column_names:
                    col = b[c].combine_chunks()
                    if col.type != types[c]:  # e.g. int32 right key vs
                        col = col.cast(types[c])  # int64 left key
                    arrays.append(col)
                else:
                    arrays.append(pa.nulls(len(b), types[c]))
            out = pa.table(dict(zip(names, arrays)))
            out = out.append_column(
                "__side", pa.array(np.full(len(b), side == "l"), type=pa.bool_())
            )
            keys = out[key].to_numpy(zero_copy_only=False)
            if hot is None:
                bucket = _bucket_of(keys, num_buckets)
                return out.append_column("__bucket", pa.array(bucket))
            # composite bucket = base*salt + salt_id: sub-buckets of one key
            # can never collide across salt ids (a hashed composite could,
            # duplicating hot matches)
            is_hot = np.isin(keys, hot)
            base = _bucket_of(keys, num_buckets) * salt
            if side == "l":
                # split hot probe rows round-robin across salt sub-buckets;
                # offset the rotation by a deterministic function of the
                # batch content so many small blocks don't all restart at
                # sub-bucket 0 and skew hot rows toward low salt ids
                salt_id = np.zeros(len(keys), dtype=np.int64)
                n_hot = int(is_hot.sum())
                if n_hot:
                    # derive the rotation start from the already-int64
                    # `base` bucket of the first hot row (never XOR the
                    # raw key array: a nullable int column arrives as
                    # float64 and float ^ int raises)
                    first_hot = int(np.argmax(is_hot))
                    start = (int(base[first_hot]) ^ len(keys)) % salt
                    salt_id[is_hot] = (
                        start + np.arange(n_hot, dtype=np.int64)
                    ) % salt
                return out.append_column("__bucket", pa.array(base + salt_id))
            # right side: replicate hot build rows into EVERY sub-bucket
            pieces = [out.append_column("__bucket", pa.array(base))
                      .filter(pa.array(~is_hot))]
            hot_idx = np.where(is_hot)[0]
            if len(hot_idx):
                hot_rows = out.take(pa.array(hot_idx))
                hot_base = base[hot_idx]
                for s in range(salt):
                    pieces.append(hot_rows.append_column(
                        "__bucket", pa.array(hot_base + s)))
            return pa.concat_tables(pieces)
        return f

    both = left_ds.map_batches(tag("l", key, None), batch_format="pyarrow").union(
        right_ds.map_batches(tag("r", rk, rcols_out), batch_format="pyarrow")
    )
    # coalesce to ~num_buckets blocks BEFORE the groupby shuffle: Ray's
    # sort shuffle makes (input blocks x output partitions) exchanges and
    # sizes output partitions to the input block count, so feeding it
    # hundreds of small blocks costs quadratic per-task overhead while the
    # bytes-scaled bucket count is the right shuffle width at any scale
    both = both.repartition(num_buckets)

    join_type = {"inner": "inner", "left": "left outer"}.get(how, how)

    def merge(g: pa.Table) -> pa.Table:
        # split sides in ARROW and join in Arrow (Acero hash join): each
        # side's own columns are null-free after the split, int64 keys stay
        # int64, and the merge itself is multi-threaded native code — no
        # pandas round-trip
        is_l = g["__side"]
        l = g.filter(is_l).select(lcols)
        r = g.filter(pc.invert(is_l)).select(rcols_out)
        if l.num_rows == 0 or (r.num_rows == 0 and how == "inner"):
            out = pa.table({c: pa.nulls(0, types[c]) for c in all_cols})
        else:
            out = l.join(r, keys=key, join_type=join_type).select(all_cols)
        return bucket_reduce(out) if bucket_reduce is not None else out

    return both.groupby("__bucket").map_groups(merge, batch_format="pyarrow")


def interval_tag(ds, ts_col: str, starts: np.ndarray, ends: np.ndarray,
                 labels: np.ndarray, out_col: str = "window_id"):
    """Range join against a broadcast interval table: tag each row with
    the label of the interval containing its timestamp (null outside all
    intervals).

    Intervals must be sorted and non-overlapping (validated here).  The
    small side ships once via ``ray.put``; the per-batch probe is one
    ``np.searchsorted`` — no shuffle, no per-row Python.  For interval
    tables too big to broadcast, range-partition both sides on time and
    apply this per partition.
    """
    import ray

    starts = np.asarray(starts, dtype=np.int64)
    ends = np.asarray(ends, dtype=np.int64)
    labels = np.asarray(labels)
    if not (len(starts) == len(ends) == len(labels)):
        raise ValueError("starts/ends/labels must align")
    if (np.diff(starts) < 0).any():
        raise ValueError("intervals must be sorted by start")
    if (ends <= starts).any():
        raise ValueError("empty/negative interval")
    if (starts[1:] < ends[:-1]).any():
        raise ValueError("overlapping intervals (tag would be ambiguous)")
    ref = ray.put((starts, ends, labels))

    def tag(b: pa.Table) -> pa.Table:
        s, e, lb = ray.get(ref)
        ts = b[ts_col].to_numpy(zero_copy_only=False).astype(
            "datetime64[us]").astype(np.int64)
        idx = np.searchsorted(s, ts, side="right") - 1
        inside = (idx >= 0) & (ts < e[np.clip(idx, 0, len(e) - 1)])
        vals = lb[np.clip(idx, 0, len(lb) - 1)]
        col = pa.array(
            np.where(inside, vals, 0), type=pa.int64()
        ) if np.issubdtype(lb.dtype, np.integer) else pa.array(vals)
        col = pc.if_else(pa.array(inside), col, pa.nulls(len(b), col.type))
        return b.append_column(out_col, col)

    return ds.map_batches(tag, batch_format="pyarrow")


def asof_join_grouped(left_ds, right_ds, key: str, ts: str,
                      right_cols: list[str], suffix: str = "_asof",
                      num_parts: int | None = None,
                      input_bytes: int | None = None):
    """As-of join: for each left row, the most recent right row with
    ``right.ts <= left.ts`` within the same key group.

    Implementation: tag + union (one shuffle), hash-partitioned by key
    into ``num_parts`` partitions (every key's rows in ONE partition),
    then a single ts-sorted ``pd.merge_asof(..., by=key)`` per partition —
    ``num_parts`` UDF calls instead of one pandas round-trip per key
    group.  ``num_parts=None`` sizes partitions from input bytes
    (~128 MiB each, same policy as ``hash_join``) so one partition always
    fits a worker at any input scale — a FIXED count would grow partitions
    linearly with data, the 100-TB failure mode — while a small input
    doesn't pay a 64-way shuffle's fixed overhead.  Salt hot keys
    upstream if one key outgrows a partition.
    """
    if num_parts is None:
        if input_bytes is not None:
            num_parts = buckets_for_bytes(input_bytes)
        else:
            lb = cheap_size_bytes(left_ds)
            rb = cheap_size_bytes(right_ds)
            num_parts = (buckets_for_bytes(lb + rb)
                         if lb is not None and rb is not None
                         else DEFAULT_BUCKETS)
    lschema = left_ds.schema()
    rschema = right_ds.schema()
    lcols = list(lschema.names)
    rcols = [key, ts] + right_cols
    rtypes = dict(zip(rschema.names, rschema.types))
    # unified typed schema: left columns + suffixed right columns; typed
    # null-padding keeps the union schema-stable (mixed schemas wobble and
    # a NaN-padded int64 column would degrade to float64 in pandas)
    r_out = [c + suffix for c in rcols if c != key]
    types: dict[str, pa.DataType] = dict(zip(lschema.names, lschema.types))
    for c in rcols:
        if c != key:
            types[c + suffix] = rtypes[c]
    all_cols = lcols + r_out

    def tag(side: bool, present: dict[str, str]):
        def f(b: pa.Table) -> pa.Table:
            arrays, names = [], []
            for c in all_cols:
                names.append(c)
                src = present.get(c)
                if src is not None and src in b.column_names:
                    arrays.append(b[src].combine_chunks())
                else:
                    arrays.append(pa.nulls(len(b), types[c]))
            out = pa.table(dict(zip(names, arrays)))
            # the key column must carry real values on BOTH sides for the
            # groupby (the right side's mapping doesn't include it)
            out = out.set_column(
                out.column_names.index(key), key, b[key].combine_chunks()
            )
            out = out.append_column(
                "__side", pa.array(np.full(len(b), side), type=pa.bool_())
            )
            keys = out[key].to_numpy(zero_copy_only=False)
            return out.append_column(
                "__part", pa.array(_bucket_of(keys, num_parts))
            )
        return f

    lmap = {c: c for c in lcols}
    rmap = {c + suffix: c for c in rcols if c != key}
    both = left_ds.map_batches(tag(True, lmap), batch_format="pyarrow").union(
        right_ds.map_batches(tag(False, rmap), batch_format="pyarrow")
    )

    ts_r = ts + suffix

    # ONE fixed output schema for every partition, at the ORIGINAL right
    # dtypes: the pandas merge only ever sees (key, ts, row-index)
    # triples — value columns are gathered back from the Arrow partition
    # by index afterwards, so unmatched rows become typed NULLS instead
    # of merge_asof's float64 promotion (which silently rounds int64
    # values >= 2^53) and block schemas can never diverge across
    # partitions on skewed data.
    out_schema = pa.schema(
        [(c, types[c]) for c in lcols] + [(c, types[c]) for c in r_out]
    )

    def merge(g: pa.Table) -> pa.Table:
        # one call per PARTITION: merge_asof(by=key) handles every key in
        # the partition in a single pass over the ts-sorted frames.
        is_l = g["__side"]
        lt = g.filter(is_l).select(lcols).combine_chunks()
        rt = g.filter(pc.invert(is_l)).select([key] + r_out).combine_chunks()
        if len(lt) == 0:
            return out_schema.empty_table()
        l_pd = pa.table({
            key: lt[key], ts: lt[ts],
            "__lidx": pa.array(np.arange(len(lt), dtype=np.int64)),
        }).to_pandas().sort_values(ts, kind="mergesort")
        if len(rt) == 0:
            ridx = np.full(len(lt), -1, dtype=np.int64)
            l_order = l_pd["__lidx"].to_numpy()
        else:
            r_pd = pa.table({
                "__rkey": rt[key], ts_r: rt[ts_r],
                "__ridx": pa.array(np.arange(len(rt), dtype=np.int64)),
            }).to_pandas().sort_values(ts_r, kind="mergesort")
            merged = pd.merge_asof(
                l_pd, r_pd, left_on=ts, right_on=ts_r, left_by=key,
                right_by="__rkey",
            )
            l_order = merged["__lidx"].to_numpy()
            rv = merged["__ridx"].to_numpy()
            ridx = np.where(np.isnan(rv), -1, rv).astype(np.int64)
        null_mask = ridx < 0
        take_r = pa.array(np.where(null_mask, 0, ridx), mask=null_mask)
        # the union carries right values under their SUFFIXED output names
        # (tag() maps them there), so gather directly by output column
        cols = {c: lt[c].take(pa.array(l_order)) for c in lcols}
        for c in r_out:
            cols[c] = rt[c].take(take_r)
        return pa.table(cols).cast(out_schema)

    return both.groupby("__part").map_groups(merge, batch_format="pyarrow")
