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

DEFAULT_BUCKETS = 64


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


def hash_join(left_ds, right_ds, key: str, num_buckets: int = DEFAULT_BUCKETS,
              how: str = "inner", suffix: str = "_r", right_key: str | None = None):
    """Partitioned hash join of two Datasets on an integer key column.

    -> Dataset with left columns + right columns (right key renamed to the
    left's, clashes suffixed).  Shuffle volume = the two projected sides,
    once.
    """
    def tag(side: str, key_col: str):
        def f(b: pa.Table) -> pa.Table:
            if key_col != key:
                b = b.rename_columns(
                    [key if c == key_col else c for c in b.column_names]
                )
            keys = b[key].to_numpy(zero_copy_only=False)
            b = b.append_column("__bucket", pa.array(_bucket_of(keys, num_buckets)))
            return b.append_column("__side", pa.array(np.full(len(b), side)))
        return f

    both = left_ds.map_batches(tag("l", key), batch_format="pyarrow").union(
        right_ds.map_batches(tag("r", right_key or key), batch_format="pyarrow")
    )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        l = g[g["__side"] == "l"].dropna(axis=1, how="all").drop(columns=["__side", "__bucket"])
        r = g[g["__side"] == "r"].dropna(axis=1, how="all").drop(columns=["__side", "__bucket"])
        if l.empty or (r.empty and how == "inner"):
            return pd.DataFrame()
        out = l.merge(r, on=key, how=how, suffixes=("", suffix))
        return out

    return both.groupby("__bucket").map_groups(merge, batch_format="pandas")


def asof_join_grouped(left_ds, right_ds, key: str, ts: str,
                      right_cols: list[str], suffix: str = "_asof"):
    """As-of join: for each left row, the most recent right row with
    ``right.ts <= left.ts`` within the same key group.

    Implementation: tag + union (one shuffle), then per-key
    ``pd.merge_asof`` over ts-sorted groups — the documented partitioning
    assumption is that one key group fits a worker (salt hot keys
    otherwise).
    """
    def tag(side: str, cols: list[str]):
        def f(b: pa.Table) -> pa.Table:
            b = b.select(cols)
            return b.append_column("__side", pa.array(np.full(len(b), side)))
        return f

    lcols = [c for c in left_ds.schema().names]
    rcols = [key, ts] + right_cols
    both = left_ds.map_batches(tag("l", lcols), batch_format="pyarrow").union(
        right_ds.map_batches(tag("r", rcols), batch_format="pyarrow")
    )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        l = g[g["__side"] == "l"].drop(columns="__side").sort_values(ts, kind="mergesort")
        r = g[g["__side"] == "r"].drop(columns="__side").sort_values(ts, kind="mergesort")
        r = r[[c for c in rcols if c != key]].rename(
            columns={c: c + suffix for c in rcols if c not in (key,)}
        )
        if l.empty:
            return pd.DataFrame()
        l = l.dropna(axis=1, how="all")
        if r.empty:
            for c in r.columns:
                l[c] = None
            return l
        return pd.merge_asof(l, r, left_on=ts, right_on=ts + suffix)

    return both.groupby(key).map_groups(merge, batch_format="pandas")
