"""Deterministic train-order corpus shuffle.

Training wants the corpus in a pseudo-random order that is REPRODUCIBLE
(re-runs and resumed runs must agree on which doc lands in which output
shard at which position — Ray's ``random_shuffle`` is neither
deterministic nor resumable, and moves full rows through an all-to-all).
The standard recipe: order docs by a seeded hash of their id, cut the
order into shards, write each shard independently.

    key    [map_batches]  seeded digest per doc; shard = top bits of the
           key (so shard ranges partition the key ORDER — shard 0 holds
           the globally-first slice of the shuffled order, matching how
           a shard-per-file training reader consumes it)
    place  [ONE digest shuffle]  groupby(shard): sort by (key, id),
           position = rank — only (id, key) tuples move, never text

Modes, mirroring ``functions/sampling.hash_bucket_256``:
``mode="md5"`` matches DuckDB ``md5(CAST(id AS VARCHAR) || ':' || seed)``
bitwise (per-row hashlib — oracle use only); ``mode="fast"`` (default)
is the vectorized 63-bit ``pd.util.hash_array`` path for production.

Joining the placement back to text is a bucketed digest join
(stages/joins.hash_join) or — the zero-join path — writing text at key
time partitioned by shard and sorting each shard file at read time.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _keys_md5(ids: pa.Array, seed: int) -> pa.Array:
    from .dedup import md5_hex

    s = pc.binary_join_element_wise(
        pc.cast(ids, pa.large_string()),
        pa.scalar(f":{seed}", pa.large_string()),
        pa.scalar("", pa.large_string()),
    )
    return pa.array(md5_hex(s), type=pa.string())


def _keys_fast(ids: pa.Array, seed: int) -> pa.Array:
    v = np.asarray(ids.to_numpy(zero_copy_only=False), dtype=np.uint64)
    h = pd.util.hash_array((v + np.uint64(seed)).copy()) >> np.uint64(1)
    return pa.array(h.astype(np.int64))


def shuffle_shards(ds, id_col: str = "doc_id", seed: int = 17,
                   num_shards: int = 8, mode: str = "fast"):
    """-> Dataset(id_col, shard, pos): the deterministic shuffled order.

    ``num_shards`` must be a power of two <= 256 (shard = top key bits /
    hex nibbles, so shards partition the global shuffle order)."""
    if num_shards < 1 or num_shards > 256 or num_shards & (num_shards - 1):
        raise ValueError("num_shards must be a power of two in [1, 256]")

    def key(b: pa.Table) -> pa.Table:
        ids = b[id_col].combine_chunks()
        if mode == "md5":
            k = _keys_md5(ids, seed)
            # first hex byte, scaled to num_shards
            byte = pc.cast(pc.utf8_slice_codeunits(k, 0, 2), pa.string())
            nib = pc.index_in(
                byte, value_set=pa.array(
                    [f"{i:02x}" for i in range(256)], type=pa.string())
            )
            shard = pc.cast(
                pc.divide(nib, pa.scalar(256 // num_shards, pa.int32())),
                pa.int64(),
            )
        else:
            k = _keys_fast(ids, seed)
            # top bits of the 63-bit key
            kv = k.to_numpy(zero_copy_only=False).astype(np.uint64)
            shard = pa.array(
                (kv >> np.uint64(63 - int(num_shards).bit_length() + 1))
                .astype(np.int64)
                if num_shards > 1 else np.zeros(len(kv), dtype=np.int64)
            )
        return pa.table({id_col: ids, "__key": k, "shard": shard})

    def place(g: pa.Table) -> pa.Table:
        ids = g[id_col].to_numpy(zero_copy_only=False)
        if g["__key"].type == pa.string():
            kv = np.asarray(g["__key"].to_numpy(zero_copy_only=False),
                            dtype=object)
        else:
            kv = g["__key"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, kv))
        return pa.table({
            id_col: pa.array(ids[order]),
            "shard": g["shard"].combine_chunks().take(pa.array(order)),
            "pos": pa.array(np.arange(len(ids), dtype=np.int64)),
        })

    return (
        ds.map_batches(key, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(place, batch_format="pyarrow")
    )
