"""Mergeable sketches (guide: emit one sketch per batch, merge in a tiny
second stage — sketches are designed to be mergeable).

HyperLogLog (Flajolet et al., 2007): p-bit register index, 64-p bit rank;
registers merge by elementwise max, so the per-batch partials shuffle as
2^p-byte blobs regardless of row count."""

from __future__ import annotations

import numpy as np

HLL_P = 12  # 4096 registers, ~1.6% standard error
_M = 1 << HLL_P


def _scramble(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.uint64, copy=True)
    x ^= x >> np.uint64(33)
    x *= np.uint64(0xFF51AFD7ED558CCD)
    x ^= x >> np.uint64(33)
    x *= np.uint64(0xC4CEB9FE1A85EC53)
    x ^= x >> np.uint64(33)
    return x


def hll_from_ints(keys: np.ndarray) -> np.ndarray:
    """int64/uint64 keys -> uint8[2^p] register array (one batch partial)."""
    h = _scramble(keys)
    idx = (h & np.uint64(_M - 1)).astype(np.int64)
    rest = h >> np.uint64(HLL_P)
    # rank = 1 + count of leading zeros in the remaining 64-p bits
    nbits = 64 - HLL_P
    rank = np.full(len(h), nbits + 1, dtype=np.uint8)
    nz = rest != 0
    # position of highest set bit via log2 on float64 is exact for <2^53;
    # 52-bit rest fits
    high = np.zeros(len(h), dtype=np.int64)
    high[nz] = np.floor(np.log2(rest[nz].astype(np.float64))).astype(np.int64)
    rank[nz] = (nbits - high[nz]).astype(np.uint8)
    regs = np.zeros(_M, dtype=np.uint8)
    np.maximum.at(regs, idx, rank)
    return regs


def hll_merge(sketches: list[np.ndarray]) -> np.ndarray:
    out = np.zeros(_M, dtype=np.uint8)
    for s in sketches:
        out = np.maximum(out, s)  # registers merge by elementwise max
    return out


def hll_estimate(regs: np.ndarray) -> float:
    m = float(_M)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(np.power(2.0, -regs.astype(np.float64)))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)  # small-range correction
    return float(est)


def approx_distinct(ds, col: str) -> float:
    """Dataset -> approximate distinct count of an integer column.

    Per-batch partial sketches (4 KiB each) -> driver-side merge: the
    shuffle-free replacement for ``ds.unique()`` at 10^12 rows."""
    import pyarrow as pa

    def partial(b: pa.Table) -> pa.Table:
        keys = b[col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"sketch": pa.array([hll_from_ints(keys).tobytes()], type=pa.binary())})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    merged = hll_merge([np.frombuffer(s, dtype=np.uint8) for s in parts["sketch"]])
    return hll_estimate(merged)
