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


def _small_source(ds, limit: int = 4 << 30) -> bool:
    """Metadata-only: flat driver folds are fine for test-scale inputs;
    the bounded combiner levels exist for at-scale block counts."""
    from ..stages.joins import cheap_size_bytes

    sz = cheap_size_bytes(ds)
    return sz is not None and sz < limit


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

    Per-batch partial sketches (4 KiB each) -> bounded combiner level
    (64 tasks, each merges its share — HLL merge is an elementwise max,
    fully associative) -> driver merge of <= 64 sketches: the
    shuffle-free replacement for ``ds.unique()`` at 10^12 rows whose
    driver ingest stays 256 KiB no matter how many blocks."""
    import pyarrow as pa

    def partial(b: pa.Table) -> pa.Table:
        keys = b[col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"sketch": pa.array([hll_from_ints(keys).tobytes()], type=pa.binary())})

    def combine(t: pa.Table) -> pa.Table:
        if not len(t):  # repartition can produce empty blocks
            return pa.table({"sketch": pa.array([], type=pa.binary())})
        m = hll_merge([np.frombuffer(s, dtype=np.uint8)
                       for s in t["sketch"].to_pylist()])
        return pa.table({"sketch": pa.array([m.tobytes()], type=pa.binary())})

    parts_ds = ds.map_batches(partial, batch_format="pyarrow")
    if not _small_source(ds):
        parts_ds = parts_ds.repartition(64).map_batches(
            combine, batch_size=None, batch_format="pyarrow")
    parts = parts_ds.to_pandas()
    merged = hll_merge([np.frombuffer(s, dtype=np.uint8) for s in parts["sketch"]])
    return hll_estimate(merged)


# ---------------------------------------------------------------------------
# log-histogram quantile sketch (mergeable, deterministic)
# ---------------------------------------------------------------------------

#: bins per decade: relative error of a quantile estimate is bounded by
#: half a bin width, ~ (10^(1/BINS_PER_DECADE) - 1) / 2 = 1.8%
QH_BINS_PER_DECADE = 64
QH_MIN_EXP, QH_MAX_EXP = -6, 12   # value range [1e-6, 1e12)
_QH_N = (QH_MAX_EXP - QH_MIN_EXP) * QH_BINS_PER_DECADE
#: layout: [zeros, underflow, bin_0 .. bin_{N-1}, overflow]
QH_SIZE = _QH_N + 3


def qhist_from_values(x: np.ndarray) -> np.ndarray:
    """Non-negative values -> int64[QH_SIZE] counts (one batch partial).

    Deterministic and mergeable by ADDITION — the per-batch partial is a
    fixed ~9 KiB vector regardless of row count, the quantile analog of
    the HLL registers above.  NaN (null) values are SKIPPED (standard
    null-ignoring quantile semantics), +inf counts as overflow; negative
    values are a ValueError (track a mirrored sketch if you need them)."""
    x = np.asarray(x, dtype=np.float64)
    x = x[~np.isnan(x)]
    if (x < 0).any():
        raise ValueError("qhist supports non-negative values only")
    h = np.zeros(QH_SIZE, dtype=np.int64)
    zeros = x == 0
    h[0] = int(zeros.sum())
    inf = np.isinf(x)
    h[-1] = int(inf.sum())
    v = x[~zeros & ~inf]
    if len(v):
        b = np.floor(np.log10(v) * QH_BINS_PER_DECADE).astype(np.int64) \
            - QH_MIN_EXP * QH_BINS_PER_DECADE
        under = b < 0
        over = b >= _QH_N
        h[1] = int(under.sum())
        h[-1] += int(over.sum())
        mid = b[~under & ~over]
        h[2:-1] += np.bincount(mid, minlength=_QH_N)
    return h


def qhist_merge(parts: list[np.ndarray]) -> np.ndarray:
    out = np.zeros(QH_SIZE, dtype=np.int64)
    for p in parts:
        out += p
    return out


def qhist_quantile(h: np.ndarray, q: float) -> float:
    """Quantile estimate: geometric midpoint of the bin containing the
    q-th value (zeros -> 0.0; under/overflow -> range edge)."""
    total = int(h.sum())
    if total == 0:
        return float("nan")
    target = q * (total - 1)
    cum = np.cumsum(h)
    i = int(np.searchsorted(cum, target, side="right"))
    if i == 0:
        return 0.0
    if i == 1:
        return 10.0 ** QH_MIN_EXP
    if i >= QH_SIZE - 1:
        return 10.0 ** QH_MAX_EXP
    b = i - 2  # bin index
    lo = (b + QH_MIN_EXP * QH_BINS_PER_DECADE) / QH_BINS_PER_DECADE
    return 10.0 ** (lo + 0.5 / QH_BINS_PER_DECADE)


def approx_quantiles(ds, col: str, qs: tuple = (0.5, 0.9, 0.99)) -> dict:
    """Dataset operator: distributed approximate quantiles of a
    non-negative numeric column — one fixed-size partial per block, a
    bounded combiner level (counts sum associatively), then a driver
    merge of <= 64 histograms (same shape as approx_distinct)."""
    import pyarrow as pa

    def partial(b: pa.Table) -> pa.Table:
        h = qhist_from_values(b[col].to_numpy(zero_copy_only=False))
        return pa.table({"h": pa.array([h.tobytes()], type=pa.binary())})

    def combine(t: pa.Table) -> pa.Table:
        if not len(t):  # repartition can produce empty blocks
            return pa.table({"h": pa.array([], type=pa.binary())})
        m = qhist_merge([np.frombuffer(r, dtype=np.int64)
                         for r in t["h"].to_pylist()])
        return pa.table({"h": pa.array([m.tobytes()], type=pa.binary())})

    parts_ds = ds.map_batches(partial, batch_format="pyarrow")
    if not _small_source(ds):
        parts_ds = parts_ds.repartition(64).map_batches(
            combine, batch_size=None, batch_format="pyarrow")
    parts = [
        np.frombuffer(row["h"], dtype=np.int64)
        for t in parts_ds.iter_batches(batch_size=None,
                                       batch_format="pyarrow")
        for row in t.to_pylist()
    ]
    merged = qhist_merge(parts) if parts else np.zeros(QH_SIZE, dtype=np.int64)
    return {f"p{int(q * 100)}": qhist_quantile(merged, q) for q in qs}
