"""Deterministic (stratified) sampling — the reproducible subsampling step
of a training-data curation pipeline.

Never ``random_sample``: at 10^12 rows a reproducible, RESUMABLE sample
must be a pure function of the row key, so reruns, partial re-processing
and cross-engine audits all agree.  Keep a row iff
``hash(key) mod M < rate * M`` — embarrassingly parallel, no shuffle, no
state.

Two hash modes:

  * ``md5``  — first byte of md5(str(key)): bit-compatible with a SQL
    engine (DuckDB ``substr(md5(CAST(k AS VARCHAR)), 1, 2)``), so the
    sample is oracle-checkable; per-row hashlib, use for audits.
  * ``fast`` — vectorized 64-bit SipHash-style (pandas ``hash_array``),
    for production scale; same statistical behavior, engine-internal.

Stratified: per-stratum rates (e.g. per language) via a rate map; rows in
strata absent from the map get ``default_rate``.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _rate_to_threshold_256(rate: float) -> int:
    """rate in [0,1] -> threshold in [0,256] (granularity 1/256)."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0,1], got {rate}")
    return int(round(rate * 256))


# bucket assigned to null integer keys in fast mode (any fixed value --
# the point is that it is independent of batch composition)
_NULL_KEY_SENTINEL = -(1 << 62) + 987654321


def hash_bucket_256(keys, mode: str = "fast") -> np.ndarray:
    """Row keys -> uint buckets in [0, 256).

    fast mode hashes integer keys DIRECTLY with the vectorized 64-bit
    hash (no per-row Python at all); non-integer keys fall back to one
    object-array hash.  The integer fast path produces a different (still
    uniform, still deterministic) bucket assignment than hashing str(k) —
    fine for the engine-internal mode; md5 stays bit-compatible with the
    SQL oracle."""
    if mode == "md5":
        if hasattr(keys, "to_pylist"):
            keys = keys.to_pylist()
        return np.fromiter(
            (hashlib.md5(str(k).encode()).digest()[0] for k in keys),
            dtype=np.int64, count=len(keys),
        )
    if mode == "fast":
        if isinstance(keys, (pa.Array, pa.ChunkedArray)):
            if pa.types.is_integer(keys.type):
                # an integer column with ANY null converts to float64 via
                # to_numpy, which would flip the WHOLE batch onto the
                # object/str hash path — the bucket of key k must never
                # depend on which rows share its batch (the sample is a
                # pure per-key function).  Fill nulls with a fixed
                # sentinel so null keys hash deterministically too.
                # safe=False: uint64 keys above 2^63 wrap deterministically
                # (a wrapped int is a perfectly good hash input; a safe
                # cast would RAISE on them instead)
                arr = pc.fill_null(
                    pc.cast(keys, pa.int64(), safe=False), _NULL_KEY_SENTINEL
                ).to_numpy(zero_copy_only=False)
            else:
                arr = keys.to_numpy(zero_copy_only=False)
        else:
            arr = np.asarray(keys)
        if np.issubdtype(arr.dtype, np.integer):
            h = pd.util.hash_array(arr.astype(np.int64, copy=False))
        else:
            h = pd.util.hash_array(arr.astype(object))
        return (h & np.uint64(0xFF)).astype(np.int64)
    raise ValueError(f"unknown hash mode: {mode}")


def sample_mask(keys, rate: float | None = None, strata=None,
                rate_by: dict | None = None, default_rate: float = 0.0,
                mode: str = "fast") -> np.ndarray:
    """Boolean keep-mask.  Either a global ``rate`` or per-stratum
    ``rate_by`` (with ``strata`` giving each row's stratum)."""
    buckets = hash_bucket_256(keys, mode)
    if rate_by is None:
        if rate is None:
            raise ValueError("need rate or rate_by")
        return buckets < _rate_to_threshold_256(rate)
    if strata is None:
        raise ValueError("rate_by needs strata")
    if hasattr(strata, "to_pylist"):
        strata = strata.to_pylist()
    th = np.fromiter(
        (_rate_to_threshold_256(rate_by.get(s, default_rate)) for s in strata),
        dtype=np.int64, count=len(strata),
    )
    return buckets < th


def deterministic_sample(ds, id_col: str, rate: float | None = None,
                         strat_col: str | None = None,
                         rate_by: dict | None = None,
                         default_rate: float = 0.0, mode: str = "fast"):
    """Dataset operator: keep rows by deterministic key-hash sampling.
    Pure map_batches filter — streams at any scale, no shuffle."""

    def f(b: pa.Table) -> pa.Table:
        mask = sample_mask(
            b[id_col], rate=rate,
            strata=b[strat_col] if strat_col else None,
            rate_by=rate_by, default_rate=default_rate, mode=mode,
        )
        return b.filter(pa.array(mask))

    return ds.map_batches(f, batch_format="pyarrow")


def mix_datasets(sources, mode: str = "fast"):
    """Reproducible data mixture: ``sources`` is a list of
    ``(ds, id_col, rate)`` — each source is deterministically subsampled
    at its weight (pure key-hash, no RNG) and the results are unioned.

    The training-data "mixture" step (X% web, Y% code, Z% reference) as a
    shuffle-free streaming operator: reruns reproduce the exact row set,
    and growing a weight yields a superset of the previous mixture (hash
    thresholds are nested).  Schemas must already be aligned by the
    caller."""
    if not sources:
        raise ValueError("mix_datasets needs at least one source")
    sampled = [deterministic_sample(ds, id_col, rate=r, mode=mode)
               for ds, id_col, r in sources]
    out = sampled[0]
    for s in sampled[1:]:
        out = out.union(s)
    return out
