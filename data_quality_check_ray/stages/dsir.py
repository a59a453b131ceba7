"""DSIR data selection (Xie et al. 2023, "Data Selection for Language
Models via Importance Resampling") as Ray Data stages.

DSIR scores every raw-corpus document by the log importance ratio of a
small in-domain TARGET distribution to the RAW distribution, both
modeled as bag-of-hashed-n-grams multinomials:

    logw(doc) = sum_f  log p_target(f) - log p_raw(f)

over the doc's hashed word uni+bigram feature OCCURRENCES.  Documents
with high logw look like the target domain; selection keeps logw > 0
(equal odds) — the paper's Gumbel resampling drops in by adding noise
to logw before the cut, which would break determinism here for no
test value.

Feature identity is quality_model's pinned featurization
(``featurize_batch``: SIMPLE-lowercased whitespace tokens, byte-wise
polynomial hash mod B=2^16, adjacent-pair bigrams) — one shared kernel,
one shared scalar spec lineage.

Shape — ZERO shuffles end to end:

    count   [map_batches + driver fold]  per-block sparse bincount of
            feature ids -> (B,) int64 fold on the driver (B = 65,536:
            the fold is 512 KiB per partial, kmeans-centroid-sized)
    lambda  [driver]  smoothed log-ratio table, float64, computed once
    score   [map_batches]  broadcast lambda via ``ray.put`` once; per
            doc logw = sequential per-segment float64 sum of
            lambda[uni] plus the same over bigrams (identical op order
            to the scalar spec ``dsir_logw_scalar``)

The raw side's counts at 100 TB are one streaming pass producing one
sparse partial per block; the fold is a TWO-LEVEL tree
(``_fold_sparse_partials``): partials coalesce into a bounded set of
combiner tasks and the driver ingests at most FOLD_WIDTH re-sparsified
vectors — never one per block.  Integer sums are associative, so the
tree is bit-identical to a flat fold.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.quality_model import (
    B,
    BIGRAM_MULT,
    featurize_batch,
    lower_simple,
    word_bucket_scalar,
)
from ..functions.segments import segment_sum_sequential

#: Laplace smoothing mass per bucket (paper's add-alpha on the hashed
#: multinomial; keeps log() finite for buckets unseen on either side)
ALPHA = 1.0


def _is_small(ds, limit: int = 4 << 30) -> bool:
    """Metadata-only: True when the source is small enough that a flat
    driver fold of its per-block partials is a handful of vectors."""
    from .joins import cheap_size_bytes

    sz = cheap_size_bytes(ds)
    return sz is not None and sz < limit


#: combiner fan-in for the distributed count fold: the driver ingests at
#: most this many re-sparsified partials regardless of corpus block count
FOLD_WIDTH = 64


def _fold_sparse_partials(parts_ds, value_cols: tuple[str, ...],
                          width: int = FOLD_WIDTH,
                          small: bool = False) -> list[np.ndarray]:
    """Distributed tree-combine of sparse (bucket, counts...) partials ->
    one dense (B,) int64 vector per value column.

    The naive driver fold ingests one partial PER BLOCK — at 10^12-doc
    scale that is ~blocks x 512 KiB (hundreds of GB) through one node.
    Here the partial tables are coalesced into ``width`` combiner tasks
    (repartition moves each partial ONCE, spread across the cluster);
    each combiner sums its share densely and re-sparsifies, so the
    driver folds at most ``width`` vectors.  Integer sums are
    associative — the result is bit-identical to the naive fold.
    ``small=True`` (metadata says the source is test-scale, so the flat
    fold ingests a handful of partials anyway) skips the combiner level
    — it costs a repartition barrier, ~0.5 s of pure overhead on a
    5000-row table."""

    def combine(t: pa.Table) -> pa.Table:
        idx = t["b"].to_numpy(zero_copy_only=False)
        dense = [np.zeros(B, dtype=np.int64) for _ in value_cols]
        for d, c in zip(dense, value_cols):
            np.add.at(d, idx, t[c].to_numpy(zero_copy_only=False))
        nz = np.flatnonzero(np.sum(dense, axis=0) != 0) \
            if len(value_cols) > 1 else np.flatnonzero(dense[0])
        out = {"b": pa.array(nz.astype(np.int64))}
        for d, c in zip(dense, value_cols):
            out[c] = pa.array(d[nz])
        return pa.table(out)

    combined = parts_ds if small else parts_ds.repartition(width) \
        .map_batches(combine, batch_size=None, batch_format="pyarrow")
    totals = [np.zeros(B, dtype=np.int64) for _ in value_cols]
    for p in combined.iter_batches(batch_size=None, batch_format="pyarrow"):
        idx = p["b"].to_numpy(zero_copy_only=False)
        for t, c in zip(totals, value_cols):
            np.add.at(t, idx, p[c].to_numpy(zero_copy_only=False))
    return totals


def hashed_feature_counts(ds, text_col: str = "text") -> np.ndarray:
    """One streaming pass -> (B,) int64 occurrence counts of the corpus's
    hashed uni+bigram features (driver ingest bounded by the
    ``_fold_sparse_partials`` tree-combine)."""

    def partial(b: pa.Table) -> pa.Table:
        uni, _, big, _ = featurize_batch(b[text_col])
        c = np.bincount(uni, minlength=B)
        if len(big):
            c += np.bincount(big, minlength=B)
        nz = np.flatnonzero(c)
        return pa.table({"b": nz.astype(np.int64), "n": c[nz]})

    parts = ds.map_batches(partial, batch_format="pyarrow")
    return _fold_sparse_partials(parts, ("n",), small=_is_small(ds))[0]


def hashed_feature_counts_split(ds, target_mask_fn, text_col: str = "text"):
    """ONE streaming pass -> (target_counts, raw_counts), each (B,) int64.

    ``target_mask_fn(batch) -> bool ndarray`` marks the rows of the
    in-domain target sample; raw counts cover every row.  Fusing the two
    count passes halves the text reads of the separate
    ``hashed_feature_counts`` calls (the target is a subset of the raw
    corpus in the standard DSIR setup)."""
    from ..functions.segments import row_ids_from_offsets

    def partial(b: pa.Table) -> pa.Table:
        uni, woff, big, boff = featurize_batch(b[text_col])
        mask = np.asarray(target_mask_fn(b), dtype=bool)
        raw = np.bincount(uni, minlength=B)
        tm = mask[row_ids_from_offsets(woff)]
        tgt = np.bincount(uni[tm], minlength=B)
        if len(big):
            raw += np.bincount(big, minlength=B)
            bm = mask[row_ids_from_offsets(boff)]
            tgt += np.bincount(big[bm], minlength=B)
        nz = np.flatnonzero(raw)
        return pa.table({"b": nz.astype(np.int64), "nr": raw[nz],
                         "nt": tgt[nz]})

    parts = ds.map_batches(partial, batch_format="pyarrow")
    t, r = _fold_sparse_partials(parts, ("nt", "nr"), small=_is_small(ds))
    return t, r


def dsir_lambda(target_counts: np.ndarray, raw_counts: np.ndarray,
                alpha: float = ALPHA) -> np.ndarray:
    """Smoothed per-bucket log importance ratios -> (B,) float64.

    lambda_b = log((t_b + a) / (T + aB)) - log((r_b + a) / (R + aB))."""
    t = target_counts.astype(np.float64)
    r = raw_counts.astype(np.float64)
    lt = np.log(t + alpha) - np.log(t.sum() + alpha * B)
    lr = np.log(r + alpha) - np.log(r.sum() + alpha * B)
    return lt - lr


def dsir_center(raw_counts: np.ndarray, lam: np.ndarray) -> float:
    """Raw-expected per-feature log ratio  mu = E_raw[lambda]  — the
    selection baseline.

    With alpha-smoothing and a target sample far smaller than the raw
    corpus, E_raw[lambda] is strictly negative even when the two
    distributions are IDENTICAL (the smoothing mass spreads the tiny
    target total over all B buckets), so a fixed logw > 0 cut selects
    nothing.  Centering by mu removes exactly that bias: a doc is
    selected iff its features are more target-like than the raw-corpus
    AVERAGE (logw > mu * n_features).  Computed on the driver from the
    two count vectors — no extra data pass; the scalar spec calls this
    same function, so engine and spec share every float64 op."""
    total = raw_counts.sum()
    if total == 0:
        return 0.0
    return float((raw_counts.astype(np.float64) * lam).sum() / total)


def dsir_logw_scalar(text: str | None, lam: np.ndarray) -> tuple[float, int]:
    """Pinned scalar spec: one doc -> (logw float64, n_features).

    Same feature identity and float64 op order as the vectorized path
    (reduceat over a single segment == segment_sum_sequential's per-
    segment accumulation): unigram sum, then bigram sum, then one add."""
    toks = [lower_simple(t) for t in (text or "").split()]
    uni = np.array([word_bucket_scalar(t) for t in toks], dtype=np.int64)
    big = ((uni[:-1] * BIGRAM_MULT + uni[1:]) % B if len(uni) > 1
           else np.empty(0, dtype=np.int64))
    s_uni = (np.add.reduceat(lam[uni], np.array([0]))[0] if len(uni)
             else np.float64(0.0))
    s_big = (np.add.reduceat(lam[big], np.array([0]))[0] if len(big)
             else np.float64(0.0))
    return float(s_uni + s_big), int(len(uni) + len(big))


def dsir_weights(ds, lam: np.ndarray, text_col: str = "text",
                 id_col: str = "doc_id", center: float = 0.0):
    """Score every doc -> Dataset(id_col, n_features, dsir_logw, selected).

    ``lam`` (from ``dsir_lambda``) ships via ``ray.put`` once; docs with
    zero features get logw 0.0 and are never selected.  ``selected`` is
    logw > center * n_features (pass ``dsir_center(raw_counts, lam)``
    to cut at the raw-corpus average; 0.0 = the paper's equal-odds
    cut)."""
    import ray

    ref = ray.put(np.ascontiguousarray(lam, dtype=np.float64))
    mu = float(center)

    def score(b: pa.Table) -> pa.Table:
        lt = ray.get(ref)
        uni, woff, big, boff = featurize_batch(b[text_col])
        logw = (segment_sum_sequential(lt[uni], woff)
                + segment_sum_sequential(lt[big], boff))
        n_feat = np.diff(woff) + np.diff(boff)
        return pa.table({
            id_col: b[id_col],
            "n_features": pa.array(n_feat.astype(np.int64)),
            "dsir_logw": pa.array(logw),
            "selected": pa.array(
                (logw > mu * n_feat.astype(np.float64)) & (n_feat > 0)),
        })

    return ds.map_batches(score, batch_format="pyarrow")
