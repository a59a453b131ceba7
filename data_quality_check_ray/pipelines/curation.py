"""Corpus-curation pipeline: the round-2 operators composed end-to-end
over a documents-shaped table (doc_id, text, lang).

    read → NFC-normalize → quality signals (vectorized) → exact-dup
    assignment (digest groupby + bucketed join-back) → keep/drop decision
    → deterministic per-language survivor sampling → labeled Dataset

Shape notes (the same scale discipline as the flagship):
  * the spine is two map stages around ONE digest-only shuffle — document
    text never shuffles, only (fp128, doc_id) pairs;
  * dup assignment comes back via the bucketed hash join (bytes-scaled
    buckets), not a driver dict;
  * sampling is a pure key-hash filter — reruns reproduce the exact
    survivor set.

Drop reasons (first failing wins): ``dup:exact``, ``rule:too_short``,
``rule:symbol_ratio``, ``rule:stopword``, then sampling ``sample:out``;
kept rows carry reason "".
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

DEFAULT_RATES = {"en": 1.0, "de": 1.0, "fr": 1.0, "es": 1.0, "nl": 1.0}


def prep_stage(batch: pa.Table) -> pa.Table:
    """NFC normalization + quality signals + content digest (one pass)."""
    from ..functions.normalize import nfc_normalize_column
    from ..functions.textstats import text_stats
    from ..stages.dedup import content_hash128

    text, _ = nfc_normalize_column(batch["text"])
    stats = text_stats(text)
    lo, hi = content_hash128(text)
    # text itself is NOT emitted: everything downstream works on digests
    # and signals, so the heavy strings never leave this stage
    return pa.table({
        "doc_id": batch["doc_id"],
        "lang": batch["lang"],
        "n_words": pa.array(stats["n_words"]),
        "symbol_ratio": pa.array(stats["symbol_ratio"]),
        "stop_fraction": pa.array(stats["stop_fraction"]),
        "fp_lo": pa.array(lo),
        "fp_hi": pa.array(hi),
    })


def build_curation_pipeline(ds, rates: dict | None = None,
                            min_words: int = 10,
                            max_symbol_ratio: float = 0.1,
                            min_stop_fraction: float = 0.02):
    """documents Dataset -> labeled Dataset(doc_id, lang, keep,
    drop_reason) — lazy; caller consumes/writes."""
    from ..functions.sampling import sample_mask
    from ..stages.joins import hash_join

    # materialize: consumed by TWO branches (probe side + digest groupby);
    # without this the expensive prep pass would execute twice.  Output is
    # digests + scalar signals only (~60 bytes/doc), never the text.
    prepped = ds.map_batches(prep_stage, batch_format="pyarrow").materialize()

    # exact-dup representative per content digest: digest-only shuffle
    # (bucketed hash aggregate — see stages/groupagg), then join the rep
    # back onto the stream (right side is one row per DISTINCT document —
    # corpus-sized at worst, never broadcast)
    from ..stages.groupagg import grouped_agg_bucketed

    digests = prepped.map_batches(
        lambda b: b.select(["fp_lo", "fp_hi", "doc_id"]), batch_format="pyarrow"
    )
    reps = grouped_agg_bucketed(
        digests, keys=["fp_lo", "fp_hi"], aggs=[("doc_id", "min")],
        input_bytes=prepped.size_bytes(),
    ).map_batches(
        lambda t: t.rename_columns(["fp_lo", "fp_hi", "rep_lo_id"]),
        batch_format="pyarrow",
    )
    # join on an XOR-folded 64-bit key (the join primitive takes one
    # integer key) but CARRY the rep's full digest halves and post-filter
    # on 128-bit equality — a folded-key collision (expected at 10^12
    # docs) then yields a dropped spurious row, never a wrong label
    def pack(b: pa.Table, id_cols, keep_fp: bool) -> pa.Table:
        key = (b["fp_lo"].to_numpy(zero_copy_only=False)
               ^ b["fp_hi"].to_numpy(zero_copy_only=False))
        out = pa.table({"fpk": key})
        for c in id_cols:
            out = out.append_column(c, b[c])
        if keep_fp:
            out = out.append_column("fp_lo", b["fp_lo"])
            out = out.append_column("fp_hi", b["fp_hi"])
        return out

    left = prepped.map_batches(
        lambda b: pack(b, ["doc_id", "lang", "n_words", "symbol_ratio",
                           "stop_fraction"], keep_fp=True),
        batch_format="pyarrow",
    )
    right = reps.map_batches(
        lambda b: pa.table({
            "fpk": (b["fp_lo"].to_numpy(zero_copy_only=False)
                    ^ b["fp_hi"].to_numpy(zero_copy_only=False)),
            "rep_lo_id": b["rep_lo_id"],
            "rep_fp_lo": b["fp_lo"],
            "rep_fp_hi": b["fp_hi"],
        }),
        batch_format="pyarrow",
    )
    # both join sides are projections of the already-materialized digest
    # table: size buckets from its (instant) byte count instead of letting
    # _auto_buckets re-materialize the projections (2x = left + rep side
    # upper bound)
    joined = hash_join(left, right, key="fpk",
                       input_bytes=2 * (prepped.size_bytes() or 0) or None)

    rates = rates if rates is not None else DEFAULT_RATES

    def decide(b: pa.Table) -> pa.Table:
        # drop folded-key collision rows: only the true 128-bit match is
        # this document's representative
        b = b.filter(pc.and_(
            pc.equal(b["fp_lo"], b["rep_fp_lo"]),
            pc.equal(b["fp_hi"], b["rep_fp_hi"]),
        ))
        n = len(b)
        doc = b["doc_id"].to_numpy(zero_copy_only=False)
        rep = b["rep_lo_id"].to_numpy(zero_copy_only=False)
        reason = np.full(n, "", dtype=object)
        is_dup = rep != doc
        nw = b["n_words"].to_numpy(zero_copy_only=False)
        sym = b["symbol_ratio"].to_numpy(zero_copy_only=False)
        stop = b["stop_fraction"].to_numpy(zero_copy_only=False)
        sampled = sample_mask(doc, strata=b["lang"].to_pylist(),
                              rate_by=rates, default_rate=0.0, mode="fast")
        # first failing wins (reverse-priority overwrite)
        reason[~sampled] = "sample:out"
        reason[stop < min_stop_fraction] = "rule:stopword"
        reason[sym > max_symbol_ratio] = "rule:symbol_ratio"
        reason[nw < min_words] = "rule:too_short"
        reason[is_dup] = "dup:exact"
        return pa.table({
            "doc_id": b["doc_id"],
            "lang": b["lang"],
            "keep": pa.array(reason == ""),
            "drop_reason": pa.array(reason.tolist(), type=pa.string()),
        })

    return joined.map_batches(decide, batch_format="pyarrow")


def build_curation_full_pipeline(ds, rates: dict | None = None,
                                 eval_mod: int = 97,
                                 dsir_target_mod: int = 31,
                                 decontam_k: int = 5):
    """The FULL curation suite composed end-to-end — the engine analog of
    the reference's single orchestrator (json_validation.rs:16-149
    composes every validation arm), composing the base spine with
    benchmark decontamination and DSIR data selection as first-class
    stages:

        base      build_curation_pipeline (dup + rules + sampling)
        decontam  eval split = doc_id %% eval_mod == 0; broadcast eval
                  5-gram set, flag overlapping docs (stages/decontam)
        dsir      target split = doc_id %% dsir_target_mod == 0; hashed
                  n-gram importance weights, selected flag (stages/dsir)
        merge     two doc_id-keyed hash joins of ~40 B/doc verdict
                  tables (the text itself never joins), then one map

    Drop priority (first failing wins): ``dup:exact`` > ``rule:*`` >
    ``decontam:eval`` (the eval split itself AND any doc overlapping it)
    > ``dsir:out`` > ``sample:out``.  -> Dataset(doc_id, lang, keep,
    drop_reason).

    Scale shape: decontam adds zero shuffles (broadcast eval set), dsir
    adds zero shuffles (two streaming count passes + one scoring pass),
    the merge adds two integer-keyed joins sized from read metadata."""
    import ray

    from ..stages.decontam import _shingle_hash_rows, eval_ngram_set
    from ..stages.dsir import (
        dsir_center, dsir_lambda, featurize_batch, hashed_feature_counts_split,
        segment_sum_sequential)
    from ..stages.joins import cheap_num_rows, hash_join

    n_rows = cheap_num_rows(ds)
    verdict_bytes = (2 * 48 * n_rows) if n_rows else None

    base = build_curation_pipeline(ds, rates=rates)

    def eval_split(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        return b.filter(pa.array(ids % eval_mod == 0))

    ev = eval_ngram_set(
        ds.map_batches(eval_split, batch_format="pyarrow"),
        "text", k=decontam_k)

    def is_target(b: pa.Table):
        return b["doc_id"].to_numpy(zero_copy_only=False) \
            % dsir_target_mod == 0

    tgt, raw = hashed_feature_counts_split(ds, is_target)
    lam = dsir_lambda(tgt, raw)
    mu = float(dsir_center(raw, lam))

    # FUSED verdict pass: the decontam membership scan and the DSIR
    # scoring are independent per-doc functions of the text, so one map
    # computes both — one text pass and ONE doc_id join instead of two of
    # each (at 500-row test scale the saving is stage fixed costs; at
    # 100 TB it is a full corpus pass)
    ev_ref = ray.put(np.sort(ev))
    lam_ref = ray.put(np.ascontiguousarray(lam, dtype=np.float64))

    def verdict(b: pa.Table) -> pa.Table:
        evs, lt = ray.get(ev_ref), ray.get(lam_ref)
        h, rows, nr = _shingle_hash_rows(b["text"], decontam_k)
        if len(h) and len(evs):
            pos = np.searchsorted(evs, h)
            pos[pos == len(evs)] = 0
            ncont = np.bincount(rows[evs[pos] == h], minlength=nr)
        else:
            ncont = np.zeros(nr, dtype=np.int64)
        uni, woff, big, boff = featurize_batch(b["text"])
        logw = (segment_sum_sequential(lt[uni], woff)
                + segment_sum_sequential(lt[big], boff))
        nf = np.diff(woff) + np.diff(boff)
        return pa.table({
            "doc_id": b["doc_id"],
            "contaminated": pa.array(ncont > 0),
            "selected": pa.array(
                (logw > mu * nf.astype(np.float64)) & (nf > 0)),
        })

    verd = ds.map_batches(verdict, batch_format="pyarrow")
    merged = hash_join(base, verd, key="doc_id", input_bytes=verdict_bytes)

    def compose(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        reason = np.asarray(
            b["drop_reason"].to_numpy(zero_copy_only=False), dtype=object)
        contaminated = pc.fill_null(b["contaminated"], False) \
            .to_numpy(zero_copy_only=False)
        selected = pc.fill_null(b["selected"], False) \
            .to_numpy(zero_copy_only=False)
        out = reason.copy()
        # slot decontam/dsir between the rules and sample:out
        sampled_only = (reason == "") | (reason == "sample:out")
        out[sampled_only & ~selected] = "dsir:out"
        out[sampled_only & (contaminated | (ids % eval_mod == 0))] = \
            "decontam:eval"
        return pa.table({
            "doc_id": b["doc_id"],
            "lang": b["lang"],
            "keep": pa.array(out == ""),
            "drop_reason": pa.array(out.tolist(), type=pa.string()),
        })

    return merged.map_batches(compose, batch_format="pyarrow")
