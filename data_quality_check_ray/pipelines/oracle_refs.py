"""Independent scalar reference labels for model/hash pipelines, written
as parquet so their DuckDB oracle can diff against them.

The host_topk trick generalized (SURVEY.md §7.0 differential testing; the
reference repo proves validity through an independent second path,
dynamic-message/src/lib.rs:261-282): pipelines whose output is a
DETERMINISTIC function of the corpus but not SQL-expressible (pinned
langid model, engine hashes) get an obviously-correct row-at-a-time
reference implementation; the query callable writes these labels to a
fixed parquet path, and the pipeline's ``oracle_sql`` entry is simply
``SELECT ... FROM read_parquet('<that path>')`` — so the driver's checker
hash-compares the vectorized distributed engine against the scalar spec.

A stamp file (sf_dir + source mtimes + params) caches each reference:
the parquet regenerates only when the corpus or parameters actually
changed, so repeated invocations (bench reps, test reruns) don't re-pay
the scalar pass — which is seconds, not milliseconds, for the Python-int
MinHash at sf0.1.  ``DQCR_NO_ORACLE_REFS=1`` (set by bench.py only)
skips generation entirely.  The parquet reflects the sf_dir of the most
recent stamped build; query-then-oracle is the assumed (and the
driver's actual) order.

Deliberately row-at-a-time; never used in the hot path.
"""

from __future__ import annotations

import os
import unicodedata

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

ORACLE_DIR = "/tmp/dqcr_oracle"


def _stamp(sf_dir: str, extra=()) -> str:
    """Identity of a reference build: absolute sf_dir + (mtime_ns, size)
    of every table file in it + the builder's parameters.  Same stamp =>
    the scalar pass would produce the identical parquet."""
    parts = [os.path.abspath(sf_dir)]
    try:
        for name in sorted(os.listdir(sf_dir)):
            if name.endswith(".parquet"):
                st = os.stat(os.path.join(sf_dir, name))
                parts.append(f"{name}:{st.st_mtime_ns}:{st.st_size}")
    except OSError:
        pass
    parts.extend(repr(e) for e in extra)
    return "|".join(parts)


def _cached(name: str, stamp: str) -> str | None:
    """Existing reference path when it is already current, else None.

    The scalar row-at-a-time passes are NOT milliseconds at bench scale
    (the Python-int MinHash over sf0.1's 5k docs is seconds), and the
    query callables invoke the writers on every call — so bench.py's
    per-query timings would charge the scalar SPEC to the ENGINE.  Two
    guards: a stamp file skips rebuilds for an unchanged corpus, and
    DQCR_NO_ORACLE_REFS=1 (set by bench.py only; the correctness driver
    never sets it) skips generation entirely — bench never reads the
    reference parquet."""
    path = oracle_path(name)
    if os.environ.get("DQCR_NO_ORACLE_REFS"):
        return path
    try:
        with open(path + ".stamp") as f:
            if f.read() == stamp and os.path.exists(path):
                return path
    except OSError:
        pass
    return None


def _write(name: str, tbl: pa.Table, stamp: str | None = None) -> str:
    os.makedirs(ORACLE_DIR, exist_ok=True)
    path = f"{ORACLE_DIR}/{name}.parquet"
    # atomic like the stamp: a concurrent reader (parallel pytest worker /
    # driver gate) must never see a torn half-written parquet
    ptmp = path + ".tmp"
    pq.write_table(tbl, ptmp)
    os.replace(ptmp, path)
    if stamp is not None:
        tmp = path + ".stamp.tmp"
        with open(tmp, "w") as f:
            f.write(stamp)
        os.replace(tmp, path + ".stamp")
    return path


def oracle_path(name: str) -> str:
    return f"{ORACLE_DIR}/{name}.parquet"


def write_langid_reference(sf_dir: str) -> str:
    """Scalar-spec langid labels (langid_model.score_scalar per doc) —
    the independent path the vectorized langid_scores must match
    bit-for-bit (same float32 op order by construction of the spec)."""
    stamp = _stamp(sf_dir)
    hit = _cached("langid_documents", stamp)
    if hit:
        return hit
    from ..functions.langid_model import score_scalar

    docs = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )
    preds, scores = [], []
    for t in docs["text"].to_pylist():
        p, s = score_scalar(t)
        preds.append(str(p))
        scores.append(s)
    tbl = pa.table({
        "doc_id": docs["doc_id"],
        "lang_claimed": docs["lang"],
        "lang_pred": pa.array(preds, type=pa.string()),
        "lang_score": pa.array(np.array(scores, dtype=np.float32),
                               type=pa.float32()),
    })
    return _write("langid_documents", tbl, stamp)


def write_quality_classifier_reference(sf_dir: str) -> str:
    """Scalar-spec quality-classifier labels (quality_model.score_scalar_qc
    per doc) — the independent path the vectorized qc_scores must match
    bit-for-bit, float32 scores included."""
    art = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "artifacts",
        "qc_weights_trained.parquet")
    st = os.stat(art)
    # the weight artifact is part of the reference identity: retraining
    # must invalidate a cached reference built with the old table
    stamp = _stamp(sf_dir, extra=("qc_trained", st.st_mtime_ns, st.st_size))
    hit = _cached("quality_classifier", stamp)
    if hit:
        return hit
    from ..functions.quality_model import (
        load_trained_qc_weights, score_scalar_qc)

    docs = pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    w = load_trained_qc_weights()
    scores, keeps = [], []
    for t in docs["text"].to_pylist():
        s, k = score_scalar_qc(t, w)
        scores.append(s)
        keeps.append(k)
    tbl = pa.table({
        "doc_id": docs["doc_id"],
        "qc_score": pa.array(np.array(scores, dtype=np.float32),
                             type=pa.float32()),
        "qc_keep": pa.array(keeps, type=pa.bool_()),
    })
    return _write("quality_classifier", tbl, stamp)


def write_dsir_reference(sf_dir: str, target_mod: int = 31) -> str:
    """Scalar-spec DSIR selection labels: counts, lambda, and per-doc
    logw all from the row-at-a-time path (stages/dsir.dsir_logw_scalar;
    integer counts are exact in any order, lambda is the same float64
    formula, logw the same op order) — the independent second path the
    vectorized dsir_weights must match bit-for-bit."""
    stamp = _stamp(sf_dir, (target_mod, "centered-cut"))
    hit = _cached("dsir_select", stamp)
    if hit:
        return hit
    from ..functions.quality_model import (
        B, BIGRAM_MULT, lower_simple, word_bucket_scalar)
    from ..stages.dsir import dsir_center, dsir_lambda, dsir_logw_scalar

    docs = pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    ids = docs["doc_id"].to_numpy(zero_copy_only=False)
    texts = docs["text"].to_pylist()

    def counts(rows):
        c = np.zeros(B, dtype=np.int64)
        for t in rows:
            uni = np.array([word_bucket_scalar(lower_simple(w))
                            for w in (t or "").split()], dtype=np.int64)
            np.add.at(c, uni, 1)
            if len(uni) > 1:
                np.add.at(c, (uni[:-1] * BIGRAM_MULT + uni[1:]) % B, 1)
        return c

    tgt = counts(t for i, t in zip(ids, texts) if i % target_mod == 0)
    raw = counts(texts)
    lam = dsir_lambda(tgt, raw)
    mu = dsir_center(raw, lam)
    lws, nfs, sels = [], [], []
    for t in texts:
        lw, nf = dsir_logw_scalar(t, lam)
        lws.append(lw)
        nfs.append(nf)
        sels.append(bool(lw > mu * np.float64(nf)) and nf > 0)
    tbl = pa.table({
        "doc_id": docs["doc_id"],
        "n_features": pa.array(np.array(nfs, dtype=np.int64)),
        "dsir_logw": pa.array(np.array(lws, dtype=np.float64)),
        "selected": pa.array(sels, type=pa.bool_()),
    })
    return _write("dsir_select", tbl, stamp)


def write_curation_reference(sf_dir: str, rates: dict | None = None,
                             min_words: int = 10,
                             max_symbol_ratio: float = 0.1,
                             min_stop_fraction: float = 0.02) -> str:
    """Row-at-a-time reimplementation of pipelines/curation semantics:

      NFC via unicodedata; exact-dup rep = min doc_id per identical
      normalized TEXT (the engine groups by a 128-bit content digest —
      equality of digests == equality of text up to collisions the engine
      itself deems impossible); heuristic stats in the label_row scalar
      semantics; sampling membership from the definitional key-hash
      formula; first-failing-rule order dup > too_short > symbol_ratio >
      stopword > sample:out.
    """
    from ..functions.sampling import _rate_to_threshold_256
    from ..functions.textstats import WORD_TRIM_CHARS
    from ..sources.wordlists import STOPWORDS
    from .curation import DEFAULT_RATES

    rates = rates if rates is not None else DEFAULT_RATES
    stamp = _stamp(sf_dir, (sorted(rates.items()), min_words,
                            max_symbol_ratio, min_stop_fraction))
    hit = _cached("curation_pipeline", stamp)
    if hit:
        return hit
    docs = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )
    ids = docs["doc_id"].to_pylist()
    langs = docs["lang"].to_pylist()
    texts = [
        unicodedata.normalize("NFC", t) if t is not None else None
        for t in docs["text"].to_pylist()
    ]

    # null text is its OWN exact-dup group, distinct from "" — the engine
    # digests missing values with a dedicated missing-value hash
    # (stages/dedup.content_hash128), so all nulls share one rep but never
    # merge with empty strings
    _NULL_KEY = object()
    rep: dict[object, int] = {}
    for did, t in zip(ids, texts):
        key = t if t is not None else _NULL_KEY
        if key not in rep or did < rep[key]:
            rep[key] = did

    # sampling membership: hash(doc_id) & 0xFF < round(rate*256) — the
    # deterministic-sampling DEFINITION (functions/sampling fast mode)
    buckets = pd.util.hash_array(
        np.asarray(ids, dtype=np.int64)
    ) & np.uint64(0xFF)

    keeps, reasons = [], []
    for i, (did, lang, t) in enumerate(zip(ids, langs, texts)):
        rep_key = t if t is not None else _NULL_KEY
        t = t if t is not None else ""
        words = t.split()
        n_words = len(words)
        sym = t.count("#") + t.count("…")
        symbol_ratio = sym / n_words if n_words else 0.0
        stop = sum(
            1 for w in words if w.lower().strip(WORD_TRIM_CHARS) in STOPWORDS
        )
        stop_fraction = stop / n_words if n_words else 0.0
        sampled = int(buckets[i]) < _rate_to_threshold_256(
            rates.get(lang, 0.0)
        )
        if rep[rep_key] != did:
            reason = "dup:exact"
        elif n_words < min_words:
            reason = "rule:too_short"
        elif symbol_ratio > max_symbol_ratio:
            reason = "rule:symbol_ratio"
        elif stop_fraction < min_stop_fraction:
            reason = "rule:stopword"
        elif not sampled:
            reason = "sample:out"
        else:
            reason = ""
        keeps.append(reason == "")
        reasons.append(reason)

    tbl = pa.table({
        "doc_id": docs["doc_id"],
        "lang": docs["lang"],
        "keep": pa.array(keeps, type=pa.bool_()),
        "drop_reason": pa.array(reasons, type=pa.string()),
    })
    return _write("curation_pipeline", tbl, stamp)


def write_simhash_reference(sf_dir: str) -> str:
    """Row-at-a-time simhash64 (Charikar 2002): per-token crc32-pair
    hashes, per-bit +/-1 votes, bit set iff tally > 0 — the independent
    path the vectorized bincount kernel (stages/dedup.simhash64) must
    match exactly, including the uint64 -> int64 reinterpretation."""
    stamp = _stamp(sf_dir)
    hit = _cached("simhash_dedup", stamp)
    if hit:
        return hit
    import zlib

    docs = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    ids = docs["doc_id"].to_pylist()
    hashes = []
    for t in docs["text"].to_pylist():
        words = [w.lower() for w in (t or "").split()]
        tally = [0] * 64
        for w in words:
            h = (zlib.crc32(w.encode("utf-8")) << 32) | zlib.crc32(
                w.encode("utf-16-le")
            )
            for bit in range(64):
                tally[bit] += 1 if (h >> bit) & 1 else -1
        sh = 0
        for bit in range(64):
            if tally[bit] > 0:
                sh |= 1 << bit
        if sh >= 1 << 63:  # uint64 -> int64 reinterpret, as the engine does
            sh -= 1 << 64
        hashes.append(sh)
    rep: dict[int, int] = {}
    for did, sh in zip(ids, hashes):
        if sh not in rep or did < rep[sh]:
            rep[sh] = did
    tbl = pa.table({
        "doc_id": docs["doc_id"],
        "simhash": pa.array(hashes, type=pa.int64()),
        "rep_id": pa.array([rep[s] for s in hashes], type=pa.int64()),
    })
    return _write("simhash_dedup", tbl, stamp)


_MERSENNE = (1 << 61) - 1
_U64 = (1 << 64) - 1
_SHINGLE_P = 1099511628211


def _scalar_perm_params(num_perm: int):
    import hashlib

    a, b = [], []
    for i in range(num_perm):
        d = hashlib.md5(f"perm-{i}".encode()).digest()
        a.append((int.from_bytes(d[:8], "little") | 1) % _MERSENNE)
        b.append(int.from_bytes(d[8:16], "little") % _MERSENNE)
    return a, b


def write_minhash_reference(sf_dir: str, threshold: float = 0.8,
                            cap: int = 200) -> str:
    """Row-at-a-time MinHash-LSH clustering (Broder 1997) in exact Python
    ints: word-3-shingle polynomial hashes (uint64 wrap), affine
    permutations mod 2^61-1 (true modular arithmetic — Python ints make
    the engine's emulated _mulmod61 trivial here), 16 bands x 4 rows with
    the engine's combined int64 bucket key, bucket cap, exact-Jaccard
    verification, union-find min-label closure.  Every constant mirrors
    stages/dedup (NUM_PERM=64, NUM_BANDS=16, md5 perm seeds, FNV prime
    combine) so the distributed banded pipeline must reproduce these
    clusters exactly."""
    stamp = _stamp(sf_dir, (threshold, cap))
    hit = _cached("minhash_dedup", stamp)
    if hit:
        return hit
    import zlib

    from ..stages.dedup import NUM_BANDS, NUM_PERM, jaccard_scalar

    docs = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    ids = docs["doc_id"].to_pylist()
    texts = [t or "" for t in docs["text"].to_pylist()]
    pa_, pb_ = _scalar_perm_params(NUM_PERM)
    rows_per = NUM_PERM // NUM_BANDS

    buckets: dict[int, list[int]] = {}
    for did, t in zip(ids, texts):
        words = [w.lower() for w in t.split()]
        wh = [zlib.crc32(w.encode("utf-8")) for w in words]
        shingles = []
        for i in range(len(wh) - 2):
            h = wh[i]
            for j in (1, 2):
                h = (h * _SHINGLE_P + wh[i + j]) & _U64
            shingles.append(h)
        if not shingles:
            continue  # under-k docs emit no band rows (band_rows semantics)
        sig = [
            min(((a * (h % _MERSENNE)) % _MERSENNE + b) % _MERSENNE
                for h in shingles)
            for a, b in zip(pa_, pb_)
        ]
        for band in range(NUM_BANDS):
            bh = 0
            for r in range(rows_per):
                bh = (bh * _SHINGLE_P + sig[band * rows_per + r]) & _U64
            if bh >= 1 << 63:  # engine stores band_hash as int64 reinterpret
                bh -= 1 << 64
            # minhash_dedup.combine_key: key = band_hash*NUM_BANDS + band
            # in WRAPPING int64 arithmetic — replicate bit-for-bit
            key = (bh * NUM_BANDS + band) & _U64
            if key >= 1 << 63:
                key -= 1 << 64
            buckets.setdefault(key, []).append(did)

    text_of = dict(zip(ids, texts))
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for members in buckets.values():
        uniq = sorted(set(members))
        if len(uniq) < 2 or len(uniq) > cap:  # grouped_pairs run cap
            continue
        for i in range(len(uniq)):
            for j in range(i + 1, len(uniq)):
                a, b = uniq[i], uniq[j]
                if jaccard_scalar(text_of[a], text_of[b]) >= threshold:
                    ra, rb = find(a), find(b)
                    if ra != rb:
                        lo, hi = min(ra, rb), max(ra, rb)
                        parent[hi] = lo
                        parent.setdefault(lo, lo)

    reps = [find(d) if d in parent else d for d in ids]
    tbl = pa.table({
        "doc_id": docs["doc_id"],
        "rep_id": pa.array(reps, type=pa.int64()),
        "is_dup": pa.array([r != d for r, d in zip(reps, ids)],
                           type=pa.bool_()),
    })
    return _write("minhash_dedup", tbl, stamp)


def write_hll_reference(sf_dir: str) -> str:
    """Row-at-a-time HyperLogLog register construction in exact Python
    ints (the murmur-finalizer scramble, index/rank split, max-register
    update — functions/sketches.hll_from_ints semantics) over the events
    user_id column.  Registers must match the vectorized batch+merge path
    exactly; the final 10-line estimator formula is shared (it has no
    vectorization to check, and an independent float summation order
    would differ in the last ulp)."""
    stamp = _stamp(sf_dir)
    hit = _cached("approx_distinct_users", stamp)
    if hit:
        return hit
    from ..functions.sketches import HLL_P, hll_estimate

    ev = pq.read_table(f"{sf_dir}/events.parquet", columns=["user_id"])
    m = 1 << HLL_P
    u64 = (1 << 64) - 1
    nbits = 64 - HLL_P
    regs = [0] * m
    for k in ev["user_id"].to_pylist():
        h = int(k) & u64
        h ^= h >> 33
        h = (h * 0xFF51AFD7ED558CCD) & u64
        h ^= h >> 33
        h = (h * 0xC4CEB9FE1A85EC53) & u64
        h ^= h >> 33
        idx = h & (m - 1)
        rest = h >> HLL_P
        rank = (nbits + 1) if rest == 0 else nbits - rest.bit_length() + 1
        if rank > regs[idx]:
            regs[idx] = rank
    est = hll_estimate(np.array(regs, dtype=np.uint8))
    tbl = pa.table({
        "approx_distinct_users": pa.array([est], type=pa.float64()),
    })
    return _write("approx_distinct_users", tbl, stamp)


def write_qhist_reference(sf_dir: str) -> str:
    """Row-at-a-time log-histogram quantile sketch over documents.n_chars
    (functions/sketches.qhist_* semantics): per-value binning in a scalar
    loop (binning uses a 1-element np.log10 so the libm is bitwise the
    engine's — the independence under test is the bincount/merge/quantile
    machinery, not the transcendental), counts accumulated in Python,
    quantiles via the shared closed-form bin-midpoint extraction."""
    stamp = _stamp(sf_dir)
    hit = _cached("doc_len_quantiles", stamp)
    if hit:
        return hit
    from ..functions.sketches import (
        QH_BINS_PER_DECADE,
        QH_MIN_EXP,
        QH_SIZE,
        _QH_N,
        qhist_quantile,
    )

    docs = pq.read_table(f"{sf_dir}/documents.parquet", columns=["n_chars"])
    h = [0] * QH_SIZE
    for v in docs["n_chars"].to_pylist():
        if v is None:
            continue
        x = float(v)
        if x != x:  # NaN
            continue
        if x == 0:
            h[0] += 1
            continue
        if x == float("inf"):
            h[-1] += 1
            continue
        b = int(np.floor(np.log10(np.array([x]))[0] * QH_BINS_PER_DECADE)) \
            - QH_MIN_EXP * QH_BINS_PER_DECADE
        if b < 0:
            h[1] += 1
        elif b >= _QH_N:
            h[-1] += 1
        else:
            h[2 + b] += 1
    arr = np.array(h, dtype=np.int64)
    est = {f"p{int(q * 100)}": qhist_quantile(arr, q)
           for q in (0.5, 0.9, 0.99)}
    tbl = pa.table({k: pa.array([v], type=pa.float64())
                    for k, v in est.items()})
    return _write("doc_len_quantiles", tbl, stamp)


def write_pages_reference(sf_dir: str) -> str:
    """Scalar-spec labels for the flagship pages pipeline: the row-loop
    bridge (urls/ts/html from the documents construction) + the pinned
    label_row spec (pipelines/reference_rules) — the same independent
    path the golden entry test uses, emitted as a parquet oracle so the
    driver hash-checks the whole flagship output (keep/drop/scrubbed
    text/scores) instead of rows-only."""
    stamp = _stamp(sf_dir)
    hit = _cached("pages_pipeline", stamp)
    if hit:
        return hit
    from ..schema import PAGES_SCHEMA
    from ..sources.pages import _BASE_TS_US
    from ..sources.synth import wrap_html
    from .reference_rules import label_table

    docs = pq.read_table(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text", "lang", "source"],
    )
    rows = []
    for did, text, lang, src in zip(
        docs["doc_id"].to_pylist(), docs["text"].to_pylist(),
        docs["lang"].to_pylist(), docs["source"].to_pylist(),
    ):
        host = f"{src}.docs.example.org"
        rows.append({
            "url": f"https://{host}/{did}",
            "warc_ts": _BASE_TS_US + int(did) * 1_000_000,
            "html": wrap_html(text, host) if text is not None else None,
            "text": text,
            "lang": lang,
        })
    pages = pa.Table.from_pylist(rows, schema=PAGES_SCHEMA)
    ref = label_table(pages)
    tbl = pa.table({
        "url": ref["url"],
        "lang_pred": ref["lang_pred"].cast(pa.string()),
        "lang_score": ref["lang_score"].cast(pa.float32()),
        "ppl": ref["ppl"].cast(pa.float32()),
        "n_chars": ref["n_chars"].cast(pa.int64()),
        "n_words": ref["n_words"].cast(pa.int64()),
        "keep": ref["keep"].cast(pa.bool_()),
        "drop_reason": ref["drop_reason"].cast(pa.string()),
        "text_scrubbed": ref["text_scrubbed"].cast(pa.large_string()),
    })
    return _write("pages_pipeline", tbl, stamp)
