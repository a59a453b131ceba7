"""Deterministic synthetic Common-Crawl-style pages (FIXTURES.md §1).

Every row is a pure function of ``(seed, row_index)`` — generation is
independent of batching/partitioning, so the same table materializes
identically whether built serially in a test or in parallel via
``ray.data.range(n).map_batches(...)`` on 32 CPUs.

Row mix (stratum = idx % 100, FIXTURES.md §1):
    0-69   clean prose in {en,de,fr,es,nl}
    70-77  boilerplate / repetition offenders
    78-83  symbol soup / too-short docs
    84-89  PII carriers (emails, phones, IPv4s, long ids)
    90-93  toxicity-term carriers
    94-97  conformance violations (null html+text / invalid lang / null ts)
    98-99  mixed-language docs (low langid confidence)

The HTML wrapper and the extractor in ``stages/extract.py`` are exact
inverses: ``extract(wrap_html(text)) == text`` byte-for-byte (the per-url
invariant from BASELINE.json ``input_hint``).
"""

from __future__ import annotations

import random
from datetime import datetime, timezone

import numpy as np
import pyarrow as pa

from ..schema import PAGES_SCHEMA
from .wordlists import TOXICITY_TERMS, WORDLISTS

LANGS = ("en", "de", "fr", "es", "nl")
DEFAULT_SEED = 42
NUM_HOSTS = 1000
_BASE_TS_US = int(
    datetime(2024, 6, 1, tzinfo=timezone.utc).timestamp() * 1_000_000
)
_WINDOW_US = 30 * 86_400 * 1_000_000  # 30-day window

_INVALID_LANG_CODES = ("xx", "zz", "q1", "EN!", "")

# --------------------------------------------------------------------------
# HTML wrap (inverse of stages/extract.py — keep the two in lockstep)
# --------------------------------------------------------------------------


def escape_html(text: str) -> str:
    return text.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def wrap_html(text: str, host: str) -> bytes:
    """Deterministic boilerplate wrapper; ``stages.extract.extract_text``
    recovers ``text`` byte-identically from the <main> element."""
    paragraphs = "</p>\n<p>".join(escape_html(line) for line in text.split("\n"))
    doc = (
        f"<html><head><title>{host}</title></head><body>"
        f'<nav><a href="/">Home</a> | <a href="/about">About</a> | '
        f'<a href="/contact">Contact</a></nav>'
        f"<main><p>{paragraphs}</p></main>"
        f"<footer>&copy; 2024 {host} — all rights reserved</footer>"
        f"</body></html>"
    )
    return doc.encode("utf-8")


# --------------------------------------------------------------------------
# Per-row generation
# --------------------------------------------------------------------------


def _sentence(rng: random.Random, words: list[str], lo: int = 8, hi: int = 20) -> str:
    n = rng.randint(lo, hi)
    toks = [words[rng.randrange(len(words))] for _ in range(n)]
    return (toks[0].capitalize() + " " + " ".join(toks[1:]) + ".") if len(toks) > 1 else toks[0].capitalize() + "."


def _clean_prose(rng: random.Random, lang: str, n_sent_lo: int = 4, n_sent_hi: int = 12) -> str:
    words = WORDLISTS[lang]
    sents = [_sentence(rng, words) for _ in range(rng.randint(n_sent_lo, n_sent_hi))]
    # paragraphs of 2-4 sentences, newline-separated
    lines: list[str] = []
    i = 0
    while i < len(sents):
        k = min(rng.randint(2, 4), len(sents) - i)
        lines.append(" ".join(sents[i : i + k]))
        i += k
    return "\n".join(lines)


def _repetition_doc(rng: random.Random, lang: str) -> str:
    words = WORDLISTS[lang]
    phrase = " ".join(words[rng.randrange(len(words))] for _ in range(rng.randint(4, 7)))
    reps = rng.randint(20, 40)
    if rng.random() < 0.5:
        return " ".join([phrase] * reps)
    # bullet-heavy variant
    return "\n".join(f"- {phrase}" for _ in range(reps))


def _symbol_doc(rng: random.Random) -> str:
    if rng.random() < 0.5:  # too-short doc
        return " ".join(WORDLISTS["en"][rng.randrange(20)] for _ in range(rng.randint(1, 4)))
    toks = []
    for _ in range(rng.randint(15, 40)):
        if rng.random() < 0.6:
            toks.append("#" * rng.randint(1, 4) + ("…" if rng.random() < 0.5 else ""))
        else:
            toks.append(WORDLISTS["en"][rng.randrange(len(WORDLISTS["en"]))])
    return " ".join(toks)


def _pii_doc(rng: random.Random, lang: str) -> str:
    text = _clean_prose(rng, lang, 5, 10)
    words = text.split(" ")
    n_pii = rng.randint(1, 3)
    for _ in range(n_pii):
        kind = rng.randrange(4)
        if kind == 0:
            tok = f"user{rng.randrange(1000)}@mail{rng.randrange(100)}.example.com"
        elif kind == 1:
            tok = f"+{rng.randint(1, 99)} {rng.randint(100, 999)} {rng.randint(100, 999)} {rng.randint(1000, 9999)}"
        elif kind == 2:
            tok = ".".join(str(rng.randint(1, 254)) for _ in range(4))
        else:
            tok = str(rng.randint(10**9, 10**13))
        words.insert(rng.randrange(len(words) + 1), tok)
    return " ".join(words)


def _tox_doc(rng: random.Random, lang: str) -> str:
    text = _clean_prose(rng, lang, 4, 9)
    words = text.split(" ")
    for _ in range(rng.randint(1, 2)):
        words.insert(rng.randrange(len(words) + 1), TOXICITY_TERMS[rng.randrange(len(TOXICITY_TERMS))])
    return " ".join(words)


def _mixed_doc(rng: random.Random) -> str:
    a, b = rng.sample(LANGS, 2)
    sa = [_sentence(rng, WORDLISTS[a]) for _ in range(rng.randint(3, 5))]
    sb = [_sentence(rng, WORDLISTS[b]) for _ in range(rng.randint(3, 5))]
    inter = [s for pair in zip(sa, sb) for s in pair]
    return "\n".join(" ".join(inter[i : i + 2]) for i in range(0, len(inter), 2))


def _host_for(rng: random.Random) -> str:
    # Zipf-ish skew: cubing pushes mass to low host ids (~1% of hosts own a
    # large share of rows) — exercises the salted-groupby host-report path.
    hid = int(NUM_HOSTS * rng.random() ** 3)
    return f"site{hid:04d}.example.org"


def generate_row(idx: int, seed: int = DEFAULT_SEED) -> dict:
    """Pure function (seed, idx) -> page row dict."""
    rng = random.Random((seed << 32) ^ idx)
    stratum = idx % 100
    lang = LANGS[idx % 5]
    host = _host_for(rng)
    url = f"https://{host}/p/{idx}"
    ts = _BASE_TS_US + rng.randrange(_WINDOW_US)

    claimed: str | None = lang if rng.random() < 0.9 else LANGS[rng.randrange(5)]
    if rng.random() < 0.05:
        claimed = None

    if stratum < 70:
        text = _clean_prose(rng, lang)
    elif stratum < 78:
        text = _repetition_doc(rng, lang)
    elif stratum < 84:
        text = _symbol_doc(rng)
        claimed = "en" if claimed is not None else None
    elif stratum < 90:
        text = _pii_doc(rng, lang)
    elif stratum < 94:
        text = _tox_doc(rng, lang)
    elif stratum < 98:
        kind = stratum - 94
        text = _clean_prose(rng, lang)
        if kind == 0:  # no content at all
            return {"url": url, "warc_ts": ts, "html": None, "text": None, "lang": claimed}
        if kind == 1:  # invalid claimed lang code
            bad = _INVALID_LANG_CODES[rng.randrange(len(_INVALID_LANG_CODES))]
            return {"url": url, "warc_ts": ts, "html": wrap_html(text, host), "text": text, "lang": bad}
        if kind == 2:  # null timestamp
            return {"url": url, "warc_ts": None, "html": wrap_html(text, host), "text": text, "lang": claimed}
        # kind == 3: html null, text present (extraction falls back to text)
        return {"url": url, "warc_ts": ts, "html": None, "text": text, "lang": claimed}
    else:
        text = _mixed_doc(rng)

    return {"url": url, "warc_ts": ts, "html": wrap_html(text, host), "text": text, "lang": claimed}


def _rows_to_table(rows: list[dict]) -> pa.Table:
    return pa.Table.from_pylist(rows, schema=PAGES_SCHEMA)


def generate_table(n: int, seed: int = DEFAULT_SEED, start: int = 0) -> pa.Table:
    """Serial generation (tests / small fixtures)."""
    return _rows_to_table([generate_row(i, seed) for i in range(start, start + n)])


def pages_dataset(n: int, seed: int = DEFAULT_SEED, parallelism: int = -1):
    """Distributed generation: ``ray.data.range(n)`` -> map_batches(generator).

    Row identity is (seed, id) so the result is independent of block layout.
    """
    import ray.data as rd

    def gen(batch: pa.Table) -> pa.Table:
        ids = batch["id"].to_numpy(zero_copy_only=False)
        return _rows_to_table([generate_row(int(i), seed) for i in ids])

    ds = rd.range(n, override_num_blocks=parallelism if parallelism > 0 else None)
    return ds.map_batches(gen, batch_format="pyarrow", batch_size=2048)


def _write_one_file(args) -> None:
    import os

    import pyarrow.parquet as pq

    path, lo, hi, seed = args
    if os.path.exists(path):
        return
    tmp = path + ".tmp"
    pq.write_table(generate_table(hi - lo, seed, start=lo), tmp)
    os.replace(tmp, path)


def write_pages_parquet(
    out_dir: str, n: int, seed: int = DEFAULT_SEED, num_files: int = 16,
    workers: int = 8,
) -> str:
    """Materialize a deterministic pages table as a directory of parquet
    files (one per contiguous row range → deterministic partition ids for
    the resume manifest).  Files are generated in parallel processes; each
    file is a pure function of (seed, row range), so layout is identical
    regardless of worker count.

    The skip-existing cache is guarded by a ``_MANIFEST.json`` recording
    (n, seed, num_files): a per-file existence check alone is UNSAFE when
    the layout changes — a dir first written with 32 files and later
    requested with 64 keeps the 32-layout files (whose row ranges belong
    to the OLD bounds) and adds 64-layout files on top, silently serving
    n×1.5 rows with half the corpus duplicated (observed: the 3.2M
    minhash scale run read 4.8M rows).  On any manifest mismatch the dir
    is wiped and regenerated."""
    import json
    import os
    from concurrent.futures import ProcessPoolExecutor

    os.makedirs(out_dir, exist_ok=True)
    manifest_path = os.path.join(out_dir, "_MANIFEST.json")
    want = {"n": int(n), "seed": int(seed), "num_files": int(num_files)}
    have = None
    try:
        with open(manifest_path) as f:
            have = json.load(f)
    except (OSError, ValueError):
        have = None
    if have != want:
        for name in os.listdir(out_dir):
            if name.endswith((".parquet", ".tmp")) or name == "_MANIFEST.json":
                os.unlink(os.path.join(out_dir, name))
        tmp = manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(want, f)
        os.replace(tmp, manifest_path)
    bounds = np.linspace(0, n, num_files + 1, dtype=np.int64)
    jobs = []
    for k in range(num_files):
        lo, hi = int(bounds[k]), int(bounds[k + 1])
        if hi <= lo:
            continue
        path = os.path.join(out_dir, f"part-{k:05d}.parquet")
        if not os.path.exists(path):
            jobs.append((path, lo, hi, seed))
    if not jobs:
        return out_dir
    if workers <= 1 or len(jobs) == 1:
        for j in jobs:
            _write_one_file(j)
    else:
        with ProcessPoolExecutor(max_workers=workers) as ex:
            list(ex.map(_write_one_file, jobs))
    return out_dir
