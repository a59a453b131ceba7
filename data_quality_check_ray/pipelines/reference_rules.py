"""Pinned scalar reference implementation of the exact rule spec.

This is the engine's "reference labels" oracle (SURVEY.md §7.0): a slow,
obviously-correct per-row Python implementation of the identical decision
semantics — the role the round-trip serialization proof plays in the
reference repo (``dynamic-message/src/lib.rs:261-282``: validity is proven
by an independent second path).  The vectorized pipeline must match it at
keep/drop F1 ≥ 0.99 (in practice: exactly) and byte-identical scrubbed text
per url.

Deliberately row-at-a-time; never used in the hot path.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

from ..config import RuleConfig
from ..functions.langid_model import UNKNOWN_LANG, score_scalar
from ..functions.lm import PPL_SENTINEL, ppl_scalar
from ..functions.pii import scrub_scalar
from ..functions.textstats import WORD_TRIM_CHARS
from ..schema import ALLOWED_LANGS, VALID_LANG_CODES
from ..sources.wordlists import STOPWORDS

_MAIN_RE = re.compile(r"<main><p>(.*)</p></main>", re.S)


def extract_text_scalar(html: bytes | None) -> str | None:
    """Independent scalar extractor (html -> text), mirrors stages/extract.py."""
    if html is None:
        return None
    m = _MAIN_RE.search(html.decode("utf-8"))
    if m is None:
        return None
    inner = m.group(1)
    inner = inner.replace("</p>\n<p>", "\n")
    inner = inner.replace("&lt;", "<").replace("&gt;", ">").replace("&amp;", "&")
    return inner


def label_row(row: dict, rules: RuleConfig = RuleConfig()) -> dict:
    """page row -> {url, keep, drop_reason, lang_pred, lang_score, ppl,
    text_scrubbed}"""
    url = row.get("url")
    text = extract_text_scalar(row.get("html"))
    if text is None:
        text = row.get("text")

    out = {
        "url": url,
        "lang_pred": UNKNOWN_LANG,
        "lang_score": 0.0,
        "ppl": float(PPL_SENTINEL),
        "text_scrubbed": None,
        # stats are emitted for EVERY row with text, even conform-dropped
        # ones (textstats treats null text as zeros) — same contract as
        # the engine's stats stage
        "n_chars": len(text) if text is not None else 0,
        "n_words": len(text.split()) if text is not None else 0,
    }

    def done(reason: str) -> dict:
        out["keep"] = reason == ""
        out["drop_reason"] = reason
        return out

    # conformance (ordered, conformance.py)
    if url is None or url == "":
        return done("conform:null_url")
    if row.get("warc_ts") is None:
        return done("conform:null_ts")
    if text is None or text == "":
        return done("conform:no_content")
    lang = row.get("lang")
    if lang is not None and lang not in VALID_LANG_CODES:
        return done("conform:bad_lang")

    # models + scrub always computed for non-empty text
    pred, score = score_scalar(text)
    ppl = ppl_scalar(text)
    scrubbed, _counts, tox = scrub_scalar(text)
    out.update(
        lang_pred=pred, lang_score=float(score), ppl=float(ppl),
        text_scrubbed=scrubbed,
    )

    # heuristic stats (textstats.py semantics, pure Python)
    words = text.split()
    n_chars = len(text)
    n_words = len(words)
    mean_wl = sum(len(w) for w in words) / n_words if n_words else 0.0
    sym = text.count("#") + text.count("…")
    symbol_ratio = sym / n_words if n_words else 0.0
    alpha = sum(1 for w in words if any(c.isalpha() for c in w))
    alpha_word_fraction = alpha / n_words if n_words else 0.0
    stop = sum(1 for w in words if w.lower().strip(WORD_TRIM_CHARS) in STOPWORDS)
    stop_fraction = stop / n_words if n_words else 0.0
    bigrams = list(zip(words, words[1:]))
    dup2 = 1.0 - len(set(bigrams)) / len(bigrams) if bigrams else 0.0
    lines = text.split("\n")
    bullet_ratio = sum(
        1 for l in lines if l.startswith("- ") or l.startswith("• ")
    ) / len(lines)
    ellipsis_ratio = sum(
        1 for l in lines if l.endswith("...") or l.endswith("…")
    ) / len(lines)

    if n_chars < rules.min_chars:
        return done("rule:too_short")
    if n_chars > rules.max_chars:
        return done("rule:too_long")
    if n_words < rules.min_words:
        return done("rule:too_few_words")
    if mean_wl < rules.min_mean_word_len or mean_wl > rules.max_mean_word_len:
        return done("rule:word_length")
    if symbol_ratio > rules.max_symbol_ratio:
        return done("rule:symbol_ratio")
    if alpha_word_fraction < rules.min_alpha_word_fraction:
        return done("rule:non_alpha")
    if stop_fraction < rules.min_stop_fraction:
        return done("rule:stopword")
    if dup2 > rules.max_dup2gram_fraction:
        return done("rule:repetition")
    if bullet_ratio > rules.max_bullet_ratio:
        return done("rule:bullets")
    if ellipsis_ratio > rules.max_ellipsis_ratio:
        return done("rule:ellipsis")
    if pred not in ALLOWED_LANGS:
        return done("langid:not_target")
    if score < np.float32(rules.min_lang_score):
        return done("langid:low_confidence")
    if ppl > np.float32(rules.max_ppl):
        return done("ppl:high")
    if tox > 0:
        return done("tox:term")
    return done("")


def label_table(pages: pa.Table, rules: RuleConfig = RuleConfig()) -> pa.Table:
    rows = [label_row(r, rules) for r in pages.to_pylist()]
    return pa.Table.from_pylist(rows)
