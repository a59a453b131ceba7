"""Vectorized heuristic kernels vs pure-Python scalar semantics."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from data_quality_check_ray.functions.textstats import (
    WORD_TRIM_CHARS,
    split_words,
    text_stats,
)
from data_quality_check_ray.sources.wordlists import STOPWORDS

TRICKY = [
    "",
    " ",
    "word",
    "hello  world ",
    "\tthe and\nof  to\t",
    "a b a b a b a b",
    "# ## ### … …",
    "- bullet one\n- bullet two\nplain",
    "ends with dots...\nand ellipsis…\nplain line",
    "Mixed. Case, Words! the The THE.",
    "ünïcödé wörds über straße",
    None,
]


def scalar_stats(text):
    text = text or ""
    words = text.split()
    n_words = len(words)
    out = {
        "n_chars": len(text),
        "n_words": n_words,
        "mean_word_len": sum(len(w) for w in words) / n_words if n_words else 0.0,
        "symbol_ratio": (text.count("#") + text.count("…")) / n_words if n_words else 0.0,
        "stop_fraction": (
            sum(1 for w in words if w.lower().strip(WORD_TRIM_CHARS) in STOPWORDS) / n_words
            if n_words
            else 0.0
        ),
    }
    bigrams = list(zip(words, words[1:]))
    out["dup2gram_fraction"] = 1.0 - len(set(bigrams)) / len(bigrams) if bigrams else 0.0
    lines = text.split("\n")
    out["bullet_ratio"] = sum(1 for l in lines if l.startswith(("- ", "• "))) / len(lines)
    out["ellipsis_ratio"] = sum(1 for l in lines if l.endswith(("...", "…"))) / len(lines)
    return out


def test_split_words_matches_python_split():
    arr = pa.array([t or "" for t in TRICKY], type=pa.large_string())
    vals, off = split_words(arr)
    got = [vals.to_pylist()[off[i]: off[i + 1]] for i in range(len(TRICKY))]
    expect = [(t or "").split() for t in TRICKY]
    assert got == expect


def test_text_stats_matches_scalar_on_tricky_inputs():
    arr = pa.array(TRICKY, type=pa.large_string())
    stats = text_stats(arr)
    for i, t in enumerate(TRICKY):
        exp = scalar_stats(t)
        for k, v in exp.items():
            assert np.isclose(stats[k][i], v, rtol=0, atol=0), (i, k, t, stats[k][i], v)


def test_text_stats_matches_scalar_on_synth_corpus():
    from data_quality_check_ray.sources import synth

    t = synth.generate_table(500)
    texts = t["text"]
    stats = text_stats(texts)
    for i in range(len(t)):
        exp = scalar_stats(texts[i].as_py())
        for k, v in exp.items():
            assert stats[k][i] == v, (i, k)
