"""Pinned fastText-style quality classifier (functions/quality_model)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from data_quality_check_ray.functions.quality_model import (
    B,
    KEEP_THRESHOLD,
    build_qc_weights,
    qc_scores,
    score_scalar_qc,
    word_bucket_scalar,
)
from data_quality_check_ray.sources.wordlists import TOXICITY_TERMS

EDGES = [
    "the quick brown fox",
    "",
    None,
    "the the and of to in that",
    "  leading   and trailing   ",
    "single",
    "schön größe straße übrigens",   # multi-byte utf-8
    "İstanbul ΣΟΦΌΣ STRASSE Ⅷ",      # simple-vs-full case-mapping traps
    "word " * 50,
    " ".join(sorted(TOXICITY_TERMS)),
]


def _engine(texts):
    return qc_scores(pa.array(texts, type=pa.large_string()))


def test_engine_matches_scalar_spec_bitwise_on_edges():
    s, k = _engine(EDGES)
    for i, t in enumerate(EDGES):
        es, ek = score_scalar_qc(t)
        assert s[i] == np.float32(es), (i, t)
        assert bool(k[i]) == ek, (i, t)


@settings(max_examples=60, deadline=None)
@given(st.lists(st.text(max_size=40), min_size=1, max_size=8))
def test_engine_matches_scalar_spec_property(texts):
    s, k = _engine(texts)
    for i, t in enumerate(texts):
        es, ek = score_scalar_qc(t)
        assert s[i] == np.float32(es), repr(t)
        assert bool(k[i]) == ek, repr(t)


def test_empty_and_null_docs_drop():
    s, k = _engine(["", None, "   "])
    assert (s == 0.0).all() and not k.any()


def test_keep_is_threshold_on_score():
    s, k = _engine(EDGES)
    assert np.array_equal(k, s >= KEEP_THRESHOLD)


def test_stopword_density_raises_score_toxicity_sinks_it():
    s, _ = _engine([
        "the and of to in that it is was for",
        " ".join(sorted(TOXICITY_TERMS)),
    ])
    assert s[0] > 0.5 > s[1]


def test_weights_pinned_and_frozen():
    w = build_qc_weights()
    assert w.shape == (B,) and w.dtype == np.float32
    assert not w.flags.writeable
    # artifact identity: same table on every build
    assert np.array_equal(w, build_qc_weights())


def test_word_bucket_matches_utf8_bytes():
    assert word_bucket_scalar("a") == ord("a") % B
    h = 0
    for byte in "größe".encode("utf-8"):
        h = (h * 31 + byte) % B
    assert word_bucket_scalar("größe") == h


@pytest.mark.parametrize("shape", [
    ["", "a b c"],          # empty leading doc (bigram -1 guard)
    ["a b c", ""],          # empty final doc (out-of-range end guard)
    ["", "", "x"],          # consecutive empty docs
    ["a", "b", "c"],        # one-token docs: no bigrams at all
])
def test_bigrams_never_cross_document_boundaries(shape):
    s, k = _engine(shape)
    for i, t in enumerate(shape):
        es, ek = score_scalar_qc(t)
        assert s[i] == np.float32(es), (shape, i)
        assert bool(k[i]) == ek
