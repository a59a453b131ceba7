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


def test_trained_artifact_loads_and_paths_agree():
    """The committed trained table drops into both scoring paths and they
    stay bit-identical (same contract as the closed-form table)."""
    from data_quality_check_ray.functions.quality_model import (
        load_trained_qc_weights)

    w = load_trained_qc_weights()
    assert w.dtype == np.float32 and len(w) == 1 << 16
    texts = ["the quick brown fox jumps over the lazy dog",
             "blightmaw grimspit noxweed", "", None, "word"]
    s, k = qc_scores(pa.array(texts, type=pa.string()), w)
    for i, t in enumerate(texts):
        es, ek = score_scalar_qc(t, w)
        assert s[i] == np.float32(es)
        assert bool(k[i]) == ek


def test_trained_artifact_heldout_auc_recorded_above_bar():
    """Training metadata rides in the artifact; the held-out separation
    (quality vs junk on the synthetic corpus, computed by
    scripts/train_qc_weights.py on a disjoint split) must clear 0.9."""
    import json
    import os

    import pyarrow.parquet as pq

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "data_quality_check_ray", "artifacts",
        "qc_weights_trained.parquet")
    meta = json.loads(
        pq.read_schema(path).metadata[b"dqcr_qc_training"])
    assert meta["heldout_auc_overall"] > 0.9
    assert meta["heldout_auc_per_class"]["tox:term"] > 0.9
    assert meta["n_heldout_docs"] > 10_000


def test_trained_weights_separate_live_examples():
    """Live sanity: with the trained table, toxicity-laden prose scores
    below ordinary prose."""
    from data_quality_check_ray.functions.quality_model import (
        load_trained_qc_weights)

    w = load_trained_qc_weights()
    clean = ("The committee published its annual report on the state "
             "of the national parks and the people who visit them.")
    tox = clean + " blightmaw grimspit"
    s_clean, _ = score_scalar_qc(clean, w)
    s_tox, _ = score_scalar_qc(tox, w)
    assert s_tox < s_clean
