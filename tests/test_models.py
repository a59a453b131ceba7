"""Langid + perplexity: engine (vectorized) vs pinned scalar path."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from data_quality_check_ray.functions import langid_model, lm
from data_quality_check_ray.sources import synth


def _texts(n=400):
    t = synth.generate_table(n)
    return [x for x in t["text"].to_pylist()]


def test_langid_scalar_equals_vectorized():
    texts = _texts()
    arr = pa.array(texts, type=pa.large_string())
    preds, scores = langid_model.langid_scores(arr)
    for i, t in enumerate(texts):
        if t is None:
            assert preds[i] == langid_model.UNKNOWN_LANG and scores[i] == 0.0
            continue
        p, s = langid_model.score_scalar(t)
        assert preds[i] == p, (i, preds[i], p)
        assert scores[i] == s, (i, scores[i], s)


def test_langid_predicts_generated_language():
    t = synth.generate_table(1000)
    preds, scores = langid_model.langid_scores(t["text"])
    correct = total = 0
    for i in range(len(t)):
        if i % 100 < 70:  # clean prose stratum: true lang = LANGS[i % 5]
            total += 1
            correct += preds[i] == synth.LANGS[i % 5]
    assert total > 0 and correct / total > 0.99


def test_ppl_scalar_equals_vectorized():
    texts = _texts()
    arr = pa.array(texts, type=pa.large_string())
    ppl = lm.ppl_batch(arr)
    for i, t in enumerate(texts):
        if t is None:
            assert ppl[i] == lm.PPL_SENTINEL
            continue
        assert ppl[i] == lm.ppl_scalar(t), i


def test_ppl_separates_clean_from_gibberish():
    clean = "the and of to in that it is was for with as his on be at".split()
    doc_clean = " ".join(clean * 5)
    doc_gibberish = "qzx vbnk wpl zzt qqq xjv plk mnb zxq wvu " * 5
    p = lm.ppl_batch(pa.array([doc_clean, doc_gibberish], type=pa.large_string()))
    assert p[0] < 5000 < p[1]


def test_short_docs_get_sentinel():
    p = lm.ppl_batch(pa.array(["", "one", None], type=pa.large_string()))
    assert all(x == lm.PPL_SENTINEL for x in p)
