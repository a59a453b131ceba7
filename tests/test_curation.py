"""End-to-end curation pipeline (pipelines/curation)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from data_quality_check_ray.pipelines.curation import build_curation_pipeline

GOOD = ("the quick brown fox jumps over the lazy dog and runs into the "
        "deep green forest near the old stone bridge today")


def _table():
    rows = [
        {"doc_id": 0, "lang": "en", "text": GOOD},
        {"doc_id": 1, "lang": "en", "text": GOOD},            # exact dup of 0
        {"doc_id": 2, "lang": "en", "text": "too short"},
        {"doc_id": 3, "lang": "en", "text": "$$$ %% ## @@ !! ^^ && ** (( )) [[ ]]"},
        {"doc_id": 4, "lang": "de", "text": GOOD + " extended variant"},
        {"doc_id": 5, "lang": "xx", "text": GOOD + " another variant"},  # lang not in rates
        {"doc_id": 6, "lang": "en",
         "text": "zzz qqq www vvv kkk jjj mmm nnn ppp rrr"},  # no stopwords
    ]
    return pa.Table.from_pylist(rows)


def _run(ds=None, **kw):
    import ray.data as rd

    ds = ds or rd.from_arrow(_table()).repartition(3)
    return (build_curation_pipeline(ds, **kw)
            .to_pandas().set_index("doc_id").sort_index())


def test_drop_reasons(quiet_data_context):
    out = _run()
    assert bool(out.loc[0, "keep"])
    assert out.loc[1, "drop_reason"] == "dup:exact"      # min-id survives
    assert out.loc[2, "drop_reason"] == "rule:too_short"
    assert out.loc[3, "drop_reason"] in ("rule:too_short", "rule:symbol_ratio")
    assert bool(out.loc[4, "keep"])
    assert out.loc[5, "drop_reason"] == "sample:out"     # default_rate=0
    assert out.loc[6, "drop_reason"] == "rule:stopword"


def test_deterministic_across_runs(quiet_data_context):
    a, b = _run(), _run()
    assert a.equals(b)


def test_sampling_rates_applied(quiet_data_context):
    import pandas as pd
    import ray.data as rd

    n = 4000
    df = pd.DataFrame({
        "doc_id": np.arange(n),
        "lang": ["en", "de"] * (n // 2),
        # unique long texts: pass all rules, so only sampling drops
        "text": [GOOD + f" unique tail {i}" for i in range(n)],
    })
    out = _run(rd.from_pandas(df).repartition(4),
               rates={"en": 0.5, "de": 0.0})
    en = out[out["lang"] == "en"]
    de = out[out["lang"] == "de"]
    assert abs(en["keep"].mean() - 0.5) < 0.05
    assert not de["keep"].any()
    assert (de["drop_reason"] == "sample:out").all()


def test_full_pipeline_composes_decontam_and_dsir(quiet_data_context):
    """build_curation_full_pipeline: base reasons keep priority, the
    eval split (doc_id % eval_mod == 0) and docs overlapping its 5-grams
    get decontam:eval, the rest gain dsir:out only when unselected."""
    import ray.data as rd

    from data_quality_check_ray.pipelines.curation import (
        build_curation_full_pipeline)

    eval_text = ("alpha beta gamma delta epsilon zeta eta theta iota "
                 "kappa from the held out benchmark with many more words")
    rows = [
        # doc 0: the eval-split doc itself (0 % 7 == 0)
        {"doc_id": 0, "lang": "en", "text": eval_text},
        # doc 8: shares a 5-gram run with the eval doc -> contaminated
        {"doc_id": 8, "lang": "en",
         "text": "prefix words alpha beta gamma delta epsilon zeta "
                 "and then the rest of this ordinary document continues"},
        # doc 1: clean keeper
        {"doc_id": 1, "lang": "en", "text": GOOD},
        # doc 2: exact dup of 1 -> dup:exact outranks everything
        {"doc_id": 2, "lang": "en", "text": GOOD},
        # doc 3: too short AND would be eval split at mod 3 - rules win
        {"doc_id": 3, "lang": "en", "text": "too short"},
    ]
    ds = rd.from_arrow(pa.Table.from_pylist(rows)).repartition(2)
    out = (build_curation_full_pipeline(ds, eval_mod=7, dsir_target_mod=2)
           .to_pandas().set_index("doc_id").sort_index())
    assert out.loc[0, "drop_reason"] == "decontam:eval"
    assert out.loc[8, "drop_reason"] == "decontam:eval"
    assert out.loc[2, "drop_reason"] == "dup:exact"
    assert out.loc[3, "drop_reason"] == "rule:too_short"
    assert out.loc[1, "drop_reason"] in ("", "dsir:out")
    assert (out["keep"] == (out["drop_reason"] == "")).all()
