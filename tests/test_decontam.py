"""Eval-set decontamination: n-gram overlap flagging (stages/decontam)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from data_quality_check_ray.stages import decontam


EVAL_DOCS = [
    {"doc_id": 100, "text": "what is the capital of france paris obviously"},
    {"doc_id": 101, "text": "compute the sum of two plus two equals four"},
]

TRAIN_DOCS = [
    # contains the eval 5-gram "what is the capital of" (and more) once
    {"doc_id": 0, "text": "quiz answer what is the capital of france paris"},
    # repeats a leaked 5-gram twice -> n_contaminated counts occurrences
    {"doc_id": 1, "text": ("the sum of two plus two equals "
                           "and again the sum of two plus two equals four")},
    # clean
    {"doc_id": 2, "text": "unrelated text about arrow columnar batch engines"},
    # shorter than k words -> never contaminated
    {"doc_id": 3, "text": "tiny doc"},
    # empty text
    {"doc_id": 4, "text": ""},
    # null text
    {"doc_id": 5, "text": None},
]


def _flags(train_rows, eval_rows, k=5):
    import ray.data as rd

    ev = decontam.eval_ngram_set(
        rd.from_arrow(pa.Table.from_pylist(eval_rows)), "text", k=k
    )
    out = decontam.flag_contaminated(
        rd.from_arrow(pa.Table.from_pylist(train_rows)), ev, k=k
    ).to_pandas().set_index("doc_id")
    return out


def test_flags_constructed_contamination(quiet_data_context):
    out = _flags(TRAIN_DOCS, EVAL_DOCS)
    assert bool(out.loc[0, "contaminated"])
    # doc 0's windows "what is the capital of", "is the capital of france",
    # "the capital of france paris" all occur in eval doc 100
    assert out.loc[0, "n_contaminated"] == 3
    assert bool(out.loc[1, "contaminated"])
    # "the sum of two plus two equals" appears twice (windows x3 each... )
    # count occurrences exactly: eval doc 101 grams within doc 1's text
    assert out.loc[1, "n_contaminated"] >= 2
    for clean_id in (2, 3, 4, 5):
        assert not bool(out.loc[clean_id, "contaminated"])
        assert out.loc[clean_id, "n_contaminated"] == 0


def test_occurrences_counted_not_distinct(quiet_data_context):
    ev = [{"doc_id": 9, "text": "a b c d e"}]
    tr = [{"doc_id": 0, "text": "a b c d e x a b c d e"}]
    out = _flags(tr, ev)
    assert out.loc[0, "n_contaminated"] == 2


def test_empty_eval_set_flags_nothing(quiet_data_context):
    out = _flags(TRAIN_DOCS, [{"doc_id": 9, "text": "short"}])
    assert not out["contaminated"].any()
    assert (out["n_contaminated"] == 0).all()


def test_case_folded_match(quiet_data_context):
    ev = [{"doc_id": 9, "text": "The Quick Brown Fox Jumps"}]
    tr = [{"doc_id": 0, "text": "the quick brown fox jumps away"}]
    out = _flags(tr, ev)
    assert bool(out.loc[0, "contaminated"])


def test_broadcast_limit_guard(quiet_data_context):
    import ray.data as rd

    with pytest.raises(ValueError, match="eval n-gram set"):
        decontam.eval_ngram_set(
            rd.from_arrow(pa.Table.from_pylist(EVAL_DOCS)),
            "text", k=5, broadcast_limit=8,
        )


def test_shingle_hash_rows_matches_python_reference():
    texts = pa.array([
        "one two three four five six",
        "short",
        None,
        "one two three four five",
    ])
    h, rows, n = decontam._shingle_hash_rows(texts, 5)
    assert n == 4
    # row 0 has 2 windows, row 3 has 1; the window "one two three four five"
    # appears in both rows and must hash identically
    assert list(rows) == [0, 0, 3]
    assert h[0] == h[2]
    assert h[0] != h[1]


def test_broadcast_limit_exact_fallback(quiet_data_context):
    """The streaming guard is an upper bound (sum of per-block uniques);
    an eval corpus whose cross-block repetition pushes the bound over the
    limit but whose TRUE distinct set fits must succeed via the exact
    distributed-dedup re-check, not raise."""
    import ray.data as rd

    # 4 blocks of the SAME doc: bound = 4 blocks x 2 grams x 8 B = 64 B,
    # true distinct = 2 grams = 16 B -> limit 32 B rejects the bound but
    # admits the truth
    rows = [{"doc_id": i, "text": "a b c d e f"} for i in range(4)]
    ds = rd.from_arrow(pa.Table.from_pylist(rows)).repartition(4)
    ev = decontam.eval_ngram_set(ds, "text", k=5, broadcast_limit=32)
    assert len(ev) == 2
    # and a limit below even the true size still raises
    with pytest.raises(ValueError, match="after dedup"):
        decontam.eval_ngram_set(ds, "text", k=5, broadcast_limit=8)
