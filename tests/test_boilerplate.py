"""C4-style boilerplate line removal (stages/boilerplate)."""

from __future__ import annotations

import pyarrow as pa

from data_quality_check_ray.stages.boilerplate import remove_boilerplate_lines


def _run(docs, min_count=3):
    import ray.data as rd

    t = pa.table({
        "doc_id": pa.array(list(range(len(docs))), type=pa.int64()),
        "text": pa.array(docs, type=pa.string()),
    })
    out = (remove_boilerplate_lines(rd.from_arrow(t), min_count=min_count)
           .to_pandas().set_index("doc_id").sort_index())
    return out


def test_boilerplate_removal_semantics(quiet_data_context):
    docs = [
        "COOKIE BANNER\nreal content one\nfooter",
        "COOKIE BANNER\nreal content two\nfooter",
        "COOKIE BANNER\nreal content three\nother footer",
        "unique document\nfooter",
    ]
    out = _run(docs)  # COOKIE BANNER x3 and footer x3 are boiler
    assert out.loc[0, "text_clean"] == "real content one"
    assert out.loc[1, "text_clean"] == "real content two"
    assert out.loc[2, "text_clean"] == "real content three\nother footer"
    assert out.loc[3, "text_clean"] == "unique document"
    assert out["n_lines_removed"].tolist() == [2, 2, 1, 1]


def test_boilerplate_counts_occurrences_not_docs(quiet_data_context):
    # the same line twice in ONE doc plus once elsewhere reaches count 3
    docs = ["spam\nspam\nkeep me", "spam\nalso keep"]
    out = _run(docs)
    assert out.loc[0, "text_clean"] == "keep me"
    assert out.loc[1, "text_clean"] == "also keep"
    assert out["n_lines_removed"].tolist() == [2, 1]


def test_boilerplate_null_and_fully_boiler_docs(quiet_data_context):
    docs = ["x", "x", "x", None, "x\ny"]
    out = _run(docs)
    # doc 0-2: only line is boiler (count 4) -> empty string, not null
    assert out.loc[0, "text_clean"] == ""
    assert out.loc[0, "n_lines_removed"] == 1
    # null text stays null with 0 removed
    assert out.loc[3, "text_clean"] is None or out.loc[3, "text_clean"] != out.loc[3, "text_clean"] or out["text_clean"].isna().loc[3]
    assert out.loc[3, "n_lines_removed"] == 0
    assert out.loc[4, "text_clean"] == "y"


def test_boilerplate_no_boiler_is_identity(quiet_data_context):
    docs = ["a\nb", "c\nd", "e"]
    out = _run(docs)
    assert out["text_clean"].tolist() == docs
    assert out["n_lines_removed"].tolist() == [0, 0, 0]


def test_boilerplate_broadcast_limit_fails_fast(quiet_data_context):
    import pytest
    import ray.data as rd

    t = pa.table({
        "doc_id": pa.array([0, 1, 2], type=pa.int64()),
        "text": pa.array(["same line"] * 3, type=pa.string()),
    })
    with pytest.raises(ValueError, match="broadcast limit"):
        remove_boilerplate_lines(
            rd.from_arrow(t), min_count=1, broadcast_limit=0
        )

