"""Cross-document paragraph dedup (stages/boilerplate.dedup_paragraphs)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from data_quality_check_ray.stages.boilerplate import (
    POS_BITS,
    _packed_positions,
    dedup_paragraphs,
)


def _ref(docs: dict[int, str | None]) -> dict[int, tuple[str | None, int]]:
    """Row-at-a-time reference: first (doc_id, index) occurrence wins."""
    seen: dict[str, tuple[int, int]] = {}
    for did in sorted(docs):
        t = docs[did]
        if t is None:
            continue
        for i, p in enumerate(t.split("\n")):
            seen.setdefault(p, (did, i))
    out = {}
    for did in sorted(docs):
        t = docs[did]
        if t is None:
            out[did] = (None, 0)
            continue
        kept, removed = [], 0
        for i, p in enumerate(t.split("\n")):
            if seen[p] == (did, i):
                kept.append(p)
            else:
                removed += 1
        out[did] = ("\n".join(kept), removed)
    return out


def _run(docs: dict[int, str | None], parallelism=3):
    import ray.data as rd

    tbl = pa.table({
        "doc_id": pa.array(sorted(docs), type=pa.int64()),
        "text": pa.array([docs[k] for k in sorted(docs)],
                         type=pa.large_string()),
    })
    ds = rd.from_arrow(tbl).repartition(parallelism)
    out = dedup_paragraphs(ds).to_pandas().set_index("doc_id")
    return {int(i): (r["text_dedup"], int(r["n_paras_removed"]))
            for i, r in out.iterrows()}


DOCS = {
    0: "header\nbody zero\nfooter a",
    1: "header\nbody one\nfooter b",
    2: "header\nbody zero\nfooter a",      # body+footer dup of doc 0
    3: "header\nheader\nunique",           # intra-doc repeat: keep first only
    4: None,                               # null text
    5: "",                                 # single empty paragraph
    6: "\nx",                              # empty para dups doc 5's
}


@pytest.mark.parametrize("parallelism", [1, 4])
def test_matches_scalar_reference(quiet_data_context, parallelism):
    assert _run(DOCS, parallelism) == _ref(DOCS)


def test_first_occurrence_is_kept_not_removed_everywhere(quiet_data_context):
    got = _run(DOCS)
    assert got[0] == ("header\nbody zero\nfooter a", 0)   # owns everything
    assert got[2] == ("", 3)                              # loses everything
    assert got[3] == ("unique", 2)     # both headers lost to doc 0's copy


def test_null_text_stays_null(quiet_data_context):
    got = _run(DOCS)
    assert got[4] == (None, 0)


def test_null_doc_does_not_own_empty_paragraph(quiet_data_context):
    # doc 5 ('' = one empty para) must own it; doc 6's leading empty dups
    got = _run(DOCS)
    assert got[5] == ("", 0)
    assert got[6] == ("x", 1)


def test_no_duplicates_is_identity(quiet_data_context):
    docs = {i: f"para {i} a\npara {i} b" for i in range(5)}
    got = _run(docs)
    assert all(got[i] == (docs[i], 0) for i in docs)


def test_packed_position_guards():
    with pytest.raises(ValueError, match="paragraphs"):
        _packed_positions(np.array([1], dtype=np.int64),
                          np.array([0, 1 << POS_BITS], dtype=np.int64))
    with pytest.raises(ValueError, match="doc ids"):
        _packed_positions(np.array([-1], dtype=np.int64),
                          np.array([0, 1], dtype=np.int64))
    with pytest.raises(ValueError, match="doc ids"):
        _packed_positions(np.array([1 << 43], dtype=np.int64),
                          np.array([0, 1], dtype=np.int64))


def test_owner_broadcast_guard(quiet_data_context):
    import ray.data as rd

    docs = {i: "dup everywhere" for i in range(20)}
    tbl = pa.table({"doc_id": pa.array(sorted(docs), type=pa.int64()),
                    "text": pa.array([docs[k] for k in sorted(docs)],
                                     type=pa.large_string())})
    with pytest.raises(ValueError, match="broadcast limit"):
        dedup_paragraphs(rd.from_arrow(tbl), broadcast_limit=0).to_pandas()
