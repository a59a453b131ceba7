"""Overlapping token-window chunking (stages/chunking)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from data_quality_check_ray.stages.chunking import chunk_batch, chunk_documents


def _b(texts):
    return pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                     "text": pa.array(texts, pa.string())})


def _ref_chunks(words, c, o):
    s = c - o
    out, i = [], 0
    if not words:
        return out
    while True:
        out.append(" ".join(words[i: i + c]))
        if i + c >= len(words):
            return out
        i += s


@pytest.mark.parametrize("c,o", [(12, 4), (5, 0), (8, 7), (3, 1)])
def test_chunk_batch_matches_reference(c, o):
    rng = np.random.RandomState(c * 31 + o)
    texts = [" ".join(f"w{j}" for j in range(rng.randint(0, 30)))
             for _ in range(60)] + [None, "", "  lead and trail  ", "one"]
    out = chunk_batch(_b(texts), "text", "doc_id", c, o).to_pandas()
    for i, t in enumerate(texts):
        ref = _ref_chunks((t or "").split(), c, o)
        g = out[out["doc_id"] == i].sort_values("chunk_id")
        assert g["chunk_text"].tolist() == ref, (i, t)
        if ref:
            assert (g["n_chunks"] == len(ref)).all()
            assert g["chunk_id"].tolist() == list(range(len(ref)))


def test_chunk_overlap_region_repeats():
    out = chunk_batch(_b(["a b c d e f g"]), "text", "doc_id", 4, 2) \
        .to_pandas()
    assert out["chunk_text"].tolist() == ["a b c d", "c d e f", "e f g"]


def test_chunk_exact_fit_no_trailing_window():
    out = chunk_batch(_b(["a b c d"]), "text", "doc_id", 4, 2).to_pandas()
    assert out["chunk_text"].tolist() == ["a b c d"]


def test_chunk_documents_dataset(quiet_data_context):
    import ray.data as rd

    ds = rd.from_arrow(_b(["a b c d e", "", "x y"])).repartition(3)
    out = chunk_documents(ds, chunk_tokens=3, overlap=1).to_pandas()
    assert len(out) == 3  # 2 from doc 0 ("a b c","c d e"), 1 from doc 2
    assert set(out[out["doc_id"] == 0]["chunk_text"]) == {"a b c", "c d e"}


def test_chunk_param_guard(quiet_data_context):
    import ray.data as rd

    with pytest.raises(ValueError):
        chunk_documents(rd.from_arrow(_b(["a"])), chunk_tokens=4, overlap=4)
    with pytest.raises(ValueError):
        chunk_documents(rd.from_arrow(_b(["a"])), chunk_tokens=4, overlap=-1)
