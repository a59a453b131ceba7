"""Unicode NFC normalization kernel (functions/normalize)."""

from __future__ import annotations

import unicodedata

import pyarrow as pa

from data_quality_check_ray.functions.normalize import (
    nfc_normalize_column,
    nfc_stage,
)

NFD_CAFE = unicodedata.normalize("NFD", "café")   # e + combining acute
NFD_ANGST = unicodedata.normalize("NFD", "Ångström")


def test_nfd_inputs_are_normalized():
    texts = pa.array(["plain ascii", NFD_CAFE, NFD_ANGST, None, "", "한국어"])
    normed, changed = nfc_normalize_column(texts)
    assert normed.to_pylist() == [
        "plain ascii", "café", "Ångström", None, "", "한국어",
    ]
    assert changed.to_pylist() == [False, True, True, False, False, False]


def test_ascii_fast_path_is_identity():
    texts = pa.array(["only", "ascii", "rows", ""])
    normed, changed = nfc_normalize_column(texts)
    assert normed is texts  # zero-copy: no Python loop entered
    assert not any(changed.to_pylist())


def test_nfc_stage_appends_columns():
    t = pa.table({"text": pa.array([NFD_CAFE, "x"])})
    out = nfc_stage(t)
    assert out["text_nfc"].to_pylist() == ["café", "x"]
    assert out["nfc_changed"].to_pylist() == [True, False]


def test_dedup_motivation_nfd_nfc_collide_after_normalization():
    """The reason the operator exists: NFC('café'(NFD)) == 'café'(NFC),
    so exact dedup collapses the two encodings after normalization."""
    nfc = "café"
    assert NFD_CAFE != nfc
    normed, _ = nfc_normalize_column(pa.array([NFD_CAFE, nfc]))
    a, b = normed.to_pylist()
    assert a == b
