"""Byte-identical extraction per url (BASELINE.json input_hint invariant)."""

from __future__ import annotations

import pyarrow as pa

from data_quality_check_ray.pipelines.reference_rules import extract_text_scalar
from data_quality_check_ray.sources import synth
from data_quality_check_ray.stages.extract import extract_stage, extract_text_array


def test_extract_inverts_wrap_bytes():
    t = synth.generate_table(400)
    ext = extract_text_array(t["html"])
    for i in range(len(t)):
        html = t["html"][i].as_py()
        if html is None:
            assert ext[i].as_py() is None
        else:
            assert ext[i].as_py() == t["text"][i].as_py()


def test_extract_scalar_matches_vectorized():
    t = synth.generate_table(200)
    ext = extract_text_array(t["html"])
    for i in range(len(t)):
        assert ext[i].as_py() == extract_text_scalar(t["html"][i].as_py())


def test_extract_handles_entities_and_newlines():
    text = "a < b & c > d\nsecond <line> & more"
    html = synth.wrap_html(text, "h.example.org")
    out = extract_text_array(pa.array([html], type=pa.binary()))
    assert out[0].as_py() == text


def test_extract_stage_falls_back_to_text_and_drops_html():
    t = synth.generate_table(300)
    out = extract_stage(t)
    assert "html" not in out.column_names
    assert "text_effective" in out.column_names
    for i in range(len(t)):
        html = t["html"][i].as_py()
        txt = t["text"][i].as_py()
        eff = out["text_effective"][i].as_py()
        if html is None:
            assert eff == txt
        else:
            assert eff == txt  # extraction reproduces text bytes


def test_extract_no_main_element_is_null():
    arr = pa.array([b"<html><body>no main</body></html>", None], type=pa.binary())
    out = extract_text_array(arr)
    assert out[0].as_py() is None and out[1].as_py() is None
