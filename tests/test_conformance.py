"""Conformance fixtures mirroring the reference's 5 dynamic-message tests
(dynamic-message/tests/dynamic_message_tests.rs:21-152 — valid /
type-mismatch / unknown-field / empty-message / round-trip), recast against
the pages schema per FIXTURES.md §2."""

from __future__ import annotations

import pyarrow as pa
import pytest

from data_quality_check_ray.schema import PAGES_SCHEMA, conforming_table
from data_quality_check_ray.sources import synth
from data_quality_check_ray.stages.conformance import conformance_stage
from data_quality_check_ray.stages.extract import extract_stage


def _page(**over):
    row = {
        "url": "https://h.example.org/p/1",
        "warc_ts": 1_700_000_000_000_000,
        "html": synth.wrap_html("Valid body text here with several plain words.", "h"),
        "text": "Valid body text here with several plain words.",
        "lang": "en",
    }
    row.update(over)
    return pa.Table.from_pylist([row], schema=PAGES_SCHEMA)


def _reason(t: pa.Table) -> str:
    return conformance_stage(extract_stage(t))["conform_reason"][0].as_py()


def test_valid_row_conforms():
    assert _reason(_page()) == ""


def test_null_content_rejected():
    assert _reason(_page(html=None, text=None)) == "conform:no_content"


def test_bad_lang_rejected():
    assert _reason(_page(lang="xx")) == "conform:bad_lang"
    assert _reason(_page(lang="")) == "conform:bad_lang"
    assert _reason(_page(lang=None)) == ""  # missing optional field allowed


def test_null_ts_rejected():
    assert _reason(_page(warc_ts=None)) == "conform:null_ts"


def test_unknown_extra_column_is_structural_error():
    # the analog of "Field '{}' not found in descriptor" (lib.rs:249-251)
    t = _page().append_column("bogus", pa.array([1], type=pa.int64()))
    with pytest.raises(ValueError, match="unknown columns"):
        conforming_table(t)


def test_missing_required_column_is_structural_error():
    t = _page().drop_columns(["warc_ts"])
    with pytest.raises(ValueError, match="missing required"):
        conforming_table(t)


def test_type_mismatch_cast():
    # int-typed warc_ts castable -> accepted; garbage string url stays a
    # string (schema-valid); a float with fraction in an int column raises
    t = _page()
    t2 = conforming_table(t)
    assert t2.schema.equals(PAGES_SCHEMA)


def test_round_trip_cast_is_stable():
    # serialize round-trip analog (lib.rs:261-282): cast -> cast == identity
    t = synth.generate_table(50)
    once = conforming_table(t)
    twice = conforming_table(once)
    assert once.equals(twice)


def test_first_failing_reason_order():
    # null url outranks null ts which outranks bad lang
    t = _page(url="", warc_ts=None, lang="xx")
    assert _reason(t) == "conform:null_url"
    t = _page(warc_ts=None, lang="xx")
    assert _reason(t) == "conform:null_ts"


def test_empty_batch_flows_through_decision(quiet_data_context):
    """Regression: a 0-row batch must pass through the full stage chain
    (empty blocks occur in real pipelines)."""
    from data_quality_check_ray.pipelines.quality import make_post_stage, pre_stage
    from data_quality_check_ray.config import PipelineConfig
    from data_quality_check_ray.stages.models import QualityModelStage

    t = synth.generate_table(0)
    out = QualityModelStage()(pre_stage(t))
    assert out.num_rows == 0
    assert "keep" in out.column_names


def test_schema_from_config_file(tmp_path, quiet_data_context):
    """Schema swap without a code change (SURVEY §2.9): a config-loaded
    pages-schema variant with an extra passthrough column is accepted by
    the pipeline, while the built-in schema rejects the same input."""
    import json

    import pyarrow as pa
    import ray.data as rd

    from data_quality_check_ray.config import PipelineConfig
    from data_quality_check_ray.pipelines.quality import build_pipeline
    from data_quality_check_ray.schema import load_schema_file, schema_from_spec
    from data_quality_check_ray.sources import synth

    spec = {"fields": [
        {"name": "url", "type": "string", "nullable": False},
        {"name": "warc_ts", "type": "timestamp[us]"},
        {"name": "html", "type": "binary"},
        {"name": "text", "type": "large_string"},
        {"name": "lang", "type": "string"},
        {"name": "crawl_id", "type": "int64"},
    ]}
    p = tmp_path / "pages_v2.json"
    p.write_text(json.dumps(spec))
    loaded = load_schema_file(str(p))
    assert loaded == schema_from_spec(spec)
    assert not loaded.field("url").nullable

    pages = synth.generate_table(40, seed=3)
    pages = pages.append_column("crawl_id", pa.array(range(40), type=pa.int64()))
    ds = rd.from_arrow(pages)

    out = build_pipeline(ds, PipelineConfig(schema_file=str(p))).to_pandas()
    assert len(out) == 40 and "keep" in out.columns

    with pytest.raises(Exception, match="unknown columns"):
        build_pipeline(rd.from_arrow(pages), PipelineConfig()).to_pandas()


def test_schema_spec_rejects_unknown_type():
    from data_quality_check_ray.schema import schema_from_spec

    with pytest.raises(ValueError, match="unknown type"):
        schema_from_spec({"fields": [{"name": "x", "type": "decimal"}]})
    with pytest.raises(ValueError, match="fields"):
        schema_from_spec({})
