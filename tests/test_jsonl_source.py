"""JSONL ingestion (reference HTTP-JSON ingest analog) end-to-end."""

from __future__ import annotations

import base64
import json

import pytest

from data_quality_check_ray.pipelines.quality import build_pipeline
from data_quality_check_ray.sources import synth
from data_quality_check_ray.sources.jsonl import read_pages_jsonl


@pytest.fixture(scope="module")
def jsonl_file(tmp_path_factory):
    d = tmp_path_factory.mktemp("jsonl")
    path = d / "pages.jsonl"
    rows = []
    for i in range(60):
        r = synth.generate_row(i)
        rows.append(
            {
                "url": r["url"],
                "warc_ts": r["warc_ts"],
                "html": base64.b64encode(r["html"]).decode() if r["html"] else None,
                "text": r["text"],
                "lang": r["lang"],
            }
        )
    # escaped-document variant (unescape_json analog)
    esc_text = synth.generate_row(100)["text"]  # stratum-0 clean prose
    rows.append({"doc": json.dumps({"url": "https://e.example.org/esc", "warc_ts": 1_700_000_000_000_000, "text": esc_text, "lang": "en"})})
    # malformed-ish row: missing url
    rows.append({"warc_ts": 1, "text": "no url"})
    path.write_text("\n".join(json.dumps(r) for r in rows))
    return str(path)


def test_jsonl_roundtrip_through_pipeline(jsonl_file, quiet_data_context):
    out = build_pipeline(read_pages_jsonl(jsonl_file)).to_pandas()
    assert len(out) == 62
    byurl = out.set_index("url")
    # parity with the parquet path on the same rows
    import ray.data as rd

    ref = build_pipeline(rd.from_arrow(synth.generate_table(60))).to_pandas().set_index("url")
    common = ref.index
    assert (byurl.loc[common, "drop_reason"] == ref["drop_reason"]).all()
    assert byurl.loc["https://e.example.org/esc", "keep"]
    assert (byurl.loc[byurl.index == "", "drop_reason"] == "conform:null_url").all()
