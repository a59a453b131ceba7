"""JSONL pages source — the batch-file analog of the reference's HTTP JSON
ingestion (one request = one JSON document, handlers.rs:80-146: here one
line = one document, read distributed).

Accepts the escaped-payload variant too: if a line's ``doc`` field is a
JSON-string-encoded document it is unescaped first (``unescape_json``,
json_validation.rs:151-163 analog) — handled row-wise because escaped
payloads are a legacy ingest path, not the hot format.
"""

from __future__ import annotations

import base64
import json

import pyarrow as pa

from ..schema import PAGES_SCHEMA


def _normalize_row(row: dict) -> dict:
    if isinstance(row.get("doc"), str):  # escaped-document variant
        try:
            row = json.loads(row["doc"])
        except ValueError:
            row = {}
    html = row.get("html")
    if isinstance(html, str):
        try:
            html = base64.b64decode(html, validate=True)
        except (ValueError, TypeError):
            html = html.encode("utf-8")
    ts = row.get("warc_ts")
    if isinstance(ts, str):
        try:
            import datetime as dt

            ts = int(
                dt.datetime.fromisoformat(ts.replace("Z", "+00:00")).timestamp() * 1e6
            )
        except ValueError:
            ts = None
    return {
        "url": row.get("url"),
        "warc_ts": ts,
        "html": html,
        "text": row.get("text"),
        "lang": row.get("lang"),
    }


def normalize_batch(batch: pa.Table) -> pa.Table:
    rows = [_normalize_row(r) for r in batch.to_pylist()]
    # url is non-nullable in the schema; surface missing urls as "" so the
    # conformance stage records conform:null_url instead of a read failure
    for r in rows:
        if r["url"] is None:
            r["url"] = ""
    return pa.Table.from_pylist(rows, schema=PAGES_SCHEMA)


def read_pages_jsonl(paths, **kwargs):
    """JSONL file(s) -> pages-schema Dataset (feed to build_pipeline)."""
    import ray.data as rd

    ds = rd.read_json(paths, **kwargs)
    return ds.map_batches(normalize_batch, batch_format="pyarrow")
