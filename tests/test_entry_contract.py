"""__ray_entry__ contract + engine/spec parity on the driver corpus
(out-of-domain for the models — labels must still match the pinned spec)."""

from __future__ import annotations

import pyarrow.parquet as pq


def test_entry_matches_scalar_spec_on_documents_pages(quiet_data_context):
    import __ray_entry__ as e
    from data_quality_check_ray.pipelines.reference_rules import label_table
    from data_quality_check_ray.sources.pages import documents_to_pages_batch

    eng = e.entry().to_pandas().set_index("url").sort_index()
    docs = pq.read_table("/root/testdata/sf0.001/documents.parquet")
    ref = (
        label_table(documents_to_pages_batch(docs))
        .to_pandas()
        .set_index("url")
        .sort_index()
    )
    assert len(eng) == len(ref) == 500
    assert (eng["keep"] == ref["keep"]).all()
    assert (eng["drop_reason"] == ref["drop_reason"]).all()


def test_queries_and_oracles_are_consistent_registries():
    import __ray_entry__ as e

    qs, os_ = e.queries(), e.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 15
    for name, fn in qs.items():
        assert callable(fn), name


def test_vectorized_pages_bridge_matches_row_loop():
    """The Arrow-kernel bridge must be byte-identical to the obvious
    row-at-a-time construction (including null text -> null html and the
    escape order &, <, >)."""
    import pyarrow as pa

    from data_quality_check_ray.schema import PAGES_SCHEMA
    from data_quality_check_ray.sources.pages import (
        _BASE_TS_US,
        documents_to_pages_batch,
    )
    from data_quality_check_ray.sources.synth import wrap_html

    docs = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet",
        columns=["doc_id", "text", "lang", "source"],
    )
    # add adversarial rows: null text, empty text, markup chars, newlines
    extra = pa.table({
        "doc_id": pa.array([900001, 900002, 900003, 900004], pa.int64()),
        "text": pa.array([None, "", "a & b <c> & <d>\n\nx", "line1\nline2"],
                         pa.large_string()),
        "lang": pa.array(["en", "de", "en", "fr"]),
        "source": pa.array(["web", "web", "code", "ref"]),
    })
    docs = pa.concat_tables([docs.select(extra.column_names),
                             extra.cast(docs.select(extra.column_names).schema)])

    got = documents_to_pages_batch(docs)

    rows = []
    for did, text, lang, src in zip(
        docs["doc_id"].to_pylist(), docs["text"].to_pylist(),
        docs["lang"].to_pylist(), docs["source"].to_pylist(),
    ):
        host = f"{src}.docs.example.org"
        rows.append({
            "url": f"https://{host}/{did}",
            "warc_ts": _BASE_TS_US + int(did) * 1_000_000,
            "html": wrap_html(text, host) if text is not None else None,
            "text": text,
            "lang": lang,
        })
    ref = pa.Table.from_pylist(rows, schema=PAGES_SCHEMA)
    assert got.schema.equals(ref.schema)
    assert got.equals(ref)
