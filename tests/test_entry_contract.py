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
