"""Pages table sources.

``read_pages``  — parquet reader with column pruning (the engine's S1).
``pages_from_documents`` — deterministic bridge from the driver's
``documents`` table (doc_id, text, lang, source, n_chars) to the pages
shape, so the flagship pipeline can run over the standard test corpora.
"""

from __future__ import annotations

from datetime import datetime, timezone

import pyarrow as pa

from ..schema import PAGES_SCHEMA
from .synth import wrap_html

_BASE_TS_US = int(datetime(2024, 1, 1, tzinfo=timezone.utc).timestamp() * 1_000_000)


def read_pages(paths, columns: list[str] | None = None, **kwargs):
    """ray.data.read_parquet with the pages schema; prune columns at the
    read when the pipeline doesn't need them all."""
    import ray.data as rd

    return rd.read_parquet(paths, columns=columns, **kwargs)


def documents_to_pages_batch(batch: pa.Table) -> pa.Table:
    """Vectorizable per-batch bridge: one document row -> one page row.

    url is keyed by doc_id (deterministic), warc_ts = base + doc_id seconds,
    html = the standard boilerplate wrap of text (so the extractor's
    byte-identical invariant is exercised on driver data too).
    """
    doc_ids = batch["doc_id"].to_pylist()
    texts = batch["text"].to_pylist()
    langs = batch["lang"].to_pylist()
    sources = batch["source"].to_pylist()
    rows = []
    for did, text, lang, src in zip(doc_ids, texts, langs, sources):
        host = f"{src}.docs.example.org"
        rows.append(
            {
                "url": f"https://{host}/{did}",
                "warc_ts": _BASE_TS_US + int(did) * 1_000_000,
                "html": wrap_html(text, host) if text is not None else None,
                "text": text,
                "lang": lang,
            }
        )
    return pa.Table.from_pylist(rows, schema=PAGES_SCHEMA)


def pages_from_documents(sf_dir: str):
    """documents.parquet under ``sf_dir`` -> pages-shaped Dataset."""
    import ray.data as rd

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang", "source"]
    )
    return ds.map_batches(documents_to_pages_batch, batch_format="pyarrow")
