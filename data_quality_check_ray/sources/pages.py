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
    """Fully vectorized per-batch bridge: one document row -> one page row.

    url is keyed by doc_id (deterministic), warc_ts = base + doc_id seconds,
    html = the standard boilerplate wrap of text (so the extractor's
    byte-identical invariant is exercised on driver data too).  All Arrow
    kernels — the wrap is the element-wise mirror of ``synth.wrap_html``
    (escape &/</> in that order, join lines with </p>\\n<p>, concat the
    boilerplate) proven byte-identical by the golden bridge test; this
    stage feeds the headline ``pages_pipeline``/``host_topk`` path, where
    the previous per-row dict loop paid Python cost the engine's own
    style rules prohibit.
    """
    import numpy as np
    import pyarrow.compute as pc

    def one(a):
        return a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a

    doc_id = one(batch["doc_id"])
    text = pc.cast(one(batch["text"]), pa.large_string())
    sep = pa.scalar("", pa.string())

    host = pc.binary_join_element_wise(
        pc.cast(one(batch["source"]), pa.string()),
        pa.scalar(".docs.example.org", pa.string()), sep,
    )
    url = pc.binary_join_element_wise(
        pa.scalar("https://", pa.string()), host, pa.scalar("/", pa.string()),
        pc.cast(doc_id, pa.string()), sep,
    )
    ts = pa.array(
        _BASE_TS_US
        + doc_id.to_numpy(zero_copy_only=False).astype(np.int64) * 1_000_000,
        type=pa.timestamp("us"),
    )
    # escape_html, element-wise, SAME replacement order (& first)
    esc = pc.replace_substring(text, "&", "&amp;")
    esc = pc.replace_substring(esc, "<", "&lt;")
    esc = pc.replace_substring(esc, ">", "&gt;")
    paragraphs = pc.binary_join(
        pc.split_pattern(esc, "\n"), pa.scalar("</p>\n<p>", pa.large_string())
    )
    html = pc.binary_join_element_wise(
        pa.scalar("<html><head><title>", pa.large_string()),
        pc.cast(host, pa.large_string()),
        pa.scalar(
            '</title></head><body><nav><a href="/">Home</a> | '
            '<a href="/about">About</a> | <a href="/contact">Contact</a>'
            "</nav><main><p>",
            pa.large_string(),
        ),
        paragraphs,
        pa.scalar("</p></main><footer>&copy; 2024 ", pa.large_string()),
        pc.cast(host, pa.large_string()),
        pa.scalar(
            " — all rights reserved</footer></body></html>", pa.large_string()
        ),
        pa.scalar("", pa.large_string()),
        # null text -> null html (matches the scalar bridge's None check)
    )
    html = pc.cast(pc.cast(html, pa.large_binary()), pa.binary())
    return pa.table(
        {
            "url": url,
            "warc_ts": ts,
            "html": html,
            "text": text,
            "lang": pc.cast(one(batch["lang"]), pa.string()),
        },
        schema=PAGES_SCHEMA,
    )


def pages_from_documents(sf_dir: str, columns: list[str] | None = None):
    """documents.parquet under ``sf_dir`` -> pages-shaped Dataset.

    ``columns``: optional subset of the pages schema to build.  Consumers
    that only key on ``url`` (host counting / capping / blocklists) must
    not pay for the html wrap — the bridge's dominant cost — NOR read the
    text bytes off storage: the projection prunes the parquet read down
    to the source columns the requested page columns actually derive
    from (url <- doc_id+source, warc_ts <- doc_id, html/text <- text,
    lang <- lang)."""
    import ray.data as rd

    if columns is None:
        ds = rd.read_parquet(
            f"{sf_dir}/documents.parquet",
            columns=["doc_id", "text", "lang", "source"]
        )
        return ds.map_batches(documents_to_pages_batch, batch_format="pyarrow")

    need: set[str] = set()
    for c in columns:
        need |= {"url": {"doc_id", "source"}, "warc_ts": {"doc_id"},
                 "html": {"doc_id", "source", "text"}, "text": {"text"},
                 "lang": {"lang"}}[c]
    # the full bridge kernel needs every source column present; feed it
    # only the pruned read plus null padding for the ones it won't use
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=sorted(need))

    def bridge(b: pa.Table) -> pa.Table:
        n = b.num_rows
        pad = {"doc_id": pa.int64(), "text": pa.large_string(),
               "lang": pa.string(), "source": pa.string()}
        for col, typ in pad.items():
            if col not in b.column_names:
                b = b.append_column(col, pa.nulls(n, typ))
        full = (documents_to_pages_batch(b) if "html" in columns
                else _pages_cheap_batch(b))
        return full.select(columns)

    return ds.map_batches(bridge, batch_format="pyarrow")


def _pages_cheap_batch(batch: pa.Table) -> pa.Table:
    """url/warc_ts/text/lang arms of the bridge WITHOUT the html wrap —
    byte-identical to the corresponding ``documents_to_pages_batch``
    columns (same kernels), minus the escape/join/concat work."""
    import numpy as np
    import pyarrow.compute as pc

    def one(a):
        return a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a

    doc_id = one(batch["doc_id"])
    sep = pa.scalar("", pa.string())
    host = pc.binary_join_element_wise(
        pc.cast(one(batch["source"]), pa.string()),
        pa.scalar(".docs.example.org", pa.string()), sep,
    )
    url = pc.binary_join_element_wise(
        pa.scalar("https://", pa.string()), host, pa.scalar("/", pa.string()),
        pc.cast(doc_id, pa.string()), sep,
    )
    ts = pa.array(
        _BASE_TS_US
        + doc_id.to_numpy(zero_copy_only=False).astype(np.int64) * 1_000_000,
        type=pa.timestamp("us"),
    )
    return pa.table({
        "url": url,
        "warc_ts": ts,
        "text": pc.cast(one(batch["text"]), pa.large_string()),
        "lang": pc.cast(one(batch["lang"]), pa.string()),
    })
