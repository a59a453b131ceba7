"""Skew / quality reports over labeled output (SURVEY.md §2.6, §4.2).

Host-level operations key on ``host = netloc(url)``; Common-Crawl host
skew (a few giant hosts own a large share of pages) is handled with the
classic salted two-phase aggregate: partial counts per (host, salt) —
bounded fan-in per reducer even for a hot host — then a final merge per
host.  The pages synth generator is Zipf-skewed specifically to exercise
this path.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_HOST_RE = r"https?://(?P<h>[^/]+)/"
NUM_SALTS = 8


def _hostify(batch: pa.Table) -> pa.Table:
    h = pc.struct_field(pc.extract_regex(batch["url"], _HOST_RE), "h")
    salt = pc.cast(
        pc.bit_wise_and(pc.cast(pc.binary_length(batch["url"]), pa.int64()), NUM_SALTS - 1),
        pa.int64(),
    )
    out = pa.table({"host": h, "salt": salt})
    if "keep" in batch.column_names:
        out = out.append_column("kept", pc.cast(batch["keep"], pa.int64()))
    return out


def host_counts(pages_ds, top_k: int | None = None):
    """Pages/labeled Dataset -> per-host page counts (+ kept counts when a
    ``keep`` column exists), via salted partial+final groupby."""
    from ray.data.aggregate import Count, Sum

    partial_aggs = [Count(alias_name="c")]
    with_keep = "keep" in pages_ds.schema().names
    salted = pages_ds.map_batches(_hostify, batch_format="pyarrow")
    if with_keep:
        partial = salted.groupby(["host", "salt"]).aggregate(
            Count(alias_name="c"), Sum("kept", alias_name="k")
        )
        final = partial.groupby("host").aggregate(
            Sum("c", alias_name="n_pages"), Sum("k", alias_name="n_kept")
        )
    else:
        partial = salted.groupby(["host", "salt"]).aggregate(*partial_aggs)
        final = partial.groupby("host").aggregate(Sum("c", alias_name="n_pages"))
    final = final.sort(["n_pages", "host"], descending=[True, False])
    return final.limit(top_k) if top_k else final


def drop_reason_report(labeled_ds):
    """Labeled Dataset -> counts per drop_reason (the engine's analog of
    the reference's dimensioned request counter, metrics.rs:17-21)."""
    from ray.data.aggregate import Count

    return (
        labeled_ds.select_columns(["drop_reason"])
        .groupby("drop_reason")
        .aggregate(Count(alias_name="n"))
        .sort("n", descending=True)
    )
