"""Skew / quality reports over labeled output (SURVEY.md §2.6, §4.2).

Host-level operations key on ``host = netloc(url)``; Common-Crawl host
skew (a few giant hosts own a large share of pages) is neutralized with
an IN-BLOCK combiner: each map_batches task pre-aggregates its block to
one (host, count) row per distinct host — so the single ``groupby(host)``
exchange ships at most #blocks rows per host no matter how hot the host
is, and the hottest reducer folds #blocks integers, not #pages rows.
(This replaces the earlier salted two-phase groupby, which paid a SECOND
full distributed shuffle for the same fan-in bound — the salt pattern
remains where pre-aggregation can't apply, i.e. joins: stages/joins.py
hot-key salting.)  The pages synth generator is Zipf-skewed specifically
to exercise this path.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_HOST_RE = r"https?://(?P<h>[^/]+)/"


def host_counts(pages_ds, top_k: int | None = None):
    """Pages/labeled Dataset -> per-host page counts (+ kept counts when a
    ``keep`` column exists): in-block Arrow partials, ONE groupby(host)."""
    from ray.data.aggregate import Sum

    with_keep = "keep" in pages_ds.schema().names

    def partial(batch: pa.Table) -> pa.Table:
        h = pc.struct_field(pc.extract_regex(batch["url"], _HOST_RE), "h")
        t = pa.table({"host": h})
        aggs = [([], "count_all")]
        if with_keep:
            t = t.append_column("kept", pc.cast(batch["keep"], pa.int64()))
            aggs.append(("kept", "sum"))
        g = t.group_by("host").aggregate(aggs)
        out = {"host": g["host"], "c": g["count_all"]}
        if with_keep:
            out["k"] = g["kept_sum"]
        return pa.table(out)

    partials = pages_ds.map_batches(partial, batch_format="pyarrow")
    if with_keep:
        final = partials.groupby("host").aggregate(
            Sum("c", alias_name="n_pages"), Sum("k", alias_name="n_kept")
        )
    else:
        final = partials.groupby("host").aggregate(
            Sum("c", alias_name="n_pages"))
    if top_k:
        from ..stages.topk import global_topk

        return global_topk(
            final, [("n_pages", "descending"), ("host", "ascending")], top_k)
    return final.sort(["n_pages", "host"], descending=[True, False])


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
