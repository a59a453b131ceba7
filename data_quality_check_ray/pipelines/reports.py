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
    ``keep`` column exists): in-block Arrow partials, then ONE bucketed
    hash aggregate over the partial rows (stages/groupagg)."""
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

    from ..stages.groupagg import grouped_agg_bucketed
    from ..stages.joins import cheap_size_bytes

    partials = pages_ds.map_batches(partial, batch_format="pyarrow")
    tb = cheap_size_bytes(pages_ds)
    aggs2 = [("c", "sum")] + ([("k", "sum")] if with_keep else [])
    names = ["host", "n_pages"] + (["n_kept"] if with_keep else [])
    final = grouped_agg_bucketed(
        partials, keys="host", aggs=aggs2,
        # partials are one row per (block, distinct host) — far below the
        # page bytes; /32 keeps reduce tasks bounded yet parallel
        input_bytes=tb // 32 if tb else None,
    ).map_batches(lambda t: t.rename_columns(names),
                  batch_format="pyarrow")
    if top_k:
        from ..stages.topk import global_topk

        return global_topk(
            final, [("n_pages", "descending"), ("host", "ascending")], top_k)
    return final.sort(["n_pages", "host"], descending=[True, False])


def flag_blocked_urls(pages_ds, blocked_hosts, url_regex: str | None = None,
                      url_col: str = "url"):
    """UT1/C4-style URL filtering -> Dataset(url, host, blocked).

    ``blocked_hosts`` is the curated domain blocklist (UT1 ships ~4M
    hosts); it is sorted once and shipped via ``ray.put`` — a value-set
    baked into the task closure would re-serialize with EVERY task.
    Membership = vectorized searchsorted over the sorted host array;
    ``url_regex`` adds an RE2 pattern rule (adult/tracker path shapes),
    compiled by Arrow per batch.  One streaming map, no shuffle."""
    import ray

    hosts = np.sort(np.asarray(list(blocked_hosts), dtype=object))
    ref = ray.put(hosts)

    def flag(batch: pa.Table) -> pa.Table:
        bl = ray.get(ref)
        url = batch[url_col].combine_chunks() if isinstance(
            batch[url_col], pa.ChunkedArray) else batch[url_col]
        # null / malformed urls: compute on a ''-filled copy (None is not
        # comparable inside searchsorted) — they extract no host and
        # match no pattern, so they come out blocked=False
        filled = pc.fill_null(pc.cast(url, pa.string()), "")
        h = pc.fill_null(
            pc.struct_field(pc.extract_regex(filled, _HOST_RE), "h"), "")
        hv = h.to_numpy(zero_copy_only=False).astype(object)
        if len(bl):
            pos = np.searchsorted(bl, hv)
            pos[pos == len(bl)] = 0
            blocked = bl[pos] == hv
        else:
            blocked = np.zeros(len(hv), dtype=bool)
        if url_regex is not None:
            m = pc.match_substring_regex(filled, url_regex)
            blocked = blocked | m.to_numpy(zero_copy_only=False)
        return pa.table({
            "url": pc.cast(url, pa.string()),
            "host": h,
            "blocked": pa.array(blocked),
        })

    return pages_ds.map_batches(flag, batch_format="pyarrow")


def _cap_smallest_per_group(t: pa.Table, group_col: str, key_col: str,
                            tiebreak_col: str, cap: int) -> pa.Table:
    """Keep each group's ``cap`` smallest (key, tiebreak) rows — the
    ascending twin of queries._topk_per_group (one lexsort + run-position
    mask, no per-group Python)."""
    g = t[group_col].to_numpy(zero_copy_only=False)
    k = t[key_col].to_numpy(zero_copy_only=False)
    i = t[tiebreak_col].to_numpy(zero_copy_only=False)
    _, ginv = np.unique(g, return_inverse=True)
    order = np.lexsort((i, k, ginv))
    gi = ginv[order]
    starts = np.concatenate([[0], np.flatnonzero(gi[1:] != gi[:-1]) + 1])
    pos = np.arange(len(gi)) - np.repeat(
        starts, np.diff(np.concatenate([starts, [len(gi)]])))
    kept = order[pos < cap]
    return t.take(pa.array(kept)).append_column(
        "host_rank", pa.array(pos[pos < cap].astype(np.int64)))


def host_cap(pages_ds, cap: int = 20, seed: int = 17, mode: str = "fast"):
    """Per-host document quota (the Common-Crawl curation practice of
    capping giant hosts so no single site dominates the training mix) ->
    Dataset(host, url, host_rank): the <= ``cap`` pages kept per host,
    ranked by a seeded deterministic hash of the url.

    Distributed shape = the grouped-top-k decomposition, ascending: each
    block keeps its cap-smallest (key, url) rows per host (a global
    cap-smallest set is contained in the union of block-wise ones), one
    bounded combine (<= hosts x blocks x cap candidate rows) assigns the
    global rank.  No text moves and there is NO wide shuffle — the skew
    a giant host would inject into a groupby(host) never materializes
    because every block pre-truncates it to ``cap`` rows.

    ``mode="md5"`` ranks by DuckDB-compatible ``md5(url || ':' || seed)``
    (per-row hashlib — oracle parity only); ``mode="fast"`` is the
    vectorized 63-bit hash for production."""
    from .queries import _partial_combine

    def keyed(batch: pa.Table) -> pa.Table:
        url = batch["url"].combine_chunks() if isinstance(
            batch["url"], pa.ChunkedArray) else batch["url"]
        h = pc.struct_field(pc.extract_regex(url, _HOST_RE), "h")
        if mode == "md5":
            from ..stages.dedup import md5_hex

            salted = pc.binary_join_element_wise(
                pc.cast(url, pa.large_string()),
                pa.scalar(f":{seed}", pa.large_string()),
                pa.scalar("", pa.large_string()),
            )
            key = pa.array(md5_hex(salted), type=pa.string())
        else:
            import pandas as pd

            # the seed must enter the HASH, not be added after (a
            # post-hash offset shifts every key uniformly and never
            # changes the per-host ordering)
            hv = pd.util.hash_array(
                url.to_numpy(zero_copy_only=False).astype(object),
                hash_key=f"{seed & ((1 << 64) - 1):016x}",
            )
            key = pa.array((hv >> np.uint64(1)).astype(np.int64))
        return pa.table({"host": h, "url": pc.cast(url, pa.string()),
                         "key": key})

    def partial(b: pa.Table) -> pa.Table:
        return _cap_smallest_per_group(keyed(b), "host", "key", "url", cap)

    def combine(b: pa.Table) -> pa.Table:
        out = _cap_smallest_per_group(
            b.drop_columns(["host_rank"]), "host", "key", "url", cap)
        return out.select(["host", "url", "host_rank"])

    return _partial_combine(pages_ds, partial, combine)


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
