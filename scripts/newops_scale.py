"""Scale evidence for the round-3 part-3 operators.

Runs dup_span_stats / DSIR (fused counts + scoring) / host_cap (fast
mode) / flag_blocked_urls over the cached 1.6M-page bench corpus and
records wall time + docs/s to BENCH/newops_scale.json.  Same corpus
convention as scripts/trainops_scale.py (bench.ensure_pages; doc ids =
63-bit url hash).

    python scripts/newops_scale.py [--docs N] [--cpus N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_600_000)
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    ap.add_argument("--only", default=None,
                    help="comma-separated op names; merge into existing json")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.cpus,
                 include_dashboard=False, logging_level="ERROR")
    import ray.data as rd
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import bench
    from scripts.trainops_scale import pages_with_ids
    from data_quality_check_ray.pipelines.reports import (
        flag_blocked_urls, host_cap)
    from data_quality_check_ray.stages.decontam import dup_span_stats
    from data_quality_check_ray.stages.dsir import (
        dsir_center, dsir_lambda, dsir_weights, hashed_feature_counts_split)

    pages_dir = bench.ensure_pages(args.docs)
    rd.read_parquet(pages_dir).count()  # warm page cache (untimed)
    results: dict = {"n_docs": args.docs, "num_cpus": args.cpus, "ops": {}}

    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH", "newops_scale.json")

    only = set(args.only.split(",")) if args.only else None
    if only and os.path.exists(out_path):
        with open(out_path) as f:
            prior = json.load(f)
        results["ops"].update(prior.get("ops", {}))

    def timed(name, fn):
        if only is not None and name not in only:
            return
        t0 = time.time()
        extra = fn()
        w = time.time() - t0
        results["ops"][name] = {"sec": round(w, 2),
                                "per_sec": round(args.docs / w, 1), **extra}
        print(name, results["ops"][name], flush=True)
        # checkpoint after every op: a killed run keeps its finished rows
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)

    def run_dup_spans():
        # k=13: the synthetic corpus draws from a bounded vocabulary, so
        # short shingles are shared almost everywhere; 13-gram spans keep
        # the shared set broadcast-sized the way natural near-dup text does
        out = dup_span_stats(pages_with_ids(pages_dir), k=13,
                             broadcast_limit=2 << 30)
        n = out.count()
        return {"rows": int(n), "k": 13}

    timed("dup_span_stats_k13", run_dup_spans)

    def run_dup_spans_join():
        # FORCED membership-join regime (broadcast_limit=0): the
        # heavily-duplicated-corpus scale path added in round 4 — shared
        # digests stay distributed, per-doc counts via the digest-bucketed
        # hash join instead of a driver-held array
        out = dup_span_stats(pages_with_ids(pages_dir), k=13,
                             broadcast_limit=0)
        n = out.count()
        return {"rows": int(n), "k": 13, "regime": "membership-join"}

    timed("dup_span_join_k13", run_dup_spans_join)

    def run_dsir():
        docs = pages_with_ids(pages_dir)

        def is_target(b: pa.Table):
            return b["doc_id"].to_numpy(zero_copy_only=False) % 997 == 0

        tgt, raw = hashed_feature_counts_split(docs, is_target)
        lam = dsir_lambda(tgt, raw)
        n = dsir_weights(docs, lam, center=dsir_center(raw, lam)).count()
        return {"rows": int(n)}

    timed("dsir_select", run_dsir)

    timed("host_cap_fast",
          lambda: {"rows": int(host_cap(
              rd.read_parquet(pages_dir, columns=["url"]),
              cap=10_000, mode="fast").count())})

    def run_blocklist():
        # synthetic UT1-sized blocklist: 1M hosts, a handful real
        bl = [f"blocked{i}.example.net" for i in range(1_000_000)]
        bl += ["src3.docs.example.org", "src7.docs.example.org"]
        out = flag_blocked_urls(
            rd.read_parquet(pages_dir, columns=["url"]), bl,
            url_regex=r"/4[0-9]7$")
        n = out.count()
        return {"rows": int(n), "blocklist_hosts": len(bl)}

    timed("url_blocklist_1m_hosts", run_blocklist)

    print("wrote", out_path)
    ray.shutdown()


if __name__ == "__main__":
    main()
