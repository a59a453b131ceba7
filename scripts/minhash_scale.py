#!/usr/bin/env python
"""Scale exercise for the distributed MinHash-LSH closure (VERDICT r2 #6).

Runs minhash_dedup over N synthetic pages with pair_limit=0 (forcing the
fully-distributed path: bucketed text-attach joins + exact-Jaccard verify
+ distributed connected components) and records wall time + throughput to
BENCH/minhash_scale.json.  At a small N it also runs the driver-side
union-find path and asserts cluster-for-cluster equality.

    python scripts/minhash_scale.py [N] [--check N_CHECK]
"""
from __future__ import annotations

import json
import os
import sys
import time

_args = sys.argv[1:]
N_CHECK = 0
if "--check" in _args:
    _i = _args.index("--check")
    N_CHECK = int(_args[_i + 1])
    del _args[_i:_i + 2]
N = int(_args[0]) if _args else 3_200_000

import ray

if not ray.is_initialized():
    ray.init(address="local",
             num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
             include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext

DataContext.get_current().enable_progress_bars = False

import numpy as np
import pandas as pd
import pyarrow as pa

sys.path.insert(0, "/root/repo")
from bench import ensure_pages  # deterministic cached corpus (tmpfs)
from data_quality_check_ray.stages.dedup import minhash_dedup


def docs_ds(pages_dir: str):
    import ray.data as rd
    import pyarrow.compute as pc

    ds = rd.read_parquet(pages_dir, columns=["url", "text"])

    def to_docs(b: pa.Table) -> pa.Table:
        urls = b["url"].to_numpy(zero_copy_only=False)
        ids = pd.util.hash_array(np.asarray(urls, dtype=object))
        ids = (ids >> np.uint64(1)).astype(np.int64)  # unique w.h.p.
        return pa.table({"doc_id": ids, "text": b["text"]})

    return ds.map_batches(to_docs, batch_format="pyarrow")


out: dict = {"n_docs": N, "num_cpus": int(ray.cluster_resources()["CPU"])}

if N_CHECK:
    d = ensure_pages(N_CHECK)
    ds = docs_ds(d)
    a = minhash_dedup(ds, pair_limit=0).to_pandas().sort_values("doc_id")
    b = minhash_dedup(ds, pair_limit=10**18).to_pandas().sort_values("doc_id")
    same = (a["rep_id"].values == b["rep_id"].values).all() and \
           (a["is_dup"].values == b["is_dup"].values).all()
    out["check_n"] = N_CHECK
    out["check_equal"] = bool(same)
    out["check_n_dups"] = int(a["is_dup"].sum())
    print("equality check:", same, "dups:", out["check_n_dups"], flush=True)
    if not same:
        sys.exit(1)

d = ensure_pages(N)
ds = docs_ds(d)
t0 = time.time()
res = minhash_dedup(ds, pair_limit=0).materialize()
wall = time.time() - t0
n_dups = int(
    res.map_batches(
        lambda b: pa.table(
            {"d": pa.array([int(
                b["is_dup"].to_numpy(zero_copy_only=False).sum())])}
        ),
        batch_format="pyarrow",
    ).sum("d")
)
out.update({
    "wall_sec": round(wall, 2),
    "docs_per_sec": round(N / wall, 1),
    "n_rows": res.count(),
    "n_dups": n_dups,
})
print(json.dumps(out), flush=True)
with open("/root/repo/BENCH/minhash_scale.json", "w") as f:
    json.dump(out, f, indent=1)
ray.shutdown()
