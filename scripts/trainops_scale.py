"""Scale evidence for the round-3 training-data operators.

Runs pack_sequences / shuffle_shards / decontaminate over the cached
3.2M-page bench corpus (11 GB text) and kmeans+semdedup over 1M
synthetic 64-d embeddings, recording wall time and docs/s per operator
to BENCH/trainops_scale.json.  The corpus is the same deterministic
synthetic table bench.py uses (bench.ensure_pages); doc ids are the
63-bit url hash (unique at this scale).

    python scripts/trainops_scale.py [--docs N] [--vecs N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def pages_with_ids(pages_dir: str):
    import ray.data as rd

    ds = rd.read_parquet(pages_dir, columns=["url", "text"])

    def add_id(b: pa.Table) -> pa.Table:
        urls = np.asarray(
            b["url"].combine_chunks().to_numpy(zero_copy_only=False),
            dtype=object)
        ids = (pd.util.hash_array(urls) >> np.uint64(1)).astype(np.int64)
        return pa.table({"doc_id": pa.array(ids), "text": b["text"]})

    return ds.map_batches(add_id, batch_format="pyarrow")


def ensure_embeddings(n: int, d: int = 64) -> str:
    base = "/dev/shm" if os.access("/dev/shm", os.W_OK) else "/tmp"
    out = f"{base}/dqcr_bench_vecs_{n}_{d}"
    marker = f"{out}/_DONE"
    if os.path.exists(marker):
        return out
    os.makedirs(out, exist_ok=True)
    per = 65_536
    for i, lo in enumerate(range(0, n, per)):
        m = min(per, n - lo)
        rng = np.random.RandomState(1000 + i)
        mat = rng.randn(m, d).astype(np.float32)
        t = pa.table({
            "vec_id": pa.array(np.arange(lo, lo + m, dtype=np.int64)),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(mat.ravel()), d).cast(pa.list_(pa.float32())),
        })
        import pyarrow.parquet as pq

        pq.write_table(t, f"{out}/part-{i:05d}.parquet")
    open(marker, "w").write("ok")
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=3_200_000)
    ap.add_argument("--vecs", type=int, default=1_000_000)
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.cpus,
                 include_dashboard=False, logging_level="ERROR")
    import ray.data as rd
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import bench
    from data_quality_check_ray.stages.cluster import kmeans_fit, semdedup
    from data_quality_check_ray.stages.decontam import (eval_ngram_set,
                                                        flag_contaminated)
    from data_quality_check_ray.stages.packing import pack_sequences
    from data_quality_check_ray.stages.shuffle import shuffle_shards

    pages_dir = bench.ensure_pages(args.docs)
    rd.read_parquet(pages_dir).count()  # warm page cache (untimed)
    results: dict = {"n_docs": args.docs, "n_vecs": args.vecs,
                     "num_cpus": args.cpus, "ops": {}}

    def timed(name, fn, n):
        t0 = time.time()
        rows = fn()
        w = time.time() - t0
        results["ops"][name] = {"sec": round(w, 2), "rows": int(rows),
                                "per_sec": round(n / w, 1)}
        print(name, results["ops"][name], flush=True)

    timed("pack_sequences",
          lambda: pack_sequences(pages_with_ids(pages_dir),
                                 seq_len=2048).count(),
          args.docs)
    timed("shuffle_shards_fast",
          lambda: shuffle_shards(pages_with_ids(pages_dir),
                                 num_shards=256).count(),
          args.docs)

    def run_decontam():
        docs = pages_with_ids(pages_dir)

        def eval_split(b: pa.Table) -> pa.Table:  # ~0.1% plays the eval set
            ids = b["doc_id"].to_numpy(zero_copy_only=False)
            return b.filter(pa.array(ids % 997 == 0))

        ev = docs.map_batches(eval_split, batch_format="pyarrow")
        evset = eval_ngram_set(ev, "text", k=8)
        return flag_contaminated(docs, evset, k=8).count()

    timed("decontaminate", run_decontam, args.docs)

    vec_dir = ensure_embeddings(args.vecs)
    vecs = rd.read_parquet(vec_dir)

    def run_kmeans():
        c = kmeans_fit(vecs, k=64, iters=3)
        return len(c)

    timed("kmeans_fit_k64_i3", run_kmeans, args.vecs * 3)

    timed("semdedup_k64",
          lambda: semdedup(vecs, k=64, iters=2, tau=0.9,
                           dtype=np.float32).count(),
          args.vecs)

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH", "trainops_scale.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", out)
    ray.shutdown()


if __name__ == "__main__":
    main()
