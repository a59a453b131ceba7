#!/usr/bin/env python
"""Measure approximate-ANN recall vs brute force on the embeddings table.

    python scripts/ann_recall.py [sf_dir]

Writes BENCH/ann_recall.json: recall@10 of the LSH (sign-bucket) and IVF
(nprobe) variants against the exact brute-force top-10, plus timings.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
K = 10
N_QUERIES = 20


def main() -> None:
    import numpy as np
    import pyarrow.parquet as pq
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    import ray.data as rd
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from data_quality_check_ray.stages.ann import (
        _as_matrix,
        brute_force_topk,
        ivf_topk,
        lsh_topk,
        train_ivf_centroids,
    )

    t = pq.read_table(f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding"])
    m = _as_matrix(t["embedding"], np.float64)
    qids = np.arange(N_QUERIES, dtype=np.int64)
    queries = m[:N_QUERIES]

    def topk_sets(res):
        pdf = res.to_pandas()
        return {
            int(q): set(pdf[pdf["query_id"] == q]["vec_id"])
            for q in qids
        }

    ds = rd.read_parquet(f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding"])
    t0 = time.time(); bf = topk_sets(brute_force_topk(ds, queries, qids, k=K, dtype=np.float64)); t_bf = time.time() - t0
    t0 = time.time(); lsh = topk_sets(lsh_topk(ds, queries.astype(np.float32), qids, k=K, bits=6)); t_lsh = time.time() - t0
    lsh3 = topk_sets(lsh_topk(ds, queries.astype(np.float32), qids, k=K, bits=3))
    cents = train_ivf_centroids(m.astype(np.float32), n_cells=16, iters=8)
    t0 = time.time(); ivf = topk_sets(ivf_topk(ds, queries.astype(np.float32), qids, cents, k=K, nprobe=6)); t_ivf = time.time() - t0
    ivf12 = topk_sets(ivf_topk(ds, queries.astype(np.float32), qids, cents, k=K, nprobe=12))

    def recall(approx):
        hits = sum(len(approx.get(q, set()) & bf[q]) for q in bf)
        total = sum(len(bf[q]) for q in bf)
        return round(hits / total, 3)

    out = {
        "sf_dir": SF_DIR, "k": K, "n_queries": N_QUERIES,
        "recall_lsh_bits6": recall(lsh), "recall_lsh_bits3": recall(lsh3),
        "recall_ivf_nprobe6of16": recall(ivf), "recall_ivf_nprobe12of16": recall(ivf12),
        "sec_brute": round(t_bf, 2), "sec_lsh": round(t_lsh, 2), "sec_ivf": round(t_ivf, 2),
    }
    print(json.dumps(out))
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "BENCH", "ann_recall.json"), "w") as f:
        json.dump(out, f)
    ray.shutdown()


if __name__ == "__main__":
    main()
