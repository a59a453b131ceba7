#!/usr/bin/env python
"""Microbench: minhash signature kernel throughput vs permutation chunk
size (the memory/throughput tradeoff introduced by the 3.2M OOM fix).

Single process, no Ray — run on an idle box.
    python scripts/minhash_kernel_bench.py [n_docs]
"""
from __future__ import annotations

import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")

N = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000


def main():
    import glob

    files = sorted(glob.glob("/dev/shm/dqcr_bench_pages_200000/*.parquet"))
    if not files:
        from data_quality_check_ray.sources import synth

        synth.write_pages_parquet("/dev/shm/dqcr_bench_pages_200000",
                                  200000, num_files=32)
        files = sorted(
            glob.glob("/dev/shm/dqcr_bench_pages_200000/*.parquet"))
    t = pa.concat_tables(pq.read_table(f, columns=["text"]) for f in files)
    texts = t["text"].combine_chunks().slice(0, N)

    import data_quality_check_ray.stages.dedup as mod

    # NOTE: run() inlines the signature kernel (minhash_signatures) so the
    # permutation chunk size can vary; keep it in sync with stages/dedup
    for chunk in (8, 16, 32, 64):
        # patch the chunk constant by re-running with a wrapper
        def run():
            sh, off = mod.shingle_hashes(texts)
            n = len(off) - 1
            sig = np.full((n, mod.NUM_PERM), np.iinfo(np.uint64).max,
                          dtype=np.uint64)
            starts = off[:-1]
            nonempty = off[1:] > starts
            ne_starts = starts[nonempty].astype(np.int64)
            shm = mod._mod61(sh)[None, :]
            for p0 in range(0, mod.NUM_PERM, chunk):
                p1 = min(p0 + chunk, mod.NUM_PERM)
                hv = mod._mod61(
                    mod._mulmod61(mod._PERM_A[p0:p1, None], shm)
                    + mod._PERM_B[p0:p1, None])
                mins = np.minimum.reduceat(hv, ne_starts, axis=1)
                sig[nonempty, p0:p1] = mins.T
            return sig

        run()  # warm
        t0 = time.time()
        sig = run()
        dt = time.time() - t0
        print(f"chunk={chunk:3d}  {N/dt:9.0f} docs/s  "
              f"({dt:.2f}s, checksum {int(sig.sum() % 97)})")


if __name__ == "__main__":
    main()
