#!/usr/bin/env python
"""Print the flagship pipeline's per-operator ds.stats() breakdown.

    python scripts/profile_stats.py [n_pages] [num_cpus]

The feedback loop used while iterating on stage perf (SURVEY.md: wall time
should be dominated by useful compute).
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    ncpu = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    import ray.data as rd
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from data_quality_check_ray.config import PipelineConfig
    from data_quality_check_ray.pipelines.quality import build_pipeline
    from data_quality_check_ray.sources import synth

    base = "/dev/shm" if os.access("/dev/shm", os.W_OK) else "/tmp"
    pages = f"{base}/dqcr_profile_pages_{n}"
    synth.write_pages_parquet(pages, n, num_files=16)
    out = f"{base}/dqcr_profile_out"
    shutil.rmtree(out, ignore_errors=True)

    pool = max(1, int(ncpu * 0.5))
    t0 = time.time()
    ds = build_pipeline(
        rd.read_parquet(pages), PipelineConfig(model_concurrency=(pool, pool))
    )
    ds.write_parquet(out)
    wall = time.time() - t0
    print(f"== {n} docs, {ncpu} cpus: {wall:.2f}s = {n/wall:.0f} docs/s ==\n")
    print(ds.stats())
    ray.shutdown()


if __name__ == "__main__":
    main()
