#!/usr/bin/env python
"""Measure PipelineConfig.dict_boundary (dictionary-encoded text across
the pre->model object-store boundary) — the one untried DRAM-traffic
lever from the round-1/2 scaling investigation (VERDICT r2, perf #8).

Hypothesis to test: shrinking bytes shipped between the two physical
operators raises the 8v32 scaling ratio (the contention probe showed the
kernel itself is memory-bus-bound; the boundary is the other large DRAM
stream).  Web text is near-unique per row, so dictionary encoding is
expected to ADD bytes (dictionary ~= all values, plus indices) — this
probe records the measured answer either way.

Each cell runs the flagship read->pre->model->write job in a FRESH
process (fresh ray.init) on the same cached tmpfs corpus:

    {stock, dict} x {num_cpus 8, 32}

Output: BENCH/dict_boundary.json + a human line per cell.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

N_PAGES = int(os.environ.get("PROBE_PAGES", "400000"))
REPEATS = int(os.environ.get("PROBE_REPEATS", "2"))

CELL = r"""
import json, os, sys, time
import ray
ray.init(address="local", num_cpus=int(sys.argv[1]),
         include_dashboard=False, logging_level="ERROR")
import ray.data as rd
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
from data_quality_check_ray.config import PipelineConfig
from data_quality_check_ray.pipelines.quality import build_pipeline

cfg = PipelineConfig(dict_boundary=(sys.argv[2] == "dict"),
                     model_concurrency=(1, max(4, int(sys.argv[1]) - 2)))
src = sys.argv[3]
out = sys.argv[4]
t0 = time.perf_counter()
ds = build_pipeline(rd.read_parquet(src), cfg)
import shutil
shutil.rmtree(out, ignore_errors=True)
ds.write_parquet(out)
dt = time.perf_counter() - t0
print("CELL_RESULT " + json.dumps({"sec": dt}))
ray.shutdown()
"""


def ensure_pages(n: int) -> str:
    from data_quality_check_ray.sources import synth

    base = "/dev/shm" if os.access("/dev/shm", os.W_OK) else "/tmp"
    d = f"{base}/dqcr_bench_pages_{n}"
    synth.write_pages_parquet(d, n, num_files=32)
    return d


def run_cell(cpus: int, mode: str, src: str) -> float:
    best = None
    for _ in range(REPEATS):
        p = subprocess.run(
            [sys.executable, "-c", CELL, str(cpus), mode, src,
             f"/tmp/dict_probe_out_{cpus}_{mode}"],
            capture_output=True, text=True, timeout=1200, cwd=_REPO,
        )
        line = [l for l in p.stdout.splitlines() if l.startswith("CELL_RESULT")]
        if not line:
            sys.stderr.write(p.stderr[-2000:])
            raise RuntimeError(f"cell failed: cpus={cpus} mode={mode}")
        sec = json.loads(line[-1].split(None, 1)[1])["sec"]
        best = sec if best is None else min(best, sec)
        print(f"  cpus={cpus:2d} mode={mode:5s} {sec:7.2f} s", flush=True)
    return best


def main() -> None:
    src = ensure_pages(N_PAGES)
    res = {"n_pages": N_PAGES, "repeats": REPEATS, "cells": {}}
    for mode in ("stock", "dict"):
        for cpus in (8, 32):
            res["cells"][f"{mode}_{cpus}"] = run_cell(cpus, mode, src)
    for mode in ("stock", "dict"):
        a, b = res["cells"][f"{mode}_8"], res["cells"][f"{mode}_32"]
        res[f"{mode}_8v32_eff"] = round((a / b) / 4.0, 3)
        res[f"{mode}_docs_per_sec_32"] = round(N_PAGES / b, 1)
    res["dict_vs_stock_32"] = round(
        res["cells"]["dict_32"] / res["cells"]["stock_32"], 3)
    os.makedirs(os.path.join(_REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(_REPO, "BENCH", "dict_boundary.json"), "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
