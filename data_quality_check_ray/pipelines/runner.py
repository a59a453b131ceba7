"""Resumable partitioned run of the flagship pipeline.

Job lifecycle (SURVEY.md §3.5 / §4.1 checkpoint-resume design):

  1. plan: sorted input files -> deterministic partitions (id, fingerprint)
  2. skip: partitions already marked done in <out>/_manifest.jsonl
  3. per pending partition: read -> build_pipeline (streaming) ->
     write_parquet to <out>/.tmp-<id> -> atomic rename to <out>/part-<id>
  4. record: manifest line + lineage/metrics parquet row

Each partition is itself a streaming Ray Data job over the whole cluster;
partition granularity (files_per_partition) trades resume cost against
scheduling overhead.  A killed run resumes by re-running only missing
partitions; outputs are proven equal to a single fresh run in
tests/test_resume.py.
"""

from __future__ import annotations

import glob
import os
import shutil
import time
from dataclasses import dataclass, field

from ..config import PipelineConfig
from ..state.manifest import (
    Manifest,
    Partition,
    plan_partitions,
    plan_partitions_hashed,
)
from ..state.metrics import append_lineage_row, partition_metrics
from .quality import build_pipeline


@dataclass
class RunConfig:
    input_dir: str
    output_dir: str
    pipeline: PipelineConfig = field(default_factory=PipelineConfig)
    files_per_partition: int = 4
    max_partitions: int | None = None  # for tests: stop early (simulated kill)
    #: remove output dirs of partitions no longer in the current plan
    #: (input shrank or regrouped); off by default — never delete user
    #: data implicitly
    clean_stale: bool = False
    #: >0 => append-stable hashed grouping with this many groups (an input
    #: dir that GROWS between runs only reprocesses groups that gained
    #: files); 0 => contiguous grouping by files_per_partition
    hash_groups: int = 0


def _run_partition(p: Partition, cfg: RunConfig) -> dict:
    import pyarrow.parquet as pq
    import ray.data as rd

    t0 = time.time()
    if cfg.pipeline.stage_metrics:
        from ..state.stage_metrics import snapshot_and_reset

        # discard observations left by a failed/killed previous attempt so
        # they cannot contaminate this partition's histograms
        snapshot_and_reset()
    rows_in = sum(pq.read_metadata(f).num_rows for f in p.files)
    ds = build_pipeline(rd.read_parquet(list(p.files)), cfg.pipeline)
    tmp = os.path.join(cfg.output_dir, f".tmp-{p.partition_id}")
    final = os.path.join(cfg.output_dir, f"part-{p.partition_id}")
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp)  # write_parquet creates no dir for a 0-row dataset;
    # pre-creating keeps the atomic rename valid for empty partitions
    ds.write_parquet(tmp)
    if os.path.exists(final):
        shutil.rmtree(final)
    os.replace(tmp, final)
    m = partition_metrics(final, p.partition_id, rows_in, time.time() - t0)
    if cfg.pipeline.stage_metrics:
        from ..state.stage_metrics import snapshot_and_reset

        # flushes are synchronous per batch, so everything this partition
        # observed is in the collector by the time write_parquet returns
        m["stage_walls"] = snapshot_and_reset()
    return m


def run(cfg: RunConfig) -> dict:
    """Execute (or resume) the job; returns summary counters."""
    files = sorted(glob.glob(os.path.join(cfg.input_dir, "*.parquet")))
    if not files:
        raise FileNotFoundError(f"no parquet files under {cfg.input_dir}")
    os.makedirs(cfg.output_dir, exist_ok=True)
    parts = (
        plan_partitions_hashed(files, cfg.hash_groups)
        if cfg.hash_groups
        else plan_partitions(files, cfg.files_per_partition)
    )
    manifest = Manifest.load(cfg.output_dir)

    done = skipped = 0
    for p in parts:
        if manifest.is_done(p):
            skipped += 1
            continue
        if cfg.max_partitions is not None and done >= cfg.max_partitions:
            break
        metrics = _run_partition(p, cfg)
        manifest.mark_done(p, metrics)
        append_lineage_row(
            cfg.output_dir,
            {"partition_id": p.partition_id, "fingerprint": p.fingerprint, **metrics},
        )
        done += 1

    # surface (and optionally remove) output dirs from a previous plan that
    # the current input no longer produces — otherwise a shrunk/regrouped
    # input leaves stale part-* dirs mixed into the output
    planned_ids = {p.partition_id for p in parts}
    stale = sorted(
        os.path.basename(d)[5:]
        for d in glob.glob(os.path.join(cfg.output_dir, "part-*"))
        if os.path.basename(d)[5:] not in planned_ids
    )
    if cfg.clean_stale and stale:
        # remove the manifest entry BEFORE deleting data: 'not done' for an
        # existing dir is safe to reprocess, but a surviving 'done' entry
        # for a deleted dir would let a later replan skip missing output
        for pid in stale:
            manifest.remove([pid])
            shutil.rmtree(os.path.join(cfg.output_dir, f"part-{pid}"), ignore_errors=True)
            lineage = os.path.join(cfg.output_dir, "_lineage", f"part-{pid}.parquet")
            if os.path.exists(lineage):
                os.remove(lineage)

    return {
        "partitions_total": len(parts),
        "partitions_done_now": done,
        "partitions_skipped": skipped,
        "stale_partitions": stale,
        "stale_removed": bool(cfg.clean_stale and stale),
        "complete": skipped + done == len(parts),
    }


def write_partitioned_resumable(ds, out_dir: str, partition_col: str,
                                max_partitions: int | None = None) -> dict:
    """Resumable sink for shuffle-bearing operator outputs
    (pack_sequences, shuffle_shards, dedup verdicts): one parquet dir per
    distinct ``partition_col`` value (``part-<v>``), written atomically
    (tmp dir + rename) and SKIPPED when already present.

    Resume contract: the upstream op must be a deterministic function of
    its input — both packing (doc_id-ordered prefix sum) and the train
    shuffle (keyed placement) are — so a killed run rerun with the same
    arguments recomputes the op once and writes only the missing
    partitions; finished partitions are never rewritten, and the resumed
    directory equals a single uninterrupted run's byte-for-byte
    (tests/test_resume.py).  The op output is materialized here ONCE
    (these outputs are digest-sized, a few int64s per doc — never the
    text) so per-partition filters do not re-execute the pipeline.

    Returns counters shaped like ``run``'s: {partitions_total,
    partitions_skipped, partitions_done_now, complete}.
    """
    import pyarrow.compute as pc

    os.makedirs(out_dir, exist_ok=True)
    out = ds.materialize()
    vals = sorted(out.unique(partition_col))
    done = skipped = 0
    for v in vals:
        final = os.path.join(out_dir, f"part-{v}")
        if os.path.exists(final):
            skipped += 1
            continue
        if max_partitions is not None and done >= max_partitions:
            break
        tmp = os.path.join(out_dir, f".tmp-{v}")
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp)
        out.map_batches(
            lambda b, _v=v: b.filter(pc.equal(b[partition_col], _v)),
            batch_format="pyarrow",
        ).write_parquet(tmp)
        os.replace(tmp, final)
        done += 1
    return {
        "partitions_total": len(vals),
        "partitions_skipped": skipped,
        "partitions_done_now": done,
        "complete": skipped + done == len(vals),
    }
