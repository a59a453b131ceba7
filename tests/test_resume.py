"""Checkpoint/resume: kill after k partitions, rerun, outputs == single run."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest

from data_quality_check_ray.pipelines.runner import RunConfig, run
from data_quality_check_ray.sources import synth
from data_quality_check_ray.state.metrics import read_lineage

N = 800


@pytest.fixture(scope="module")
def pages_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("resume_pages")
    synth.write_pages_parquet(str(d), N, num_files=8)
    return str(d)


def _labels(out_dir):
    files = sorted(glob.glob(os.path.join(out_dir, "part-*", "*.parquet")))
    import pyarrow as pa

    t = pa.concat_tables(
        pq.read_table(f, columns=["url", "keep", "drop_reason"]) for f in files
    )
    return t.to_pandas().set_index("url").sort_index()


def test_interrupted_run_resumes_to_identical_output(
    pages_dir, tmp_path_factory, quiet_data_context
):
    single = tmp_path_factory.mktemp("single")
    resumed = tmp_path_factory.mktemp("resumed")

    s = run(RunConfig(pages_dir, str(single), files_per_partition=2))
    assert s["complete"] and s["partitions_total"] == 4

    # simulated kill: only 2 of 4 partitions finish
    r1 = run(RunConfig(pages_dir, str(resumed), files_per_partition=2, max_partitions=2))
    assert not r1["complete"] and r1["partitions_done_now"] == 2

    # resume: skips the 2 finished partitions, completes the rest
    r2 = run(RunConfig(pages_dir, str(resumed), files_per_partition=2))
    assert r2["complete"]
    assert r2["partitions_skipped"] == 2 and r2["partitions_done_now"] == 2

    a, b = _labels(str(single)), _labels(str(resumed))
    assert len(a) == N
    assert (a["keep"] == b["keep"]).all()
    assert (a["drop_reason"] == b["drop_reason"]).all()

    # fully-done rerun is a no-op
    r3 = run(RunConfig(pages_dir, str(resumed), files_per_partition=2))
    assert r3["partitions_skipped"] == 4 and r3["partitions_done_now"] == 0


def test_lineage_rows_cover_all_partitions(pages_dir, tmp_path_factory, quiet_data_context):
    out = tmp_path_factory.mktemp("lineage")
    run(RunConfig(pages_dir, str(out), files_per_partition=4))
    lin = read_lineage(str(out)).to_pandas()
    assert len(lin) == 2
    assert lin["rows_in"].sum() == N == lin["rows_out"].sum()
    assert (lin["n_kept"] > 0).all()
    assert lin["drop_reasons"].str.contains("rule:").all()


def test_changed_input_invalidates_fingerprint(pages_dir, tmp_path_factory, quiet_data_context):
    out = tmp_path_factory.mktemp("fpr")
    run(RunConfig(pages_dir, str(out), files_per_partition=8))
    # same dir, different content size -> new fingerprint -> reprocessed
    import pathlib

    f = sorted(glob.glob(os.path.join(pages_dir, "*.parquet")))[0]
    data = pathlib.Path(f).read_bytes()
    try:
        pathlib.Path(f).write_bytes(data + b"\x00")
        r = run(RunConfig(pages_dir, str(out), files_per_partition=8, max_partitions=0))
        assert r["partitions_skipped"] == 0  # fingerprint mismatch -> pending
    finally:
        pathlib.Path(f).write_bytes(data)


def test_hashed_partitions_are_append_stable(pages_dir, tmp_path_factory, quiet_data_context):
    """Growing the input dir only reprocesses groups that gained files."""
    import shutil

    from data_quality_check_ray.state.manifest import plan_partitions_hashed

    grow = tmp_path_factory.mktemp("grow_pages")
    files = sorted(glob.glob(os.path.join(pages_dir, "*.parquet")))
    for f in files[:6]:
        shutil.copy(f, grow)
    before = {p.partition_id: p.fingerprint
              for p in plan_partitions_hashed(
                  sorted(glob.glob(str(grow) + "/*.parquet")), 4)}
    # run, then append two more files
    out = tmp_path_factory.mktemp("grow_out")
    r1 = run(RunConfig(str(grow), str(out), hash_groups=4))
    assert r1["complete"]
    for f in files[6:8]:
        shutil.copy(f, grow)
    after = {p.partition_id: p.fingerprint
             for p in plan_partitions_hashed(
                 sorted(glob.glob(str(grow) + "/*.parquet")), 4)}
    unchanged = [pid for pid in before if before[pid] == after.get(pid)]
    changed = [pid for pid in after if after[pid] != before.get(pid)]
    assert changed and unchanged  # appends touch only some groups
    r2 = run(RunConfig(str(grow), str(out), hash_groups=4))
    assert r2["complete"]
    assert r2["partitions_skipped"] == len(unchanged)
    assert r2["partitions_done_now"] == len(changed)
    # all 8 files' rows present exactly once
    labels = _labels(str(out))
    import pyarrow.parquet as pq2
    n_expected = sum(pq2.read_metadata(f).num_rows for f in files[:8])
    assert len(labels) == n_expected


def test_empty_input_file_partition_completes(tmp_path_factory, quiet_data_context):
    """Regression: write_parquet creates no dir for a 0-row dataset; the
    runner must still finalize (atomic rename) and mark the partition."""
    import pyarrow.parquet as pq2

    from data_quality_check_ray.sources import synth

    d = tmp_path_factory.mktemp("empty_in")
    synth.write_pages_parquet(str(d), 200, num_files=1)
    pq2.write_table(synth.generate_table(0), str(d / "part-zzz-empty.parquet"))
    out = tmp_path_factory.mktemp("empty_out")
    r = run(RunConfig(str(d), str(out), files_per_partition=1))
    assert r["complete"] and r["partitions_total"] == 2
    assert len(_labels(str(out))) == 200


def test_stage_metrics_histograms_in_lineage(
    pages_dir, tmp_path_factory, quiet_data_context
):
    """With stage_metrics on, every lineage row carries per-stage duration
    histograms (the reference's OTel histogram analog, metrics.rs:22-25)."""
    import json

    from data_quality_check_ray.config import PipelineConfig
    from data_quality_check_ray.state.stage_metrics import BUCKETS_MS

    out = tmp_path_factory.mktemp("stagemetrics")
    s = run(RunConfig(pages_dir, str(out), files_per_partition=4,
                      pipeline=PipelineConfig(stage_metrics=True)))
    assert s["complete"]
    lineage = read_lineage(str(out)).to_pandas()
    assert "stage_walls" in lineage.columns
    for raw in lineage["stage_walls"]:
        walls = json.loads(raw)
        for stage in ("pre_extract_conform", "tokenize", "heuristics",
                      "langid", "perplexity", "scrub_decide"):
            h = walls[stage]
            assert h["count"] >= 1
            assert h["sum_s"] > 0
            assert len(h["buckets"]) == len(BUCKETS_MS) + 1
            assert sum(h["buckets"]) == h["count"]


def test_stage_metrics_off_by_default(pages_dir, tmp_path_factory, quiet_data_context):
    import json

    out = tmp_path_factory.mktemp("nostagemetrics")
    run(RunConfig(pages_dir, str(out), files_per_partition=4))
    lineage = read_lineage(str(out)).to_pandas()
    assert all(json.loads(r) == {} for r in lineage["stage_walls"])


def _read_all(out_dir, sort_cols):
    import pandas as pd
    import pyarrow as pa

    files = sorted(glob.glob(os.path.join(out_dir, "part-*", "*.parquet")))
    t = pa.concat_tables(pq.read_table(f) for f in files)
    return (t.to_pandas().sort_values(sort_cols).reset_index(drop=True))


def test_pack_sequences_kill_resume_equals_single_run(
        tmp_path_factory, quiet_data_context):
    """pack_sequences claims resumability via determinism: kill after 2 of
    4 output partitions, rerun, combined output == a single run's."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    from data_quality_check_ray.pipelines.runner import (
        write_partitioned_resumable)
    from data_quality_check_ray.stages.packing import pack_sequences

    def build():
        ds = rd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                             columns=["doc_id", "text"])
        out = pack_sequences(ds, seq_len=128, num_ranges=4)
        # deterministic output-partition key over the corpus key
        return out.map_batches(
            lambda b: b.append_column(
                "out_part", pc.cast(pc.bit_wise_and(b["doc_id"], 3),
                                    pa.int64())),
            batch_format="pyarrow")

    single = str(tmp_path_factory.mktemp("pack_single"))
    resumed = str(tmp_path_factory.mktemp("pack_resumed"))
    s = write_partitioned_resumable(build(), single, "out_part")
    assert s["complete"] and s["partitions_total"] == 4

    r1 = write_partitioned_resumable(build(), resumed, "out_part",
                                     max_partitions=2)
    assert not r1["complete"] and r1["partitions_done_now"] == 2
    r2 = write_partitioned_resumable(build(), resumed, "out_part")
    assert r2["complete"]
    assert r2["partitions_skipped"] == 2 and r2["partitions_done_now"] == 2

    a = _read_all(single, ["doc_id"])
    b = _read_all(resumed, ["doc_id"])
    import pandas as pd

    pd.testing.assert_frame_equal(a, b)
    # the packing itself is globally consistent: offsets are the prefix
    # sum of token counts in doc_id order
    assert (a["token_offset"].values
            == a["n_tokens"].cumsum().shift(fill_value=0).values).all()


def test_shuffle_shards_kill_resume_equals_single_run(
        tmp_path_factory, quiet_data_context):
    import pandas as pd
    import ray.data as rd

    from data_quality_check_ray.pipelines.runner import (
        write_partitioned_resumable)
    from data_quality_check_ray.stages.shuffle import shuffle_shards

    def build():
        ds = rd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                             columns=["doc_id"])
        return shuffle_shards(ds, num_shards=4)

    single = str(tmp_path_factory.mktemp("shuf_single"))
    resumed = str(tmp_path_factory.mktemp("shuf_resumed"))
    s = write_partitioned_resumable(build(), single, "shard")
    assert s["complete"] and s["partitions_total"] == 4

    r1 = write_partitioned_resumable(build(), resumed, "shard",
                                     max_partitions=1)
    assert not r1["complete"] and r1["partitions_done_now"] == 1
    r2 = write_partitioned_resumable(build(), resumed, "shard")
    assert r2["complete"]
    assert r2["partitions_skipped"] == 1 and r2["partitions_done_now"] == 3

    a = _read_all(single, ["shard", "pos"])
    b = _read_all(resumed, ["shard", "pos"])
    pd.testing.assert_frame_equal(a, b)
    # every doc appears exactly once across shards
    assert a["doc_id"].is_unique and len(a) == 500
