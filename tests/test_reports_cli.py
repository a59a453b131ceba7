"""Host-skew reports + CLI entries."""

from __future__ import annotations

import json
import subprocess
import sys

import pytest

from data_quality_check_ray.pipelines.quality import build_pipeline
from data_quality_check_ray.pipelines.reports import drop_reason_report, host_counts
from data_quality_check_ray.sources import synth


@pytest.fixture(scope="module")
def labeled(quiet_data_context):
    import ray.data as rd

    return build_pipeline(rd.from_arrow(synth.generate_table(1000)))


def test_host_counts_salted_equals_plain_groupby(labeled, quiet_data_context):
    out = host_counts(labeled).to_pandas()
    t = synth.generate_table(1000)
    import collections

    expect = collections.Counter(u.split("/")[2] for u in t["url"].to_pylist())
    got = dict(zip(out["host"], out["n_pages"]))
    assert got == dict(expect)
    assert out["n_kept"].sum() > 0
    # zipf skew present: top host owns many pages
    assert out["n_pages"].iloc[0] > 20


def test_drop_reason_report(labeled, quiet_data_context):
    rep = drop_reason_report(labeled).to_pandas()
    assert rep["n"].sum() == 1000
    assert "" in set(rep["drop_reason"])


def test_validate_one_cli_keep_and_drop():
    page = {
        "url": "https://h.example.org/p/1",
        "warc_ts": 1_700_000_000_000_000,
        "text": synth.generate_row(0)["text"],
        "lang": "en",
    }
    r = subprocess.run(
        [sys.executable, "scripts/validate_one.py", json.dumps(page)],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr
    out = json.loads(r.stdout)
    assert out["keep"] is True and out["drop_reason"] == ""

    r2 = subprocess.run(
        [sys.executable, "scripts/validate_one.py", json.dumps({"url": "u", "text": "hi"})],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert r2.returncode == 2
    assert json.loads(r2.stdout)["drop_reason"] == "conform:null_ts"

    r3 = subprocess.run(
        [sys.executable, "scripts/validate_one.py", "not json"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert r3.returncode == 1


def test_host_counts_without_keep_column(quiet_data_context):
    import ray.data as rd

    pages = rd.from_arrow(synth.generate_table(300))
    out = host_counts(pages, top_k=3).to_pandas()
    assert list(out.columns) == ["host", "n_pages"]
    assert len(out) == 3
    assert out["n_pages"].is_monotonic_decreasing


def test_run_module_cli_end_to_end(tmp_path_factory):
    """python -m data_quality_check_ray.run in a fresh process (own local
    ray session) — the `ray job submit` surface."""
    d = tmp_path_factory.mktemp("cli_in")
    synth.write_pages_parquet(str(d), 300, num_files=2)
    out = tmp_path_factory.mktemp("cli_out")
    r = subprocess.run(
        [sys.executable, "-m", "data_quality_check_ray.run",
         "--input", str(d), "--output", str(out),
         "--num-cpus", "4", "--concurrency", "2", "--files-per-partition", "2"],
        capture_output=True, text=True, cwd="/root/repo", timeout=240,
    )
    assert r.returncode == 0, r.stderr[-500:]
    summary = json.loads(r.stdout.strip().splitlines()[-1])
    assert summary["complete"] and summary["partitions_total"] == 1
    import glob as g

    files = g.glob(str(out) + "/part-*/*.parquet")
    assert files


def test_run_watch_mode_processes_only_new_files(tmp_path_factory):
    """--watch daemon loop (the reference config-producer's --loop +
    interval): scan 1 processes the initial files; a file added between
    scans is picked up by scan 2, which reprocesses ONLY the hash group
    that gained the file and skips the rest."""
    d = tmp_path_factory.mktemp("watch_in")
    synth.write_pages_parquet(str(d), 200, num_files=2)
    out = tmp_path_factory.mktemp("watch_out")
    # stderr must go to a FILE: Ray logs freely and an undrained PIPE
    # fills at 64 KiB, blocking the daemon before it prints scan 2
    errf = open(str(tmp_path_factory.mktemp("watch_err") / "err.log"), "w")
    p = subprocess.Popen(
        [sys.executable, "-m", "data_quality_check_ray.run",
         "--input", str(d), "--output", str(out),
         "--num-cpus", "4", "--concurrency", "2",
         "--hash-groups", "4", "--watch", "1.0", "--max-scans", "2"],
        stdout=subprocess.PIPE, stderr=errf, text=True,
        cwd="/root/repo",
    )
    try:
        line1 = json.loads(p.stdout.readline())
        assert line1["scan"] == 1 and line1["complete"]
        assert line1["partitions_done_now"] >= 1
        # grow the input dir while the daemon sleeps — by writing ONE new
        # file directly (write_pages_parquet would wipe+relayout the whole
        # dir via its _MANIFEST guard, touching every file's mtime and
        # racing scan 2 mid-wipe)
        import pyarrow.parquet as _pq

        _pq.write_table(
            synth.generate_table(100, seed=4242, start=10_000),
            str(d / "part-added.parquet"),
        )
        line2 = json.loads(p.stdout.readline())
        assert line2["scan"] == 2 and line2["complete"]
        # only the group(s) that gained the new file reprocess
        assert 1 <= line2["partitions_done_now"] < line2["partitions_total"]
        assert line2["partitions_skipped"] >= 1
        assert p.wait(timeout=120) == 0
    finally:
        if p.poll() is None:
            p.kill()
        errf.close()
