"""Per-host quota sampling (pipelines/reports.host_cap)."""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pytest

from data_quality_check_ray.pipelines.reports import host_cap


def _pages(counts: dict[str, int]):
    rows = []
    i = 0
    for host, n in counts.items():
        for _ in range(n):
            rows.append({"url": f"https://{host}/{i}", "text": f"doc {i}"})
            i += 1
    return rows


def _run(rows, cap, mode="md5", nblocks=1, seed=17):
    import ray.data as rd

    ds = rd.from_arrow(pa.Table.from_pylist(rows))
    if nblocks > 1:
        ds = ds.repartition(nblocks)
    return host_cap(ds, cap=cap, seed=seed, mode=mode).to_pandas()


COUNTS = {"big.example.com": 30, "mid.example.com": 7, "tiny.example.com": 1}


@pytest.mark.parametrize("mode", ["md5", "fast"])
@pytest.mark.parametrize("nblocks", [1, 4])
def test_cap_counts_per_host(quiet_data_context, mode, nblocks):
    out = _run(_pages(COUNTS), cap=5, mode=mode, nblocks=nblocks)
    got = out.groupby("host").size().to_dict()
    assert got == {"big.example.com": 5, "mid.example.com": 5,
                   "tiny.example.com": 1}
    # ranks are contiguous 0..k-1 within each host
    for _, grp in out.groupby("host"):
        assert sorted(grp["host_rank"]) == list(range(len(grp)))


def test_md5_mode_matches_scalar_reference(quiet_data_context):
    rows = _pages(COUNTS)
    out = _run(rows, cap=5, mode="md5").sort_values(
        ["host", "host_rank"]).reset_index(drop=True)
    # scalar reference: rank by (md5(url || ':17'), url) within host
    by_host = {}
    for r in rows:
        host = r["url"].split("//")[1].split("/")[0]
        key = hashlib.md5((r["url"] + ":17").encode()).hexdigest()
        by_host.setdefault(host, []).append((key, r["url"]))
    expect = []
    for host in sorted(by_host):
        for rank, (_, url) in enumerate(sorted(by_host[host])[:5]):
            expect.append((host, url, rank))
    got = list(out[["host", "url", "host_rank"]].itertuples(index=False,
                                                            name=None))
    assert sorted(got) == sorted(expect)


def test_partitioning_independent_selection(quiet_data_context):
    rows = _pages(COUNTS)
    a = _run(rows, cap=5, mode="fast", nblocks=1)
    b = _run(rows, cap=5, mode="fast", nblocks=6)
    key = lambda df: sorted(map(tuple, df.values.tolist()))
    assert key(a) == key(b)


def test_seed_changes_selection(quiet_data_context):
    rows = _pages({"big.example.com": 40})
    a = set(_run(rows, cap=5, mode="fast", seed=1)["url"])
    b = set(_run(rows, cap=5, mode="fast", seed=2)["url"])
    assert a != b  # 5-of-40 chosen twice identically is ~1e-6
