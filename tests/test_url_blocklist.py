"""UT1-style URL blocklist filtering (pipelines/reports.flag_blocked_urls)."""

from __future__ import annotations

import pyarrow as pa
import pytest

from data_quality_check_ray.pipelines.reports import flag_blocked_urls


ROWS = [
    {"url": "https://bad.example.com/page1"},
    {"url": "https://good.example.com/page2"},
    {"url": "https://bad.example.com/deep/path"},
    {"url": "https://other.example.com/casino-bonus"},
    {"url": "https://sub.bad.example.com/x"},  # exact host match only
    {"url": None},
    {"url": "not a url"},
]
BLOCKED = ["bad.example.com", "worse.example.com"]


def _run(rows, nblocks=1, **kw):
    import ray.data as rd

    ds = rd.from_arrow(pa.Table.from_pylist(rows))
    if nblocks > 1:
        ds = ds.repartition(nblocks)
    return (flag_blocked_urls(ds, BLOCKED, **kw)
            .to_pandas().set_index("url", drop=False))


@pytest.mark.parametrize("nblocks", [1, 3])
def test_host_membership(quiet_data_context, nblocks):
    out = _run(ROWS, nblocks=nblocks)
    assert bool(out.loc["https://bad.example.com/page1", "blocked"])
    assert bool(out.loc["https://bad.example.com/deep/path", "blocked"])
    assert not bool(out.loc["https://good.example.com/page2", "blocked"])
    # subdomains are NOT swept up by an exact-host blocklist
    assert not bool(out.loc["https://sub.bad.example.com/x", "blocked"])


def test_pattern_rule_or_composes(quiet_data_context):
    out = _run(ROWS, url_regex=r"casino")
    assert bool(out.loc["https://other.example.com/casino-bonus", "blocked"])
    assert bool(out.loc["https://bad.example.com/page1", "blocked"])
    assert not bool(out.loc["https://good.example.com/page2", "blocked"])


def test_null_and_malformed_urls_pass_through(quiet_data_context):
    out = _run(ROWS, url_regex=r"casino")
    assert out["blocked"].dtype == bool
    malformed = out[out["host"] == ""]
    assert len(malformed) == 2  # the null and the non-url
    assert not malformed["blocked"].any()


def test_empty_blocklist(quiet_data_context):
    import ray.data as rd

    ds = rd.from_arrow(pa.Table.from_pylist(ROWS))
    out = flag_blocked_urls(ds, []).to_pandas()
    assert not out["blocked"].any()
