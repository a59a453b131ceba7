"""Layout safety of the cached synthetic-corpus writer.

``write_pages_parquet`` skips files that already exist (the generation
cache for benches).  Without a layout manifest that cache is unsafe: a
directory first written as 32 files and later requested as 64 keeps the
32-layout files (whose row ranges follow the OLD bounds) and adds the
64-layout tail on top — observed serving 4.8M rows for a 3.2M-doc
corpus, with the second half duplicated.  These tests pin the guard.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq

from data_quality_check_ray.sources import synth


def _rows(d: str) -> int:
    total = 0
    for name in sorted(os.listdir(d)):
        if name.endswith(".parquet"):
            total += pq.ParquetFile(os.path.join(d, name)).metadata.num_rows
    return total


def test_relayout_wipes_stale_files(tmp_path):
    d = str(tmp_path / "pages")
    synth.write_pages_parquet(d, 400, num_files=8)
    assert _rows(d) == 400
    # same n, different file count: old files must not survive
    synth.write_pages_parquet(d, 400, num_files=2)
    names = sorted(n for n in os.listdir(d) if n.endswith(".parquet"))
    assert names == ["part-00000.parquet", "part-00001.parquet"]
    assert _rows(d) == 400


def test_size_change_regenerates(tmp_path):
    d = str(tmp_path / "pages")
    synth.write_pages_parquet(d, 300, num_files=4)
    synth.write_pages_parquet(d, 500, num_files=4)
    assert _rows(d) == 500


def test_matching_layout_is_a_cache_hit(tmp_path):
    d = str(tmp_path / "pages")
    synth.write_pages_parquet(d, 300, num_files=4)
    mtimes = {
        n: os.path.getmtime(os.path.join(d, n)) for n in os.listdir(d)
    }
    synth.write_pages_parquet(d, 300, num_files=4)
    assert {
        n: os.path.getmtime(os.path.join(d, n)) for n in os.listdir(d)
    } == mtimes


def test_content_identical_across_layouts(tmp_path):
    """Files are pure functions of (seed, row range): the concatenated
    corpus is byte-identical whatever num_files is."""
    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    synth.write_pages_parquet(a, 250, num_files=1)
    synth.write_pages_parquet(b, 250, num_files=5)
    ta = pq.read_table(a).sort_by("url")
    tb = pq.read_table(b).sort_by("url")
    assert ta.equals(tb)
