"""Driver-gate rehearsal: queries() vs oracle_sql() via DuckDB at sf0.001."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

# every registered query — the list IS the registry, so a new
# queries() entry is oracle-rehearsed here automatically
def _all_names():
    from data_quality_check_ray.pipelines.queries import QUERIES

    return list(QUERIES)


CHECKED = _all_names()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.datetime64):
            df[c] = df[c].astype("datetime64[us]")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _to_pandas(res):
    import pyarrow as pa

    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()


@pytest.mark.parametrize("name", CHECKED)
def test_query_matches_oracle(name, con, quiet_data_context):
    import __ray_entry__ as e

    got = _canon(_to_pandas(e.queries()[name](SF_DIR)))
    exp = _canon(con.sql(e.oracle_sql()[name]).to_df())
    assert list(got.columns) == list(exp.columns)
    assert len(got) == len(exp)
    for c in got.columns:
        a, b = got[c].to_numpy(), exp[c].to_numpy()
        if np.issubdtype(a.dtype, np.floating) or np.issubdtype(b.dtype, np.floating):
            assert np.array_equal(
                a.astype(np.float64), b.astype(np.float64), equal_nan=True
            ), c
        else:
            assert got[c].equals(exp[c]), c


def test_every_query_has_an_oracle():
    """Round-3 milestone: zero rows-only queries — every registered
    pipeline, including the model/hash/sketch ones, carries an oracle
    (SQL over the views or a differential scalar-reference parquet)."""
    import __ray_entry__ as e

    assert set(e.oracle_sql()) == set(e.queries())


def test_entry_runs(quiet_data_context):
    import __ray_entry__ as e

    out = _to_pandas(e.entry())
    assert len(out) == 500
    assert {"url", "keep", "drop_reason", "text_scrubbed"} <= set(out.columns)


def test_ngram_jaccard_on_shingle_free_corpus(tmp_path, quiet_data_context):
    """A corpus where every doc has under 3 words yields ZERO (shingle,
    doc) rows; the sizes aggregation then produces no batches at all —
    the query must return the typed empty pair table, not crash in
    pa.concat_tables (round-3 review regression)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from data_quality_check_ray.pipelines.queries import q_ngram_jaccard_pairs

    d = tmp_path / "sf_empty"
    d.mkdir()
    pq.write_table(
        pa.table({
            "doc_id": pa.array([1, 2, 3], type=pa.int64()),
            "text": pa.array(["one two", "", None], type=pa.string()),
        }),
        str(d / "documents.parquet"),
    )
    out = _to_pandas(q_ngram_jaccard_pairs(str(d)))
    assert len(out) == 0
    assert list(out.columns) == ["a", "b", "jac"]
