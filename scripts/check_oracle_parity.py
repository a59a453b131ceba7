"""Local stand-in for the driver's correctness gate: run every queries()
entry AND its oracle SQL at a given sf, compare row count, schema, and
order-insensitive values (columns sorted by name, rows sorted)."""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = sys.argv[2:] or None

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_pandas(res):
    import pyarrow as pa

    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray Dataset


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.datetime64):
            df[c] = df[c].astype("datetime64[us]")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main():
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    qs = e.queries()
    oracles = e.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        import time

        t0 = time.time()
        got = to_pandas(fn(SF_DIR))
        dt = time.time() - t0
        if name not in oracles:
            print(f"{name:24s} rows-only: {len(got):8d} rows  ({dt:.2f}s)")
            continue
        exp = con.sql(oracles[name]).to_df()
        g, x = canon(got), canon(exp)
        status = "OK"
        detail = ""
        if list(g.columns) != list(x.columns):
            status, detail = "SCHEMA-MISMATCH", f"{list(g.columns)} vs {list(x.columns)}"
        elif [str(d) for d in g.dtypes] != [str(d) for d in x.dtypes]:
            # the driver's hash is dtype-sensitive (int64 vs float64 of the
            # same values hash differently) — flag loudly
            status = "DTYPE-MISMATCH"
            detail = " ".join(
                f"{c}:{g[c].dtype}!={x[c].dtype}"
                for c in g.columns if g[c].dtype != x[c].dtype)
        elif len(g) != len(x):
            status, detail = "ROWCOUNT", f"{len(g)} vs {len(x)}"
        else:
            for c in g.columns:
                a, b = g[c].to_numpy(), x[c].to_numpy()
                if np.issubdtype(a.dtype, np.floating) or np.issubdtype(b.dtype, np.floating):
                    af, bf = a.astype(np.float64), b.astype(np.float64)
                    eq = np.array_equal(af, bf, equal_nan=True)
                    close = np.allclose(af, bf, rtol=1e-12, equal_nan=True)
                    if not eq:
                        status = "FLOAT-DIFF" if close else "VALUE-MISMATCH"
                        both_nan = np.isnan(af) & np.isnan(bf)
                        bad = np.where((af != bf) & ~both_nan)[0][:3]
                        detail += f" col={c} rows={bad.tolist()} {a[bad]} vs {b[bad]}"
                else:
                    # NaN/NaT-aware exact compare (Series.equals)
                    if not g[c].equals(x[c]):
                        status = "VALUE-MISMATCH"
                        neq = (g[c] != x[c]) & ~(g[c].isna() & x[c].isna())
                        bad = np.where(neq.to_numpy())[0][:3]
                        detail += f" col={c} rows={bad.tolist()} {a[bad]} vs {b[bad]}"
        if status != "OK":
            failures += 1
        print(f"{name:24s} {status}  {len(g)} rows ({dt:.2f}s) {detail[:300]}")
    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
