"""Per-partition lineage/metrics rows (SURVEY.md §1.4 metrics mapping).

The columnar analog of the reference's OTel counter + histogram
(``data-quality-server/src/metrics.rs:17-25``, dimensions message_name /
field_check): one row per output partition with row counts, keep counts,
per-reason drop counts and wall time, written as a small parquet sidecar
table under ``<out>/_lineage/`` — queryable with the same engine.
"""

from __future__ import annotations

import glob
import os

import pyarrow as pa
import pyarrow.parquet as pq


def partition_metrics(part_dir: str, partition_id: str, rows_in: int, wall_s: float) -> dict:
    """Read back only (keep, drop_reason) columns of a written partition —
    cheap columnar scan — and summarize."""
    files = sorted(glob.glob(os.path.join(part_dir, "*.parquet")))
    n_rows = 0
    n_kept = 0
    reasons: dict[str, int] = {}
    for f in files:
        t = pq.read_table(f, columns=["keep", "drop_reason"])
        n_rows += t.num_rows
        n_kept += t["keep"].combine_chunks().to_numpy(zero_copy_only=False).sum()
        import pyarrow.compute as pc

        vc = pc.value_counts(t["drop_reason"].combine_chunks())
        for item in vc.to_pylist():
            r = item["values"]
            if r:
                reasons[r] = reasons.get(r, 0) + item["counts"]
    return {
        "rows_in": int(rows_in),
        "rows_out": int(n_rows),
        "n_kept": int(n_kept),
        "drop_reasons": reasons,
        "wall_s": round(wall_s, 3),
    }


def append_lineage_row(out_dir: str, entry: dict) -> None:
    ld = os.path.join(out_dir, "_lineage")
    os.makedirs(ld, exist_ok=True)
    import json

    t = pa.Table.from_pylist(
        [
            {
                "partition_id": entry["partition_id"],
                "fingerprint": entry["fingerprint"],
                "rows_in": entry["rows_in"],
                "rows_out": entry["rows_out"],
                "n_kept": entry["n_kept"],
                "drop_reasons": str(entry["drop_reasons"]),
                "wall_s": entry["wall_s"],
                # per-stage duration histograms (state/stage_metrics);
                # "{}" when stage_metrics is off
                "stage_walls": json.dumps(entry.get("stage_walls", {})),
            }
        ]
    )
    pq.write_table(t, os.path.join(ld, f"part-{entry['partition_id']}.parquet"))


def read_lineage(out_dir: str) -> pa.Table:
    files = sorted(glob.glob(os.path.join(out_dir, "_lineage", "*.parquet")))
    if not files:
        return pa.table({})
    # promote schemas: a resumed run may mix rows written before a column
    # was added (e.g. stage_walls) with rows written after
    return pa.concat_tables(
        [pq.read_table(f) for f in files], promote_options="default"
    )
