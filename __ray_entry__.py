"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing
here (or in the library) calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship quality-filter pipeline over pages synthesized
    deterministically from /root/testdata/sf0.001/documents.parquet."""
    from data_quality_check_ray.pipelines.queries import q_pages_pipeline

    return q_pages_pipeline("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline (SURVEY.md §2 +
    training-data ops); each callable takes sf_dir -> Dataset/Table."""
    from data_quality_check_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB oracles with matching column names; model/sketch queries
    (pages_pipeline, langid_documents, minhash_dedup, simhash_dedup,
    approx_distinct_users) are rows-only by design — no SQL equivalent."""
    from data_quality_check_ray.pipelines.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
