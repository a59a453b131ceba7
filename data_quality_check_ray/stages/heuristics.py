"""Heuristic quality signals stage (stateless map_batches, pure kernels)."""

from __future__ import annotations

import pyarrow as pa

from ..functions.textstats import text_stats


def heuristics_stage(batch: pa.Table) -> pa.Table:
    """Append the Gopher/C4 signal columns computed from ``text_effective``."""
    stats = text_stats(batch["text_effective"])
    for name, arr in stats.items():
        batch = batch.append_column(name, pa.array(arr))
    return batch
