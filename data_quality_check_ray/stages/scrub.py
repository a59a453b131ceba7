"""PII/toxicity scrub stage (stateless; regexes precompiled at import)."""

from __future__ import annotations

import pyarrow as pa

from ..functions.pii import PII_RULES, scrub_batch


def scrub_stage(batch: pa.Table) -> pa.Table:
    """Append ``text_scrubbed``, ``pii_counts`` (struct) and ``tox_count``."""
    scrubbed, counts, tox = scrub_batch(batch["text_effective"])
    batch = batch.append_column("text_scrubbed", scrubbed)
    pii_struct = pa.StructArray.from_arrays(
        [pa.array(counts[name], type=pa.int64()) for name, _, _ in PII_RULES],
        names=[name for name, _, _ in PII_RULES],
    )
    batch = batch.append_column("pii_counts", pii_struct)
    return batch.append_column("tox_count", pa.array(tox, type=pa.int64()))
