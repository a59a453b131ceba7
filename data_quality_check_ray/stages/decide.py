"""Decision combiner: keep/drop + first-failing drop reason.

The reference fails a request at the FIRST bad field (fail-fast,
dynamic-message/src/lib.rs:32-36); the engine evaluates every rule
vectorized, then *records* the first failing reason in the same fixed order
— identical decision semantics, dataset-friendly error channel.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..config import RuleConfig
from ..schema import ALLOWED_LANGS

# evaluation order: conformance first (conform_reason column carries its
# own sub-order), then the registry order of functions/rules.DEFAULT_RULES
# — the registry is the single source of truth, no duplicated list here.


def decide_stage(batch: pa.Table, rules: RuleConfig = RuleConfig()) -> pa.Table:
    """Append ``keep`` (bool) and ``drop_reason`` (string, "" when kept)."""
    from ..functions.rules import DEFAULT_RULES, evaluate_rules

    n = len(batch)
    # vectorized + dtype-stable for 0-row batches (a Python list
    # comprehension would yield a float64 empty array and break ~mask)
    lang_in_target = (
        pc.is_in(batch["lang_pred"], value_set=pa.array(list(ALLOWED_LANGS)))
        .to_numpy(zero_copy_only=False)
        .astype(bool)
    )

    def get_signal(name: str) -> np.ndarray:
        if name == "lang_in_target":
            return lang_in_target
        return batch[name].to_numpy(zero_copy_only=False)

    fails = evaluate_rules(get_signal, rules, DEFAULT_RULES)

    # first-failing reason, evaluated back-to-front so earlier rules win
    reason = np.full(n, "", dtype=object)
    for name, mask in reversed(fails):
        reason[mask] = name
    conform = np.asarray(batch["conform_reason"].to_numpy(zero_copy_only=False), dtype=object)
    has_conform = conform != ""
    reason[has_conform] = conform[has_conform]

    keep = reason == ""
    batch = batch.append_column("keep", pa.array(keep.astype(bool)))
    return batch.append_column(
        "drop_reason", pa.array([str(r) for r in reason], type=pa.string())
    )
