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

#: fixed evaluation order — conformance, heuristics, models, toxicity
REASON_ORDER = (
    "conform",  # handled via conform_reason column (its own sub-order)
    "rule:too_short",
    "rule:too_long",
    "rule:too_few_words",
    "rule:word_length",
    "rule:symbol_ratio",
    "rule:stopword",
    "rule:repetition",
    "rule:bullets",
    "rule:ellipsis",
    "langid:not_target",
    "langid:low_confidence",
    "ppl:high",
    "tox:term",
)


def decide_stage(batch: pa.Table, rules: RuleConfig = RuleConfig()) -> pa.Table:
    """Append ``keep`` (bool) and ``drop_reason`` (string, "" when kept)."""
    n = len(batch)
    g = lambda name: batch[name].to_numpy(zero_copy_only=False)  # noqa: E731

    n_chars = g("n_chars")
    n_words = g("n_words")
    lang_pred = batch["lang_pred"].to_pylist()
    lang_in_target = np.array([p in ALLOWED_LANGS for p in lang_pred])

    fails: list[tuple[str, np.ndarray]] = [
        ("rule:too_short", n_chars < rules.min_chars),
        ("rule:too_long", n_chars > rules.max_chars),
        ("rule:too_few_words", n_words < rules.min_words),
        (
            "rule:word_length",
            (g("mean_word_len") < rules.min_mean_word_len)
            | (g("mean_word_len") > rules.max_mean_word_len),
        ),
        ("rule:symbol_ratio", g("symbol_ratio") > rules.max_symbol_ratio),
        ("rule:stopword", g("stop_fraction") < rules.min_stop_fraction),
        ("rule:repetition", g("dup2gram_fraction") > rules.max_dup2gram_fraction),
        ("rule:bullets", g("bullet_ratio") > rules.max_bullet_ratio),
        ("rule:ellipsis", g("ellipsis_ratio") > rules.max_ellipsis_ratio),
        ("langid:not_target", ~lang_in_target),
        (
            "langid:low_confidence",
            g("lang_score") < np.float32(rules.min_lang_score),
        ),
        ("ppl:high", g("ppl") > np.float32(rules.max_ppl)),
        ("tox:term", g("tox_count") > 0),
    ]

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
