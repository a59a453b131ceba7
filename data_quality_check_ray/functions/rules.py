"""Named, ordered quality-rule registry.

The engine's extension surface (SURVEY.md §2.9): the reference lets users
upload a new protobuf descriptor at runtime and instantly validate against
it (handlers.rs:27-78); here, a quality gate is a named registry entry —
(name, signal column, comparator, threshold-config attribute) — and the
decision stage is assembled FROM the registry, so adding or re-ordering a
rule is a registry/config change, not a decision-code change.

Entries evaluate against the signal columns produced by the heuristics /
model stages; ``threshold_attr`` resolves against ``RuleConfig`` at
evaluation time, so one registry serves any config.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import numpy as np

from ..config import RuleConfig


@dataclass(frozen=True)
class Rule:
    name: str            # drop_reason emitted when the rule fails
    signal: str          # column the rule reads
    fail_when: Callable  # (values, threshold) -> bool mask of FAILING rows
    threshold_attr: str | None  # RuleConfig attribute (None = fixed rule)


def _lt(v, t):
    return v < t


def _gt(v, t):
    return v > t


#: ordered registry — first failing rule wins (the reference's fail-fast
#: ordering, dynamic-message/src/lib.rs:32-36, recorded not raised)
DEFAULT_RULES: tuple[Rule, ...] = (
    Rule("rule:too_short", "n_chars", _lt, "min_chars"),
    Rule("rule:too_long", "n_chars", _gt, "max_chars"),
    Rule("rule:too_few_words", "n_words", _lt, "min_words"),
    Rule("rule:word_length", "mean_word_len", _lt, "min_mean_word_len"),
    Rule("rule:word_length", "mean_word_len", _gt, "max_mean_word_len"),
    Rule("rule:symbol_ratio", "symbol_ratio", _gt, "max_symbol_ratio"),
    Rule("rule:non_alpha", "alpha_word_fraction", _lt, "min_alpha_word_fraction"),
    Rule("rule:stopword", "stop_fraction", _lt, "min_stop_fraction"),
    Rule("rule:repetition", "dup2gram_fraction", _gt, "max_dup2gram_fraction"),
    Rule("rule:bullets", "bullet_ratio", _gt, "max_bullet_ratio"),
    Rule("rule:ellipsis", "ellipsis_ratio", _gt, "max_ellipsis_ratio"),
    Rule("langid:not_target", "lang_in_target", lambda v, t: ~v, None),
    Rule(
        "langid:low_confidence", "lang_score",
        lambda v, t: v < np.float32(t), "min_lang_score",
    ),
    Rule("ppl:high", "ppl", lambda v, t: v > np.float32(t), "max_ppl"),
    Rule("tox:term", "tox_count", _gt, None),  # fixed: any term => drop
)


def evaluate_rules(
    get_signal: Callable[[str], np.ndarray],
    rules_cfg: RuleConfig,
    registry: tuple[Rule, ...] = DEFAULT_RULES,
) -> list[tuple[str, np.ndarray]]:
    """-> ordered [(reason, failing-mask)] for the decision combiner."""
    out = []
    for r in registry:
        thr = getattr(rules_cfg, r.threshold_attr) if r.threshold_attr else 0
        out.append((r.name, r.fail_when(get_signal(r.signal), thr)))
    return out
