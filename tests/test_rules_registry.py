"""Rule registry: config-driven assembly + extension (SURVEY §2.9)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from data_quality_check_ray.config import RuleConfig
from data_quality_check_ray.functions.rules import DEFAULT_RULES, Rule, evaluate_rules


def test_registry_order_matches_decision_semantics():
    names = [r.name for r in DEFAULT_RULES]
    # conformance handled upstream; heuristics before models before tox
    assert names.index("rule:too_short") < names.index("rule:stopword")
    assert names.index("rule:ellipsis") < names.index("langid:not_target")
    assert names.index("langid:low_confidence") < names.index("ppl:high")
    assert names[-1] == "tox:term"


def test_threshold_change_is_config_only():
    signals = {
        "n_chars": np.array([10, 100]),
        "n_words": np.array([50, 50]),
        "mean_word_len": np.array([5.0, 5.0]),
        "symbol_ratio": np.array([0.0, 0.0]),
        "alpha_word_fraction": np.array([1.0, 1.0]),
        "stop_fraction": np.array([0.5, 0.5]),
        "dup2gram_fraction": np.array([0.0, 0.0]),
        "bullet_ratio": np.array([0.0, 0.0]),
        "ellipsis_ratio": np.array([0.0, 0.0]),
        "lang_in_target": np.array([True, True]),
        "lang_score": np.array([0.99, 0.99], dtype=np.float32),
        "ppl": np.array([100.0, 100.0], dtype=np.float32),
        "tox_count": np.array([0, 0]),
    }
    fails = dict(evaluate_rules(signals.__getitem__, RuleConfig()))
    assert fails["rule:too_short"].tolist() == [True, False]
    strict = RuleConfig(min_chars=200)
    fails2 = dict(evaluate_rules(signals.__getitem__, strict))
    assert fails2["rule:too_short"].tolist() == [True, True]


def test_custom_rule_extension():
    """A new gate = one registry entry (the upload-a-descriptor analog)."""
    custom = DEFAULT_RULES + (
        Rule("rule:too_many_words", "n_words", lambda v, t: v > 40, None),
    )
    signals = {"n_words": np.array([10, 100])}

    def g(name):
        if name == "lang_in_target":
            return np.array([True, True])
        return signals.get(name, np.zeros(2))

    fails = dict(evaluate_rules(g, RuleConfig(), custom))
    assert fails["rule:too_many_words"].tolist() == [False, True]
