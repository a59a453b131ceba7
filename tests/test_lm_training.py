"""Distributed n-gram LM training (functions/lm.train_tables)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from data_quality_check_ray.functions import lm


def _corpus():
    rows = [
        {"text": "the cat sat on the mat"},
        {"text": "the cat ran"},
        {"text": "a dog sat on a log"},
        {"text": ""},
        {"text": "one"},          # <2 tokens: contributes no bigrams
    ]
    return pa.Table.from_pylist(rows)


def test_trained_counts_match_bruteforce(quiet_data_context):
    import ray.data as rd

    uni, pair = lm.train_tables(rd.from_arrow(_corpus()).repartition(3))

    # brute-force reference counts
    exp_uni = np.zeros(lm.H)
    exp_pair = np.zeros(lm.PAIR_M)
    for row in _corpus().to_pylist():
        toks = [lm.normalize_token(t) for t in row["text"].split()]
        hs = [lm.token_hash(t) for t in toks]
        for h1, h2 in zip(hs[:-1], hs[1:]):
            exp_uni[h1] += 1
            exp_pair[lm._pair_slot(h1, h2)] += 1
    assert np.array_equal(uni, exp_uni)
    assert np.array_equal(pair, exp_pair)
    assert uni.sum() == 12  # 5 + 2 + 5 bigrams


def test_trained_tables_score_in_domain_lower(quiet_data_context):
    """A model trained on a corpus must assign lower perplexity to
    in-domain text than to an out-of-domain word salad."""
    import ray.data as rd

    uni, pair = lm.train_tables(rd.from_arrow(_corpus()))
    texts = pa.array([
        "the cat sat on the mat",            # seen bigrams
        "zyx qwv plk jhg mnb vcx",           # unseen vocabulary
    ])
    ppl = lm.ppl_batch(texts, tables=(uni, pair))
    assert ppl[0] < ppl[1]


def test_tables_param_changes_scoring():
    texts = pa.array(["the cat sat"])
    default = lm.ppl_batch(texts)
    zeroed = lm.ppl_batch(
        texts, tables=(np.zeros(lm.H), np.zeros(lm.PAIR_M)))
    assert default[0] != zeroed[0]
