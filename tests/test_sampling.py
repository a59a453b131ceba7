"""Deterministic hash sampling (functions/sampling)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from data_quality_check_ray.functions.sampling import (
    deterministic_sample,
    hash_bucket_256,
    sample_mask,
)


def test_rate_accuracy_both_modes():
    keys = np.arange(20_000)
    for mode in ("md5", "fast"):
        m = sample_mask(keys, rate=0.25, mode=mode)
        assert abs(m.mean() - 0.25) < 0.02, mode


def test_deterministic_and_key_pure():
    keys = np.arange(1000)
    a = sample_mask(keys, rate=0.5, mode="fast")
    b = sample_mask(keys, rate=0.5, mode="fast")
    assert np.array_equal(a, b)
    # shuffling rows must not change which KEYS are kept
    perm = np.random.RandomState(0).permutation(1000)
    c = sample_mask(keys[perm], rate=0.5, mode="fast")
    assert np.array_equal(c, a[perm])


def test_nested_rates_monotone():
    """A row kept at rate r is also kept at any r' > r — the property that
    makes grown samples supersets (critical for incremental curation)."""
    keys = np.arange(5000)
    m25 = sample_mask(keys, rate=0.25, mode="fast")
    m50 = sample_mask(keys, rate=0.5, mode="fast")
    assert (m50 | ~m25).all()  # m25 => m50


def test_stratified_rates():
    keys = np.arange(30_000)
    strata = np.where(keys % 2 == 0, "en", "de")
    m = sample_mask(keys, strata=strata, rate_by={"en": 0.5, "de": 0.1},
                    mode="fast")
    en = m[strata == "en"].mean()
    de = m[strata == "de"].mean()
    assert abs(en - 0.5) < 0.02 and abs(de - 0.1) < 0.015


def test_default_rate_and_validation():
    keys = np.arange(1000)
    m = sample_mask(keys, strata=["xx"] * 1000, rate_by={"en": 0.5},
                    default_rate=0.0, mode="fast")
    assert not m.any()
    with pytest.raises(ValueError):
        sample_mask(keys, rate=1.5)
    with pytest.raises(ValueError):
        sample_mask(keys)
    with pytest.raises(ValueError):
        hash_bucket_256(keys, mode="nope")


def test_dataset_operator(quiet_data_context):
    import ray.data as rd

    df = pd.DataFrame({"doc_id": np.arange(4000), "lang": ["en", "de"] * 2000})
    out = deterministic_sample(
        rd.from_pandas(df).repartition(4), "doc_id", strat_col="lang",
        rate_by={"en": 0.5, "de": 0.0}, mode="fast",
    ).to_pandas()
    assert set(out["lang"]) == {"en"}
    assert abs(len(out) / 2000 - 0.5) < 0.05


def test_mix_datasets(quiet_data_context):
    import ray.data as rd

    a = pd.DataFrame({"id": np.arange(2000), "src": "a"})
    b = pd.DataFrame({"id": np.arange(2000), "src": "b"})
    from data_quality_check_ray.functions.sampling import mix_datasets

    out = mix_datasets(
        [(rd.from_pandas(a), "id", 0.5), (rd.from_pandas(b), "id", 0.25)],
        mode="fast",
    ).to_pandas()
    fa = (out["src"] == "a").sum() / 2000
    fb = (out["src"] == "b").sum() / 2000
    assert abs(fa - 0.5) < 0.04 and abs(fb - 0.25) < 0.04
    # same key kept in BOTH sources when both rates pass its hash:
    # mixture is key-pure, not row-position dependent
    with pytest.raises(ValueError):
        mix_datasets([])
