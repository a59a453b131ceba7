"""DSIR importance-resampling selection (stages/dsir)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from data_quality_check_ray.stages import dsir


TARGET = [
    {"doc_id": 0, "text": "medical trial results show treatment efficacy"},
    {"doc_id": 1, "text": "clinical medical study treatment outcomes"},
]
RAW = [
    # in-domain-looking -> should score high
    {"doc_id": 10, "text": "medical treatment study shows clinical efficacy"},
    # out-of-domain
    {"doc_id": 11, "text": "celebrity gossip shocking red carpet moments"},
    {"doc_id": 12, "text": "sports scores last night big game recap"},
    # degenerate docs
    {"doc_id": 13, "text": ""},
    {"doc_id": 14, "text": None},
    {"doc_id": 15, "text": "word"},
] + [
    # bulk out-of-domain filler: the raw corpus must dwarf the target
    # sample (as in any real DSIR run) or the raw-average baseline is
    # dominated by the target docs themselves; it reuses the OOD docs'
    # vocabulary so their features are FREQUENT in raw (rare features
    # sit above the occurrence-weighted average by construction)
    {"doc_id": 100 + i,
     "text": "celebrity gossip shocking red carpet moments "
             "sports scores last night big game recap"}
    for i in range(12)
]


def _ds(rows, nblocks=1):
    import ray.data as rd

    ds = rd.from_arrow(pa.Table.from_pylist(rows))
    return ds.repartition(nblocks) if nblocks > 1 else ds


def _scalar_counts(rows):
    from data_quality_check_ray.functions.quality_model import (
        B, BIGRAM_MULT, lower_simple, word_bucket_scalar)

    c = np.zeros(B, dtype=np.int64)
    for r in rows:
        uni = np.array([word_bucket_scalar(lower_simple(w))
                        for w in (r["text"] or "").split()], dtype=np.int64)
        np.add.at(c, uni, 1)
        if len(uni) > 1:
            np.add.at(c, (uni[:-1] * BIGRAM_MULT + uni[1:]) % B, 1)
    return c


@pytest.mark.parametrize("nblocks", [1, 3])
def test_counts_match_scalar_any_partitioning(quiet_data_context, nblocks):
    got = dsir.hashed_feature_counts(_ds(RAW, nblocks))
    np.testing.assert_array_equal(got, _scalar_counts(RAW))


@pytest.mark.parametrize("nblocks", [1, 3])
def test_split_counts_match_two_pass(quiet_data_context, nblocks):
    """The fused single-pass (target, raw) counts equal running the
    two separate passes (and the scalar reference)."""
    def is_small_id(b):
        return b["doc_id"].to_numpy(zero_copy_only=False) < 13

    tgt, raw = dsir.hashed_feature_counts_split(_ds(RAW, nblocks),
                                                is_small_id)
    np.testing.assert_array_equal(raw, _scalar_counts(RAW))
    np.testing.assert_array_equal(
        tgt, _scalar_counts([r for r in RAW if r["doc_id"] < 13]))


@pytest.mark.parametrize("nblocks", [1, 3])
def test_logw_bitexact_vs_scalar_spec(quiet_data_context, nblocks):
    lam = dsir.dsir_lambda(_scalar_counts(TARGET),
                           _scalar_counts(TARGET + RAW))
    out = (dsir.dsir_weights(_ds(RAW, nblocks), lam)
           .to_pandas().set_index("doc_id").sort_index())
    for r in RAW:
        lw, nf = dsir.dsir_logw_scalar(r["text"], lam)
        assert out.loc[r["doc_id"], "dsir_logw"] == lw, r["doc_id"]
        assert out.loc[r["doc_id"], "n_features"] == nf


def test_in_domain_scores_above_out_of_domain(quiet_data_context):
    tgt = _scalar_counts(TARGET)
    raw = _scalar_counts(TARGET + RAW)
    lam = dsir.dsir_lambda(tgt, raw)
    out = (dsir.dsir_weights(_ds(RAW), lam,
                             center=dsir.dsir_center(raw, lam))
           .to_pandas().set_index("doc_id"))
    assert out.loc[10, "dsir_logw"] > out.loc[11, "dsir_logw"]
    assert out.loc[10, "dsir_logw"] > out.loc[12, "dsir_logw"]
    # centered cut: the in-domain doc clears the raw-average baseline,
    # the out-of-domain docs do not
    assert bool(out.loc[10, "selected"])
    assert not bool(out.loc[11, "selected"])
    assert not bool(out.loc[12, "selected"])


def test_zero_feature_docs_never_selected(quiet_data_context):
    lam = dsir.dsir_lambda(_scalar_counts(TARGET),
                           _scalar_counts(TARGET + RAW))
    out = (dsir.dsir_weights(_ds(RAW), lam)
           .to_pandas().set_index("doc_id"))
    for did in (13, 14):
        assert out.loc[did, "n_features"] == 0
        assert out.loc[did, "dsir_logw"] == 0.0
        assert not bool(out.loc[did, "selected"])


def test_lambda_points_toward_target(quiet_data_context):
    """A bucket seen only in the target has a larger lambda than one
    seen only in the raw corpus."""
    t = np.zeros(dsir.B, dtype=np.int64)
    r = np.zeros(dsir.B, dtype=np.int64)
    t[7] = 10   # target-only bucket
    r[9] = 10   # raw-only bucket
    lam = dsir.dsir_lambda(t, r + t)
    assert lam[7] > lam[9]
