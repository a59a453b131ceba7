"""Golden end-to-end: Ray pipeline vs pinned scalar reference labels.

North-rule gates: keep/drop F1 >= 0.99 (in practice exact) and
byte-identical scrubbed text per url on kept rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from data_quality_check_ray.pipelines.quality import build_pipeline
from data_quality_check_ray.pipelines.reference_rules import label_table
from data_quality_check_ray.sources import synth

N = 2000


@pytest.fixture(scope="module")
def golden(tmp_path_factory, quiet_data_context):
    import ray.data as rd

    d = tmp_path_factory.mktemp("pages")
    synth.write_pages_parquet(str(d), N, num_files=8)
    ds = build_pipeline(rd.read_parquet(str(d)))
    eng = ds.to_pandas().set_index("url").sort_index()
    ref = label_table(synth.generate_table(N)).to_pandas().set_index("url").sort_index()
    return eng, ref


def test_row_count_and_schema(golden):
    eng, ref = golden
    assert len(eng) == N == len(ref)
    for col in ("keep", "drop_reason", "lang_pred", "lang_score", "ppl", "text_scrubbed"):
        assert col in eng.columns


def test_keep_f1_vs_reference(golden):
    eng, ref = golden
    e = eng["keep"].to_numpy()
    r = ref["keep"].to_numpy()
    tp = int((e & r).sum())
    fp = int((e & ~r).sum())
    fn = int((~e & r).sum())
    f1 = 2 * tp / (2 * tp + fp + fn)
    assert f1 >= 0.99, f1
    assert (e == r).all()  # in practice: exact agreement


def test_drop_reasons_match_exactly(golden):
    eng, ref = golden
    assert (eng["drop_reason"] == ref["drop_reason"]).all()


def test_scrubbed_text_byte_identical_on_kept(golden):
    eng, ref = golden
    kept = eng[eng["keep"]]
    assert len(kept) > 0.5 * N * 0.7  # most clean docs kept
    assert (kept["text_scrubbed"] == ref.loc[kept.index, "text_scrubbed"]).all()


def test_lang_and_ppl_match_on_non_conform_rows(golden):
    eng, ref = golden
    m = ~eng["drop_reason"].str.startswith("conform")
    assert (eng.loc[m, "lang_pred"] == ref.loc[m, "lang_pred"]).all()
    assert (
        eng.loc[m, "lang_score"].to_numpy(np.float32)
        == ref.loc[m, "lang_score"].to_numpy(np.float32)
    ).all()
    assert (
        eng.loc[m, "ppl"].to_numpy(np.float32)
        == ref.loc[m, "ppl"].to_numpy(np.float32)
    ).all()


def test_labels_order_independent(golden, quiet_data_context):
    """Permutation invariance: a different block layout yields identical
    labels per url (resume-equals-single-run precondition)."""
    import ray.data as rd

    t = synth.generate_table(300)
    ds1 = build_pipeline(rd.from_arrow(t).repartition(7))
    ds2 = build_pipeline(rd.from_arrow(t).repartition(2))
    a = ds1.to_pandas().set_index("url").sort_index()
    b = ds2.to_pandas().set_index("url").sort_index()
    assert (a["keep"] == b["keep"]).all()
    assert (a["drop_reason"] == b["drop_reason"]).all()


def test_dict_boundary_flag_labels_identical(golden, quiet_data_context):
    """cfg.dict_boundary (the measured-negative DRAM experiment,
    BENCH/dict_boundary.json) must stay label- and text-identical to the
    stock boundary — the flag only changes the wire encoding."""
    import ray.data as rd

    from data_quality_check_ray.config import PipelineConfig

    t = synth.generate_table(300)
    a = build_pipeline(rd.from_arrow(t)).to_pandas().set_index("url").sort_index()
    d = (build_pipeline(rd.from_arrow(t), PipelineConfig(dict_boundary=True))
         .to_pandas().set_index("url").sort_index())
    assert (d["keep"] == a["keep"]).all()
    assert (d["drop_reason"] == a["drop_reason"]).all()
    # null text_scrubbed (conform-dropped rows) must stay null on both
    assert d["text_scrubbed"].fillna("\0") .eq(a["text_scrubbed"].fillna("\0")).all()
    assert list(d.dtypes) == list(a.dtypes)


def test_flagship_plan_is_shuffle_free(quiet_data_context):
    """The keep/drop spine must stay Read -> MapBatches* with NO all-to-all
    operator (sort/aggregate/repartition/shuffle): zero cross-node
    exchange is the architectural basis of the node-count scaling claim
    (BENCH/BASELINE.md) — this pins it against regressions."""
    import ray.data as rd

    from data_quality_check_ray.pipelines.quality import build_pipeline
    from data_quality_check_ray.sources import synth

    d = "/tmp/dqcr_planshape_pages"
    synth.write_pages_parquet(d, 200, num_files=1)
    ds = build_pipeline(rd.read_parquet(d))

    names = []

    def walk(op):
        names.append(type(op).__name__)
        for dep in op.input_dependencies:
            walk(dep)

    walk(ds._logical_plan.dag)
    assert names[-1] == "Read"
    assert set(names[:-1]) == {"MapBatches"}, names
