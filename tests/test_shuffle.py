"""Deterministic train-order shuffle (stages/shuffle)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from data_quality_check_ray.stages.shuffle import shuffle_shards


def _ids(n, start=0):
    return pa.table({"doc_id": pa.array(range(start, start + n),
                                        type=pa.int64())})


@pytest.mark.parametrize("mode", ["fast", "md5"])
def test_shuffle_is_a_sharded_permutation(quiet_data_context, mode):
    import ray.data as rd

    out = shuffle_shards(rd.from_arrow(_ids(300)), num_shards=4, mode=mode) \
        .to_pandas()
    assert len(out) == 300
    assert sorted(out["doc_id"]) == list(range(300))
    assert set(out["shard"]) <= set(range(4))
    for s, g in out.groupby("shard"):
        assert sorted(g["pos"]) == list(range(len(g)))  # dense ranks


def test_shuffle_deterministic_across_partitionings(quiet_data_context):
    import ray.data as rd

    a = shuffle_shards(rd.from_arrow(_ids(200)).repartition(1)) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = shuffle_shards(rd.from_arrow(_ids(200)).repartition(13)) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)


def test_shuffle_seed_changes_order(quiet_data_context):
    import ray.data as rd

    a = shuffle_shards(rd.from_arrow(_ids(200)), seed=1) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = shuffle_shards(rd.from_arrow(_ids(200)), seed=2) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert not a[["shard", "pos"]].equals(b[["shard", "pos"]])


def test_shuffle_order_actually_scrambles(quiet_data_context):
    import ray.data as rd

    out = shuffle_shards(rd.from_arrow(_ids(500)), num_shards=1) \
        .to_pandas().sort_values("pos")
    ids = out["doc_id"].to_numpy()
    # Spearman-ish: the shuffled order must not correlate with id order
    assert abs(np.corrcoef(ids, np.arange(500))[0, 1]) < 0.2


def test_shuffle_shard_count_guard(quiet_data_context):
    import ray.data as rd

    for bad in (0, 3, 12, 512):
        with pytest.raises(ValueError, match="power of two"):
            shuffle_shards(rd.from_arrow(_ids(10)), num_shards=bad)
