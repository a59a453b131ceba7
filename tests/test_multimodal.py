"""Multimodal stage plumbing (stub codecs, real Ray-side layout)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from data_quality_check_ray.stages.multimodal import (
    AudioFrameStage,
    ImageFeatureStage,
    byte_histogram_features,
)


def _payload_table(n=20):
    rng = np.random.RandomState(3)
    rows = [
        {"item_id": i, "payload": rng.bytes(500 + i * 37), "media_type": "image"}
        for i in range(n)
    ]
    rows.append({"item_id": n, "payload": None, "media_type": "image"})
    return pa.Table.from_pylist(rows)


def test_byte_histogram_is_normalized_and_deterministic():
    t = _payload_table()
    f1 = byte_histogram_features(t["payload"])
    f2 = byte_histogram_features(t["payload"])
    assert f1.shape == (21, 16)
    assert np.array_equal(f1, f2)
    sums = f1.sum(axis=1)
    assert np.allclose(sums[:-1], 1.0, atol=1e-5)
    assert sums[-1] == 0.0  # null payload -> zero features


def test_image_stage_schema_and_determinism():
    t = _payload_table()
    stage = ImageFeatureStage()
    out = stage(t)
    assert {"height", "width", "channels", "mean_rgb", "feat"} <= set(out.column_names)
    assert out["height"][0].as_py() >= 64
    assert out["height"][-1].as_py() is None  # null payload propagates
    out2 = ImageFeatureStage()(t)
    assert out.equals(out2)


def test_image_stage_runs_as_actor_pool(quiet_data_context):
    import ray.data as rd

    ds = rd.from_arrow(_payload_table(50)).map_batches(
        ImageFeatureStage, batch_size=16, concurrency=(1, 2), num_cpus=1,
        batch_format="pyarrow",
    )
    tables = list(ds.iter_batches(batch_size=None, batch_format="pyarrow"))
    total = sum(len(t) for t in tables)
    assert total == 51
    assert len(tables[0]["feat"][0].as_py()) == 16


def test_audio_stage_frames():
    pcm = (np.sin(np.linspace(0, 100, 4096)) * 1000).astype(np.int16).tobytes()
    t = pa.Table.from_pylist(
        [{"item_id": 0, "payload": pcm}, {"item_id": 1, "payload": b""}]
    )
    out = AudioFrameStage()(t)
    assert out["n_frames"][0].as_py() == 4
    assert len(out["frame_rms"][0].as_py()) == 4
    assert out["n_frames"][1].as_py() == 0
