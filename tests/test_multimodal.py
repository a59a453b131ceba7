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


def test_bmp_ppm_roundtrip_exact():
    """Real codecs: decode(encode(img)) is bit-exact, including BMP row
    padding for widths not a multiple of 4."""
    import numpy as np

    from data_quality_check_ray.functions import codecs

    rs = np.random.RandomState(0)
    for h, w in ((1, 1), (3, 5), (7, 4), (13, 13), (64, 31)):
        img = rs.randint(0, 256, (h, w, 3), dtype=np.uint8)
        assert np.array_equal(codecs.decode_bmp(codecs.encode_bmp(img)), img)
        assert np.array_equal(codecs.decode_ppm(codecs.encode_ppm(img)), img)


def test_wav_roundtrip_exact():
    import numpy as np

    from data_quality_check_ray.functions import codecs

    s = np.random.RandomState(1).randint(-32768, 32767, 4801).astype(np.int16)
    rate, ch, out = codecs.decode_wav(codecs.encode_wav_pcm16(s, 8000))
    assert (rate, ch) == (8000, 1)
    assert np.array_equal(out, s)


def test_resize_bilinear_properties():
    import numpy as np

    from data_quality_check_ray.functions import codecs

    solid = np.full((5, 7, 3), 100, np.uint8)
    assert (codecs.resize_bilinear(solid, 10, 14) == 100).all()
    # 2x2 checkerboard downscaled to 1x1 = the average
    cb = np.array([[[0], [200]], [[200], [0]]], dtype=np.float32)
    assert abs(float(codecs.resize_bilinear(cb, 1, 1)[0, 0, 0]) - 100.0) < 1e-5


def test_image_stage_real_decode(quiet_data_context):
    """BMP payloads flow through ImageFeatureStage's REAL decode path:
    dimensions and channel means must match the constructed image."""
    import numpy as np
    import ray.data as rd

    from data_quality_check_ray.functions.codecs import encode_bmp
    from data_quality_check_ray.stages.multimodal import ImageFeatureStage

    img = np.zeros((10, 6, 3), np.uint8)
    img[:, :, 0] = 255  # pure red
    t = pa.table({"payload": pa.array([encode_bmp(img)], type=pa.binary())})
    out = rd.from_arrow(t).map_batches(
        ImageFeatureStage, batch_format="pyarrow", concurrency=1
    ).to_pandas()
    assert out.loc[0, "height"] == 10 and out.loc[0, "width"] == 6
    r, g, b = out.loc[0, "mean_rgb"]
    assert abs(r - 1.0) < 1e-6 and g == 0.0 and b == 0.0


def test_image_resize_stage(quiet_data_context):
    import numpy as np
    import ray.data as rd

    from data_quality_check_ray.functions.codecs import decode_bmp, encode_bmp
    from data_quality_check_ray.stages.multimodal import ImageResizeStage

    img = np.full((20, 14, 3), 77, np.uint8)
    t = pa.table({"payload": pa.array([encode_bmp(img), None], type=pa.binary())})
    out = rd.from_arrow(t).map_batches(
        ImageResizeStage, fn_constructor_kwargs={"out_h": 8, "out_w": 8},
        batch_format="pyarrow", concurrency=1,
    ).to_pandas()
    resized = decode_bmp(out.loc[0, "payload_resized"])
    assert resized.shape == (8, 8, 3) and (resized == 77).all()
    assert out.loc[1, "payload_resized"] is None


def test_audio_stage_wav_decode(quiet_data_context):
    import numpy as np
    import ray.data as rd

    from data_quality_check_ray.functions.codecs import encode_wav_pcm16
    from data_quality_check_ray.stages.multimodal import AudioFrameStage

    amp = 1000
    s = np.empty(2048, np.int16); s[0::2] = amp; s[1::2] = -amp
    t = pa.table({"payload": pa.array([encode_wav_pcm16(s, 22050)], type=pa.binary())})
    out = rd.from_arrow(t).map_batches(
        AudioFrameStage, batch_format="pyarrow", concurrency=1
    ).to_pandas()
    assert out.loc[0, "sample_rate"] == 22050
    assert out.loc[0, "n_frames"] == 2
    assert all(abs(r - amp) < 0.5 for r in out.loc[0, "frame_rms"])


def test_ppm_stream_roundtrip_and_sampling():
    import numpy as np

    from data_quality_check_ray.functions import codecs

    rs = np.random.RandomState(2)
    frames = [rs.randint(0, 256, (h, w, 3), dtype=np.uint8)
              for h, w in ((3, 5), (7, 4), (2, 2), (6, 6), (1, 9))]
    data = codecs.encode_ppm_stream(frames)
    back = list(codecs.iter_ppm_stream(data))
    assert len(back) == 5
    for a, b in zip(frames, back):
        assert np.array_equal(a, b)
    # stride-2 sampling: frames 0, 2, 4
    n, sampled = codecs.sample_ppm_stream(data, stride=2)
    assert n == 5 and len(sampled) == 3
    for a, b in zip([frames[0], frames[2], frames[4]], sampled):
        assert np.array_equal(a, b)
    # stride larger than stream
    n, sampled = codecs.sample_ppm_stream(data, stride=10)
    assert n == 5 and len(sampled) == 1


def test_video_stage(quiet_data_context):
    import numpy as np
    import ray.data as rd

    from data_quality_check_ray.functions.codecs import encode_ppm_stream
    from data_quality_check_ray.stages.multimodal import VideoFrameSampleStage

    black = np.zeros((4, 4, 3), np.uint8)
    red = np.zeros((4, 4, 3), np.uint8); red[:, :, 0] = 255
    white = np.full((4, 4, 3), 255, np.uint8)
    # stride 2 samples frames 0 and 2 -> black, white
    data = encode_ppm_stream([black, red, white])
    t = pa.table({"payload": pa.array([data, None], type=pa.binary())})
    out = rd.from_arrow(t).map_batches(
        VideoFrameSampleStage, batch_format="pyarrow", concurrency=1
    ).to_pandas()
    assert out.loc[0, "n_frames"] == 3 and out.loc[0, "n_sampled"] == 2
    lum = out.loc[0, "frame_luma"]
    assert lum[0] == 0.0 and abs(lum[1] - 255.0) < 0.01
    assert out.loc[1, "n_frames"] == 0


def test_corrupt_payloads_marked_not_fatal(quiet_data_context):
    """Engine philosophy: corrupt payloads MARK the row (nulls), never
    fail the job (the dataset analog of the reference's per-request
    error)."""
    import numpy as np
    import ray.data as rd

    from data_quality_check_ray.functions.codecs import (
        encode_bmp,
        encode_ppm_stream,
        encode_wav_pcm16,
    )
    from data_quality_check_ray.stages.multimodal import (
        AudioFrameStage,
        ImageFeatureStage,
        ImageResizeStage,
        VideoFrameSampleStage,
    )

    def collect(ds):
        return pa.concat_tables(
            ds.iter_batches(batch_size=None, batch_format="pyarrow"))

    ok_img = encode_bmp(np.full((4, 4, 3), 9, np.uint8))
    bad_bmp = ok_img[:30]                       # truncated header/pixels
    bad_ppm = b"P6\n5 5\n255\n" + b"\x00" * 3   # payload too short
    t = pa.table({"payload": pa.array([ok_img, bad_bmp, bad_ppm], type=pa.binary())})
    out = collect(rd.from_arrow(t).map_batches(
        ImageFeatureStage, batch_format="pyarrow", concurrency=1))
    assert out["height"][0].as_py() == 4
    assert out["height"][1].as_py() is None
    assert out["mean_rgb"][2].as_py() is None

    outr = rd.from_arrow(t).map_batches(
        ImageResizeStage, batch_format="pyarrow", concurrency=1).to_pandas()
    assert outr.loc[0, "payload_resized"] is not None
    assert outr.loc[1, "payload_resized"] is None

    ok_vid = encode_ppm_stream([np.full((2, 2, 3), 5, np.uint8)])
    tv = pa.table({"payload": pa.array([ok_vid, b"P6 garbage"], type=pa.binary())})
    outv = collect(rd.from_arrow(tv).map_batches(
        VideoFrameSampleStage, batch_format="pyarrow", concurrency=1))
    assert outv["n_frames"][0].as_py() == 1
    assert outv["n_frames"][1].as_py() is None

    ok_wav = encode_wav_pcm16(np.ones(100, np.int16), 8000)
    ta = pa.table({"payload": pa.array([ok_wav, b"RIFFbroken"], type=pa.binary())})
    outa = collect(rd.from_arrow(ta).map_batches(
        AudioFrameStage, batch_format="pyarrow", concurrency=1))
    assert outa["sample_rate"][0].as_py() == 8000
    assert outa["sample_rate"][1].as_py() is None


def test_zero_dimension_payloads_marked(quiet_data_context):
    """Regression: a 0-width PPM / degenerate BMP header must be marked,
    not crash resize with an IndexError."""
    import ray.data as rd

    from data_quality_check_ray.stages.multimodal import ImageResizeStage

    zero_ppm = b"P6\n0 5\n255\n"
    t = pa.table({"payload": pa.array([zero_ppm], type=pa.binary())})
    out = pa.concat_tables(
        rd.from_arrow(t).map_batches(
            ImageResizeStage, batch_format="pyarrow", concurrency=1
        ).iter_batches(batch_size=None, batch_format="pyarrow"))
    assert out["payload_resized"][0].as_py() is None
