"""Multimodal stage tests: decode plumbing, model actor, frame sampling.

The decoders are deterministic stubs (image/audio codecs absent here);
these tests pin the REAL parts — schemas, batch plumbing, determinism,
flat_map shape — so a codec swap is a one-function change."""

import numpy as np
import pyarrow as pa
import pytest

from gdal_ray.stages import multimodal as mm


def _media_ds(ray_session, n=50):
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "url": pa.array([f"u{i}" for i in range(n)]),
        "media": pa.array([f"payload-{i}".encode() * (i + 1)
                           for i in range(n)], pa.binary()),
    })).repartition(4)


def test_fake_decoder_deterministic_and_shaped():
    a = mm.fake_image_decoder(b"hello")
    b = mm.fake_image_decoder(b"hello")
    c = mm.fake_image_decoder(b"other")
    assert a.shape == mm.IMAGE_SHAPE and a.dtype == np.float32
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)
    assert 0.0 <= a.min() and a.max() < 1.0


def test_real_decoder_stub_raises():
    with pytest.raises(NotImplementedError):
        mm.real_image_decoder(b"x")


def test_decode_stage_schema(ray_session):
    out = mm.decode_stage(_media_ds(ray_session), concurrency=1) \
        .take_batch(10, batch_format="pyarrow")
    assert "media" not in out.column_names
    assert isinstance(out.schema.field("tensor").type, pa.FixedSizeListType)
    assert out.schema.field("tensor").type.list_size == \
        int(np.prod(mm.IMAGE_SHAPE))
    assert out["tensor_shape"][0].as_py() == list(mm.IMAGE_SHAPE)


def test_decode_then_feature_deterministic(ray_session):
    ds = _media_ds(ray_session)
    runs = []
    for _ in range(2):
        emb = mm.feature_stage(mm.decode_stage(ds, concurrency=1),
                               concurrency=1).to_pandas()
        emb = emb.sort_values("url").reset_index(drop=True)
        runs.append(np.stack(emb["embedding"].values))
    np.testing.assert_array_equal(runs[0], runs[1])
    assert runs[0].shape == (50, 64)
    assert np.isfinite(runs[0]).all()


def test_frame_sample_flatmap_shape(ray_session):
    import zlib

    out = mm.frame_sample_stage(_media_ds(ray_session), n_frames=4) \
        .to_pandas()
    assert len(out) == 50 * 4
    per = out.groupby("url")["frame_idx"].apply(
        lambda s: sorted(s.tolist()))
    assert all(v == [0, 1, 2, 3] for v in per)
    # frames decompress and partition the source payload in order
    sub = out[out["url"] == "u3"].sort_values("frame_idx")
    joined = b"".join(zlib.decompress(f) for f in sub["frame"])
    assert (b"payload-3" * 4).startswith(joined[:9])
    assert joined  # non-empty


def test_audio_window_stage(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from gdal_ray.stages.multimodal import audio_window_stage

    blob = bytes(range(256)) * 40  # 10240 bytes
    ds = rd.from_arrow(pa.table({
        "url": pa.array(["u1", "u2"]),
        "media": pa.array([blob, b""], pa.binary()),
    }))
    out = audio_window_stage(ds, window_bytes=4096,
                             hop_bytes=2048).to_pandas()
    u1 = out[out["url"] == "u1"].sort_values("window_idx")
    # hops: 0,2048,4096,6144,8192 → 5 windows; last two truncated
    assert list(u1["window_idx"]) == [0, 1, 2, 3, 4]
    assert list(u1["n_bytes"]) == [4096, 4096, 4096, 4096, 2048]
    # overlap: second half of window 0 == first half of window 1
    w0 = u1.iloc[0]["window"]; w1 = u1.iloc[1]["window"]
    assert w0[2048:] == w1[:2048]
    # empty media yields exactly one empty window
    u2 = out[out["url"] == "u2"]
    assert len(u2) == 1 and u2.iloc[0]["n_bytes"] == 0
