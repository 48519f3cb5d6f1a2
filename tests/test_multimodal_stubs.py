"""Multimodal stage plumbing (ops/multimodal.py).

The decode/resize path is real (tested also via the image pipeline); the
audio-feature and frame-sample stages are honest STUBS for libs absent from
this container — these tests pin the *plumbing contract* that a real codec
swap must keep: schema in/out, actor-pool signature, batch flow,
determinism, and per-row (not per-batch) failure isolation.
"""

import numpy as np
import pyarrow as pa

import ray

from crusty_ray.ops.multimodal import (AudioFeatureStub, DecodeResizeStage,
                                       frame_sample_stub, resize_nearest)


def _audio_table(n=10):
    return pa.table({
        "clip_id": [f"c{i}" for i in range(n)],
        "bytes": [bytes([i % 251]) * (50 + i) for i in range(n)],
        "sr": pa.array([16000] * n, pa.int32()),
    })


def test_audio_stub_actor_pool_schema(ray_session):
    ds = ray.data.from_arrow(_audio_table()) \
        .map_batches(AudioFeatureStub, batch_format="pyarrow",
                     batch_size=4, concurrency=2)
    t = ds.take_all()
    assert len(t) == 10
    for row in t:
        assert len(row["features"]) == AudioFeatureStub.N_MFCC
        assert np.asarray(row["features"]).dtype == np.float32 or \
            all(isinstance(x, float) for x in row["features"])
    # deterministic: same blob → same features, independent of batching
    ds2 = ray.data.from_arrow(_audio_table()) \
        .map_batches(AudioFeatureStub(), batch_format="pyarrow",
                     batch_size=10)  # instance → task mode, same contract
    assert [r["features"] for r in ds.sort("clip_id").take_all()] == \
           [r["features"] for r in ds2.sort("clip_id").take_all()]


def test_frame_sample_stub_schema(ray_session):
    t = pa.table({"video_id": ["v0", "v1"],
                  "bytes": [b"\x00" * 100, b"\x01" * 200]})
    ds = ray.data.from_arrow(t).map_batches(
        frame_sample_stub(8), batch_format="pyarrow", batch_size=1)
    rows = ds.sort("video_id").take_all()
    for r in rows:
        assert len(r["frame_indices"]) == 8
        assert list(r["frame_indices"]) == sorted(r["frame_indices"])
    # deterministic per blob
    rows2 = ray.data.from_arrow(t).map_batches(
        frame_sample_stub(8), batch_format="pyarrow").sort("video_id").take_all()
    assert [r["frame_indices"] for r in rows] == \
           [r["frame_indices"] for r in rows2]


def test_decode_stage_isolates_bad_rows(ray_session):
    """An undecodable blob yields decode_ok=false on THAT row only."""
    from crusty_ray.codecs.images import encode_image
    good = encode_image(np.zeros((4, 4, 3), dtype=np.uint8), "png")
    t = pa.table({
        "image_id": ["good", "bad", "external_fmt"],
        "bytes": [good, b"\xde\xad\xbe\xef", b"GIF89a...."],
        "fmt": ["png", "png", "gif"],
    })
    out = ray.data.from_arrow(t).map_batches(
        DecodeResizeStage, batch_format="pyarrow", batch_size=3,
        concurrency=1).sort("image_id").take_all()
    by_id = {r["image_id"]: r for r in out}
    assert by_id["good"]["decode_ok"] and by_id["good"]["thumb_png"]
    assert not by_id["bad"]["decode_ok"]
    assert not by_id["external_fmt"]["decode_ok"]  # NotImplementedError path


def test_resize_nearest_math():
    px = np.arange(6 * 4 * 3, dtype=np.uint8).reshape(6, 4, 3)
    out = resize_nearest(px, 2, 3)
    assert out.shape == (3, 2, 3)
    assert (out[0, 0] == px[0, 0]).all()
