"""Multimodal stage plumbing (ops/multimodal.py).

The decode/resize path is real (tested also via the image pipeline); the
audio-feature and frame-sample stages are REAL over the deterministic
raw-AV containers (codecs/av.py) — these tests pin the DSP math against
direct recomputes, the seek-decode ≡ full-decode frame identity, schema
in/out, actor-pool signature, determinism, and per-row failure isolation.
"""

import numpy as np
import pyarrow as pa

import ray

from crusty_ray.ops.multimodal import (AudioFeatureStub, DecodeResizeStage,
                                       frame_sample_stub, resize_nearest)


def _audio_table(n=10):
    from crusty_ray.codecs.av import synth_audio
    return pa.table({
        "clip_id": [f"c{i:02d}" for i in range(n)],
        "bytes": pa.array([synth_audio(i) for i in range(n)], pa.binary()),
    })


def test_audio_features_real_dsp(ray_session):
    from crusty_ray.codecs.av import decode_rawa, synth_audio
    from crusty_ray.ops.multimodal import AudioFeatureStage

    ds = ray.data.from_arrow(_audio_table()) \
        .map_batches(AudioFeatureStage, batch_format="pyarrow",
                     batch_size=4, concurrency=2)
    rows = ds.sort("clip_id").take_all()
    assert len(rows) == 10
    for i, row in enumerate(rows):
        assert row["audio_ok"]
        f = np.asarray(row["features"], dtype=np.float64)
        assert len(f) == AudioFeatureStage.N_FEATURES
        samples, rate = decode_rawa(synth_audio(i))
        # real DSP: duration and RMS match a direct recompute
        assert abs(f[0] - 1000.0 * len(samples) / rate) < 0.5
        x = samples.astype(np.float64)
        assert abs(f[1] - np.sqrt(np.mean(x * x))) < 1.0
        assert f[2] <= 32768 and f[3] > 0
        # the planted tones put real energy in the spectrum
        assert f[4:].sum() > 0
    # deterministic and batching-independent
    ds2 = ray.data.from_arrow(_audio_table()) \
        .map_batches(AudioFeatureStage(), batch_format="pyarrow",
                     batch_size=10)
    assert [r["features"] for r in rows] == \
           [r["features"] for r in ds2.sort("clip_id").take_all()]
    # a non-rawa blob flags, zero-fills, and poisons nothing
    bad = pa.table({"clip_id": ["bad"],
                    "bytes": pa.array([b"notaudio"], pa.binary())})
    r = ray.data.from_arrow(bad).map_batches(
        AudioFeatureStage(), batch_format="pyarrow").take_all()[0]
    assert not r["audio_ok"] and not any(r["features"])


def test_video_frame_sampling_seeks_real_frames(ray_session):
    from crusty_ray.codecs.av import (decode_rawv, decode_rawv_frame,
                                      synth_video)
    from crusty_ray.codecs.images import decode_image
    from crusty_ray.ops.multimodal import (VideoFrameSampleStage,
                                           frame_sample_stub,
                                           resize_nearest)

    t = pa.table({"video_id": ["v0", "v1", "bad"],
                  "bytes": pa.array([synth_video(0), synth_video(1),
                                     b"notvideo"], pa.binary())})
    rows = ray.data.from_arrow(t).map_batches(
        VideoFrameSampleStage, batch_format="pyarrow", batch_size=1,
        concurrency=1).sort("video_id").take_all()
    by_id = {r["video_id"]: r for r in rows}
    assert not by_id["bad"]["video_ok"]
    assert list(by_id["bad"]["frame_indices"]) == []
    for vid, mid in (("v0", 0), ("v1", 1)):
        r = by_id[vid]
        assert r["video_ok"]
        idx = list(r["frame_indices"])
        assert idx == sorted(set(idx))
        blob = synth_video(mid)
        full = decode_rawv(blob)
        for i, png in zip(idx, r["frame_pngs"]):
            # seek-decode ≡ full-decode's frame, and the emitted PNG is
            # exactly the resized true frame (png is lossless)
            frame = decode_rawv_frame(blob, i)
            np.testing.assert_array_equal(frame, full[i])
            np.testing.assert_array_equal(
                decode_image(bytes(png), "png"),
                resize_nearest(frame, 8, 8))
    # the compat shim drives the same real stage
    rows2 = ray.data.from_arrow(t).map_batches(
        frame_sample_stub(4), batch_format="pyarrow").sort("video_id") \
        .take_all()
    assert [list(r["frame_indices"]) for r in rows2] == \
           [list(by_id[r["video_id"]]["frame_indices"]) for r in rows2]


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


class TestImageFeatureStage:
    def test_features_match_direct_numpy(self, ray_session):
        import numpy as np
        import pyarrow as pa
        import ray as _ray

        from crusty_ray.codecs.images import decode_image, encode_image
        from crusty_ray.ops.multimodal import ImageFeatureStage

        rng = np.random.default_rng(3)
        pixels = [rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
                  for h, w in [(8, 8), (5, 17), (1, 1), (32, 4)]]
        blobs = [encode_image(p, "png") for p in pixels]
        t = pa.table({
            "image_id": [f"i{k}" for k in range(len(blobs))],
            "bytes": pa.array(blobs, pa.binary()),
            "fmt": ["png"] * len(blobs),
        })
        out = _ray.data.from_arrow(t).map_batches(
            ImageFeatureStage, batch_format="pyarrow", batch_size=2,
            concurrency=2).to_pandas().sort_values("image_id")
        stage = ImageFeatureStage()
        for k, row in enumerate(out.itertuples()):
            want = stage._features(blobs[k], "png")
            got = np.asarray(row.features, dtype=np.float32)
            assert row.feat_ok
            assert len(got) == ImageFeatureStage.N_FEATURES
            np.testing.assert_array_equal(got, want)
        # png roundtrip is lossless → features reflect the true pixels
        np.testing.assert_array_equal(decode_image(blobs[0], "png"),
                                      pixels[0])

    def test_undecodable_rows_flagged_not_poisoned(self, ray_session):
        import numpy as np
        import pyarrow as pa
        import ray as _ray

        from crusty_ray.ops.multimodal import ImageFeatureStage
        t = pa.table({
            "image_id": ["bad", "alsobad"],
            "bytes": pa.array([b"notanimage", None], pa.binary()),
            "fmt": ["png", "gif"],
        })
        out = _ray.data.from_arrow(t).map_batches(
            ImageFeatureStage, batch_format="pyarrow",
            batch_size=2, concurrency=1).to_pandas()
        assert (~out["feat_ok"]).all()
        assert all(np.allclose(f, 0.0) for f in out["features"])


class TestImageFeatureNearDups:
    def _images_table(self, tmp_path, n=24, n_dup_pairs=6):
        """Small image table with known near-dup structure: dup pairs are
        the same pixels re-encoded (identical features), the rest random."""
        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pq

        from crusty_ray.codecs.images import encode_image

        rng = np.random.default_rng(11)
        rows = []
        for k in range(n):
            px = rng.integers(0, 256, (12, 16, 3), dtype=np.uint8)
            rows.append((f"im{k:03d}", px))
            if k < n_dup_pairs:
                rows.append((f"im{k:03d}_copy", px))
        t = pa.table({
            "image_id": [r[0] for r in rows],
            "bytes": pa.array([encode_image(r[1], "png") for r in rows],
                              pa.binary()),
            "fmt": ["png"] * len(rows),
        })
        path = str(tmp_path / "imgs")
        import os
        os.makedirs(path, exist_ok=True)
        pq.write_table(t, f"{path}/part0.parquet")
        return path, rows

    def _brute_pairs(self, rows, threshold_pm):
        import numpy as np

        from crusty_ray.ops.multimodal import ImageFeatureStage
        stage = ImageFeatureStage()
        from crusty_ray.codecs.images import encode_image
        ids = [r[0] for r in rows]
        feats = np.stack([stage._features(encode_image(r[1], "png"), "png")
                          for r in rows]).astype(np.float64)
        norms = np.linalg.norm(feats, axis=1, keepdims=True)
        nv = feats / np.where(norms == 0.0, 1.0, norms)
        pm = np.floor((nv @ nv.T) * 1000.0).astype(np.int64)
        want = set()
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                if pm[i, j] >= threshold_pm:
                    a, b = sorted((ids[i], ids[j]))
                    want.add((a, b, int(pm[i, j])))
        return want

    def test_single_bucket_equals_brute_force(self, ray_session, tmp_path):
        from crusty_ray.ops.multimodal import image_feature_near_dups
        path, rows = self._images_table(tmp_path)
        got = image_feature_near_dups(path, threshold_pm=950, n_planes=0,
                                      n_tables=1).to_pandas()
        got_set = {(r.image_a, r.image_b, int(r.sim_pm))
                   for r in got.itertuples()}
        assert got_set == self._brute_pairs(rows, 950)

    def test_lsh_tables_subset_with_full_dup_recall(self, ray_session,
                                                    tmp_path):
        from crusty_ray.ops.multimodal import image_feature_near_dups
        path, rows = self._images_table(tmp_path)
        got = image_feature_near_dups(path, threshold_pm=950, n_planes=6,
                                      n_tables=3).to_pandas()
        got_set = {(r.image_a, r.image_b, int(r.sim_pm))
                   for r in got.itertuples()}
        want = self._brute_pairs(rows, 950)
        # LSH emits a SUBSET of true pairs (precision 1 by construction)...
        assert got_set <= want
        # ...and identical vectors always share every bucket → exact copies
        # are found with recall 1 regardless of the planes drawn
        exact = {(f"im{k:03d}", f"im{k:03d}_copy") for k in range(6)}
        assert exact <= {(a, b) for a, b, _ in got_set}

    def test_stop_hash_cap_skips_hot_bucket(self, ray_session, tmp_path):
        from crusty_ray.ops.multimodal import image_feature_near_dups
        path, rows = self._images_table(tmp_path)
        # n_planes=0, one table → every row in ONE bucket; cap below the
        # row count → bucket skipped whole → zero pairs, deterministically
        got = image_feature_near_dups(path, threshold_pm=950, n_planes=0,
                                      n_tables=1, max_bucket=4).to_pandas()
        assert len(got) == 0


def test_video_phash_near_dups_planted(ray_session):
    """Planted time-shifted copies: clips congruent mod 16 share footage;
    with 6 sampled frames and shift 2, Δ=1 pairs share 5 frame hashes,
    Δ=2 pairs share 4 — all ≥ min_shared=4, and NO cross-base pair may
    appear (unrelated random frames never collide on phash64 here)."""
    from crusty_ray.codecs.av import synth_video_overlapping
    from crusty_ray.ops.multimodal import video_phash_near_dups

    n = 48  # 16 bases x 3 shifted copies
    t = pa.table({
        "video_id": pa.array(np.arange(n, dtype=np.int64)),
        "bytes": pa.array([synth_video_overlapping(i) for i in range(n)],
                          pa.binary())})
    got = video_phash_near_dups(ray.data.from_arrow(t), min_shared=4) \
        .to_pandas()
    want = set()
    for base in range(16):
        ids = [base, base + 16, base + 32]
        want |= {(ids[0], ids[1], 5), (ids[1], ids[2], 5),
                 (ids[0], ids[2], 4)}
    got_set = {(int(r.video_a), int(r.video_b), int(r.n_shared))
               for r in got.itertuples()}
    assert got_set == want


def test_video_near_dups_stop_hash_cap(ray_session):
    """A frame hash shared by more clips than max_bucket is skipped whole
    — deterministically zero pairs when every bucket is over-cap."""
    from crusty_ray.codecs.av import synth_video_overlapping
    from crusty_ray.ops.multimodal import video_phash_near_dups

    # base_mod=1: every clip is shifted footage of ONE base — frame
    # hashes repeat across many clips, so buckets are large
    n = 8
    t = pa.table({
        "video_id": pa.array(np.arange(n, dtype=np.int64)),
        "bytes": pa.array([synth_video_overlapping(i, base_mod=1,
                                                   shift=0)
                           for i in range(n)], pa.binary())})
    uncapped = video_phash_near_dups(ray.data.from_arrow(t),
                                     min_shared=4).to_pandas()
    assert len(uncapped) == n * (n - 1) // 2  # identical clips: all pairs
    capped = video_phash_near_dups(ray.data.from_arrow(t), min_shared=4,
                                   max_bucket=4).to_pandas()
    assert len(capped) == 0


class TestMultimodalEpoch:
    """ONE-scan epoch (MultimodalEpochStage): per-modality outputs must be
    bit-identical to the three separate stages on the same payloads."""

    def _rows(self, n=6):
        from crusty_ray.codecs.av import synth_audio, synth_video
        from crusty_ray.codecs.images import encode_image
        rng = np.random.RandomState(5)
        imgs = [rng.randint(0, 256, (12, 14, 3)).astype(np.uint8)
                for _ in range(n)]
        return pa.table({
            "image_id": [f"im{i}" for i in range(n)],
            "bytes": pa.array([encode_image(px, "png") for px in imgs],
                              pa.binary()),
            "fmt": ["png"] * n,
            "audio_bytes": pa.array([synth_audio(100 + i)
                                     for i in range(n)], pa.binary()),
            "video_bytes": pa.array([synth_video(200 + i)
                                     for i in range(n)], pa.binary()),
        })

    def test_matches_individual_stages(self):
        from crusty_ray.codecs.images import phash64
        from crusty_ray.codecs.av import decode_rawv_frame
        from crusty_ray.ops.multimodal import (AudioFeatureStage,
                                               ImageFeatureStage,
                                               MultimodalEpochStage,
                                               VideoFrameSampleStage)
        t = self._rows()
        combined = MultimodalEpochStage()(t)

        img = ImageFeatureStage()(t.select(["image_id", "bytes", "fmt"]))
        assert combined["features"].to_pylist() == \
            img["features"].to_pylist()
        assert combined["feat_ok"].to_pylist() == img["feat_ok"].to_pylist()

        aud = AudioFeatureStage()(pa.table({
            "bytes": t["audio_bytes"]}))
        assert combined["audio_features"].to_pylist() == \
            aud["features"].to_pylist()

        vid = VideoFrameSampleStage()(pa.table({"bytes": t["video_bytes"]}))
        assert combined["frame_indices"].to_pylist() == \
            vid["frame_indices"].to_pylist()
        # phashes of the SAME sampled frames, recomputed directly
        for row, (idxs, blob) in enumerate(zip(
                vid["frame_indices"].to_pylist(),
                t["video_bytes"].to_pylist())):
            want = [int(phash64(decode_rawv_frame(blob, i))) for i in idxs]
            want = [(h - (1 << 64)) if h >= (1 << 63) else h for h in want]
            assert combined["frame_phashes"].to_pylist()[row] == want

    def test_bad_rows_isolate_per_modality(self):
        t = self._rows(3)
        t = t.set_column(t.column_names.index("audio_bytes"), "audio_bytes",
                         pa.array([b"junk", t["audio_bytes"][1].as_py(),
                                   b""], pa.binary()))
        from crusty_ray.ops.multimodal import MultimodalEpochStage
        out = MultimodalEpochStage()(t)
        assert out["audio_ok"].to_pylist() == [False, True, False]
        assert out["feat_ok"].to_pylist() == [True, True, True]
        assert out["video_ok"].to_pylist() == [True, True, True]

    def test_epoch_ds_runs_one_pass(self, ray_session, tmp_path):
        import pyarrow.parquet as pq
        from crusty_ray.ops.multimodal import multimodal_epoch_ds
        t = self._rows(10).select(["image_id", "bytes", "fmt"])
        pq.write_table(t, tmp_path / "images.parquet")
        out = multimodal_epoch_ds(str(tmp_path), n_rows=10).to_pandas()
        assert len(out) == 10
        assert set(out.columns) >= {"image_id", "features", "feat_ok",
                                    "audio_features", "audio_ok",
                                    "frame_indices", "frame_phashes",
                                    "video_ok"}
        assert out["feat_ok"].all() and out["audio_ok"].all() \
            and out["video_ok"].all()
