"""export_image_shards: gate → dedup → byte-budget shard export, verified
against a serial brute-force plan and a read-back of the written shards."""

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _images_df(n=120, seed=9):
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        iid = f"im{i:04d}"
        w, h = int(rng.integers(8, 200)), int(rng.integers(8, 200))
        payload = rng.bytes(int(rng.integers(200, 3000)))
        rows.append({
            "image_id": iid, "bytes": payload, "w": w, "h": h,
            "fmt": str(rng.choice(["png", "qoi", "jpegish"])),
            "caption": "a caption long enough" if rng.random() > 0.15 else "x",
            # force exact-dup groups: every 10th image shares a phash triple
            "phash": int(i // 10 if i % 3 == 0 else 10_000 + i),
            "n_bytes": len(payload),
            "psnr_db": 50.0, "caption_ok": True, "phash_dist": 0,
            "decode_ok": bool(rng.random() > 0.1),
        })
    df = pd.DataFrame(rows)
    # dup groups must share (phash, w, h) to be exact dups
    for g in range(4):
        idx = df.index[df["phash"] == g]
        if len(idx) > 1:
            df.loc[idx, "w"] = 64
            df.loc[idx, "h"] = 64
    return df


def _brute(df, shard_bytes, min_w=32, min_h=32, max_aspect_pm=3000,
           min_caption_chars=8):
    d = df.copy()
    aspect_pm = (np.maximum(d.w, d.h) * 1000
                 // np.maximum(np.minimum(d.w, d.h), 1))
    ok = (d.decode_ok & (d.w >= min_w) & (d.h >= min_h)
          & (aspect_pm <= max_aspect_pm)
          & (d.caption.str.len() >= min_caption_chars))
    d = d[ok].sort_values("image_id")
    d = d.groupby(["phash", "w", "h"], as_index=False).first()
    d["key"] = [int.from_bytes(hashlib.md5(i.encode()).digest()[:8], "big")
                & ((1 << 63) - 1) for i in d["image_id"]]
    d = d.sort_values(["key", "image_id"]).reset_index(drop=True)
    excl = d["n_bytes"].cumsum().shift(fill_value=0)
    d["shard_id"] = (excl // shard_bytes).astype("int64")
    return d[["image_id", "n_bytes", "shard_id"]]


@pytest.fixture()
def images_parquet(tmp_path):
    df = _images_df()
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   tmp_path / "images.parquet")
    return str(tmp_path / "images.parquet"), df


def test_summary_matches_bruteforce(ray_session, images_parquet):
    from crusty_ray.ops.pack import export_image_shards
    path, df = images_parquet
    budget = 20_000
    got = export_image_shards(path, out_dir=None, shard_bytes=budget) \
        .to_pandas().sort_values("shard_id").reset_index(drop=True)
    exp = _brute(df, budget).groupby("shard_id", as_index=False).agg(
        n_images=("image_id", "size"), total_bytes=("n_bytes", "sum"))
    pd.testing.assert_frame_equal(
        got.astype("int64"), exp.astype("int64"), check_dtype=False)
    assert got["shard_id"].nunique() > 2  # the budget actually splits


def test_written_shards_roundtrip(ray_session, images_parquet, tmp_path):
    import pyarrow.dataset as pads
    from crusty_ray.ops.pack import export_image_shards
    path, df = images_parquet
    budget = 20_000
    out = str(tmp_path / "shards")
    export_image_shards(path, out_dir=out, shard_bytes=budget).to_pandas()
    back = pads.dataset(out, format="parquet", partitioning="hive") \
        .to_table().to_pandas()
    exp = _brute(df, budget)
    # every exported row carries its assignment and the exact payload
    assert sorted(back["image_id"]) == sorted(exp["image_id"])
    m = back.merge(exp, on="image_id", suffixes=("", "_exp"))
    assert (m["shard_id"].astype("int64")
            == m["shard_id_exp"].astype("int64")).all()
    orig = df.set_index("image_id")["bytes"]
    assert all(bytes(b) == orig[i]
               for i, b in zip(back["image_id"], back["bytes"]))


def test_deterministic(ray_session, images_parquet):
    from crusty_ray.ops.pack import export_image_shards
    path, _ = images_parquet
    a = export_image_shards(path, None, shard_bytes=9_000).to_pandas() \
        .sort_values("shard_id").reset_index(drop=True)
    b = export_image_shards(path, None, shard_bytes=9_000).to_pandas() \
        .sort_values("shard_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
