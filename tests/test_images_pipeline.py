"""Image payload pipeline: decode invariants over a real crawl's references."""

import pytest

from crusty_ray.config import test_config as _tc
from crusty_ray.datagen.webgraph import WebConfig

WEB_CFG = WebConfig(n_domains=40, max_pages_per_domain=10)


@pytest.fixture(scope="module")
def crawl_out(ray_session, tmp_path_factory):
    from crusty_ray.pipelines.crawl import CrawlEngine
    cfg = _tc()
    cfg.rules.total_link_budget = 20
    cfg.rules.links_per_task_budget = 8
    cfg.rules.max_level = 5
    out = str(tmp_path_factory.mktemp("crawl"))
    CrawlEngine(cfg, WEB_CFG, out).run(15)
    return out


def test_image_pipeline_invariants(ray_session, crawl_out, tmp_path):
    from crusty_ray.pipelines.images import run_image_pipeline
    cfg = _tc()
    summary = run_image_pipeline(f"{crawl_out}/crawl_log", str(tmp_path / "images"),
                                 WEB_CFG, cfg)
    assert summary["n_images"] > 10
    assert summary["decode_ok_rate"] == 1.0
    assert summary["caption_ok_rate"] == 1.0
    assert summary["min_lossy_psnr_db"] >= 40.0
    assert summary["max_phash_dist"] <= 8


def test_image_table_schema(ray_session, crawl_out, tmp_path):
    import pyarrow.dataset as pads
    from crusty_ray.pipelines.images import IMAGE_SCHEMA, run_image_pipeline
    out = str(tmp_path / "img2")
    run_image_pipeline(f"{crawl_out}/crawl_log", out, WEB_CFG, _tc())
    t = pads.dataset(out, format="parquet").to_table()
    assert set(t.column_names) == set(IMAGE_SCHEMA.names)
    # input_hint columns all present with right types
    assert t.schema.field("bytes").type == "binary"
    assert t.schema.field("phash").type == "int64"
    # one row per distinct referenced image
    ids = t["image_id"].to_pylist()
    assert len(ids) == len(set(ids))


def test_image_channel_stats_exact(ray_session, crawl_out, tmp_path):
    """Distributed channel stats == serial Python-int oracle over the same
    stored table, exactly (integer algebraic moments commute)."""
    import pyarrow.dataset as pads
    from crusty_ray.codecs.images import decode_image
    from crusty_ray.ops.multimodal import image_channel_stats
    from crusty_ray.pipelines.images import run_image_pipeline

    out = str(tmp_path / "img3")
    run_image_pipeline(f"{crawl_out}/crawl_log", out, WEB_CFG, _tc())
    got = image_channel_stats(out).sort_values("channel") \
        .reset_index(drop=True)

    t = pads.dataset(out, format="parquet").to_table()
    n = [0, 0, 0]
    s = [0, 0, 0]
    ss = [0, 0, 0]
    for blob, fmt in zip(t["bytes"].to_pylist(), t["fmt"].to_pylist()):
        px = decode_image(blob, fmt).astype("int64")
        for c in range(3):
            ch = px[:, :, c]
            n[c] += int(ch.size)
            s[c] += int(ch.sum())
            ss[c] += int((ch * ch).sum())
    assert got["channel"].tolist() == [0, 1, 2]
    for c in range(3):
        row = got.iloc[c]
        assert int(row["n_pixels"]) == n[c]
        assert int(row["sum_val"]) == s[c]
        assert int(row["sum_sq"]) == ss[c]
        assert int(row["mean_pm"]) == (1000 * s[c]) // n[c]
        assert int(row["var_pm"]) == \
            (1000 * (n[c] * ss[c] - s[c] * s[c])) // (n[c] * n[c])
    # sane range: means strictly inside (0, 255) per-mille scale
    assert all(0 < m < 255_000 for m in got["mean_pm"])


def test_image_patch_grid_exact(ray_session, crawl_out, tmp_path):
    """Distributed patchify == serial Python-int oracle, exactly; full
    g x g coverage per decodable image."""
    import pyarrow.dataset as pads
    from crusty_ray.codecs.images import decode_image
    from crusty_ray.ops.multimodal import image_patch_grid
    from crusty_ray.pipelines.images import run_image_pipeline
    import numpy as np

    out = str(tmp_path / "img4")
    run_image_pipeline(f"{crawl_out}/crawl_log", out, WEB_CFG, _tc())
    g = 4
    got = image_patch_grid(out, grid=g).to_pandas() \
        .set_index(["image_id", "patch_row", "patch_col"]).sort_index()

    t = pads.dataset(out, format="parquet").to_table()
    n_img = 0
    w601 = np.array([299, 587, 114], dtype=np.int64)
    for iid, blob, fmt in zip(t["image_id"].to_pylist(),
                              t["bytes"].to_pylist(), t["fmt"].to_pylist()):
        px = decode_image(blob, fmt).astype(np.int64)
        n_img += 1
        h, w = px.shape[:2]
        lum = px @ w601
        for r in range(g):
            for c in range(g):
                p = lum[(r * h) // g:((r + 1) * h) // g,
                        (c * w) // g:((c + 1) * w) // g]
                assert int(got.loc[(iid, r, c), "mean_millilum"]) == \
                    int(p.sum()) // int(p.size)
    assert len(got) == n_img * g * g  # every image fully covered


def test_image_augment_exact(ray_session, crawl_out, tmp_path):
    """Distributed augmentation manifest == serial transforms, md5-exact;
    involutions hold (flip twice == identity on the raw pixels)."""
    import hashlib

    import pyarrow.dataset as pads
    import numpy as np
    from crusty_ray.codecs.images import decode_image
    from crusty_ray.ops.multimodal import _augment, image_augment
    from crusty_ray.pipelines.images import run_image_pipeline

    out = str(tmp_path / "img5")
    run_image_pipeline(f"{crawl_out}/crawl_log", out, WEB_CFG, _tc())
    got = image_augment(out).to_pandas() \
        .set_index(["image_id", "aug"]).sort_index()

    t = pads.dataset(out, format="parquet").to_table()
    n = 0
    for iid, blob, fmt in zip(t["image_id"].to_pylist(),
                              t["bytes"].to_pylist(), t["fmt"].to_pylist()):
        px = decode_image(blob, fmt)
        for aug in ("flip_h", "rot180", "crop_center"):
            o = np.ascontiguousarray(_augment(px, aug))
            row = got.loc[(iid, aug)]
            assert row["pixel_md5"] == hashlib.md5(o.tobytes()).hexdigest()
            assert (int(row["h"]), int(row["w"])) == o.shape[:2]
            n += 1
        # involution sanity on the raw arrays
        assert (_augment(_augment(px, "flip_h"), "flip_h") == px).all()
        assert (_augment(_augment(px, "rot180"), "rot180") == px).all()
    assert len(got) == n


def test_wide_binary_rows_small_batches(ray_session, tmp_path):
    """SURVEY §7.4.5: large image payloads with small decode batches — the
    pipeline streams wide binary rows without blowing up block sizes."""
    import pyarrow.dataset as pads
    import ray
    from crusty_ray.datagen.webgraph import WebConfig
    from crusty_ray.pipelines.images import ImageFetchStage

    big_cfg = WebConfig(n_domains=4, img_min=256, img_max=384)  # ~0.2-0.4 MB rows
    ids = [f"im{i}_0_0" for i in range(24)]
    ds = ray.data.from_items([{"image_id": i} for i in ids])
    ds = ds.map_batches(ImageFetchStage(big_cfg), batch_format="pyarrow",
                        batch_size=4)  # small batches for wide rows
    out = str(tmp_path / "wide")
    ds.write_parquet(out)
    t = pads.dataset(out, format="parquet").to_table()
    assert t.num_rows == 24
    assert t["decode_ok"].to_pylist() == [True] * 24
    sizes = [len(b) for b in t["bytes"].to_pylist()]
    assert min(sizes) > 50_000  # genuinely wide rows
    lossy = [p for p, f in zip(t["psnr_db"].to_pylist(), t["fmt"].to_pylist())
             if f != "png"]
    assert all(p >= 40.0 for p in lossy)
