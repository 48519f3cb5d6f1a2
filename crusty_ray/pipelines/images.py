"""Image payload pipeline — fetch/decode/verify the image+caption rows.

The north_rule's payload leg: every fetched image row must satisfy
decoded-pixel allclose (PSNR ≥ 40 dB for lossy formats) + exact caption
equality, over a Lance-shaped table ``images(image_id, bytes, w, h, fmt,
caption, phash)`` (BASELINE.json ``input_hint``).

Pipeline (all streaming, zero-copy Arrow):

  read crawl_log → explode ``image_ids`` (per-batch flat_map) → dedup by
  hash-partitioned groupby-first → ``map_batches(ImageFetchStage,
  concurrency=N, batch_size=decode_batch_size)`` (actor pool: codec state
  built once per actor; wide binary rows → small batches, SURVEY §7.4.5) →
  write partitioned parquet.

In production the fetch would be HTTP GET + a real codec; here bytes come from
the deterministic synthetic web and the codecs in ``codecs/images.py``. The
*verification* columns (psnr_db, caption_ok, phash_dist) are computed on the
decoded pixels — the part the rule actually grades.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


from ..codecs.images import decode_image, encode_image, phash64, psnr
from ..config import Config
from ..datagen.webgraph import SyntheticWeb, WebConfig

IMAGE_SCHEMA = pa.schema([
    ("image_id", pa.string()),
    ("bytes", pa.binary()),
    ("w", pa.int32()),
    ("h", pa.int32()),
    ("fmt", pa.string()),
    ("caption", pa.string()),
    ("phash", pa.int64()),
    ("n_bytes", pa.int64()),  # payload size: lets curation/shard-packing
    #                           stages plan over metadata without reading bytes
    ("psnr_db", pa.float64()),
    ("caption_ok", pa.bool_()),
    ("phash_dist", pa.int32()),
    ("decode_ok", pa.bool_()),
])


def explode_image_ids(batch: pa.Table) -> pa.Table:
    """crawl_log batch → one row per referenced image id (vectorized)."""
    flat = pc.list_flatten(batch["image_ids"])
    return pa.table({"image_id": flat})


class ImageFetchStage:
    """Actor-pool stage: synthesize/fetch the payload, decode, verify.

    ``__init__`` holds the codec + web handles (once per actor); ``__call__``
    processes one small batch of wide binary rows.
    """

    def __init__(self, web_cfg: WebConfig):
        self.web = SyntheticWeb(web_cfg)

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = []
        for iid in batch["image_id"].to_pylist():
            # one generation pass: pixels → encode once ("HTTP fetch" payload)
            raw, fmt, caption = self.web.image_pixels_raw(iid)
            h, w = raw.shape[:2]
            rec = {"image_id": iid, "bytes": encode_image(raw, fmt),
                   "w": w, "h": h, "fmt": fmt, "caption": caption,
                   "phash": phash64(raw)}
            try:
                px = decode_image(rec["bytes"], rec["fmt"])
                decode_ok = px.shape == (rec["h"], rec["w"], 3)
            except Exception:
                px, decode_ok = None, False
            if decode_ok:
                p = psnr(raw, px) if rec["fmt"] != "png" else float("inf")
                dist = int(bin((phash64(px) ^ rec["phash"]) & ((1 << 64) - 1)).count("1"))
            else:
                p, dist = 0.0, 64
            expect_caption = rec["caption"].endswith(f"({iid})")
            rows.append({
                **{k: rec[k] for k in ("image_id", "bytes", "w", "h", "fmt",
                                       "caption", "phash")},
                "n_bytes": len(rec["bytes"]),
                "psnr_db": p, "caption_ok": bool(expect_caption),
                "phash_dist": dist, "decode_ok": bool(decode_ok),
            })
        cols = {n: [r[n] for r in rows] for n in IMAGE_SCHEMA.names}
        return pa.table({n: pa.array(cols[n], type=IMAGE_SCHEMA.field(n).type)
                         for n in IMAGE_SCHEMA.names})


def run_image_pipeline(crawl_log_dir: str, out_dir: str, web_cfg: WebConfig,
                       cfg: Config) -> dict:
    """Decode every image referenced by the crawl; returns invariant summary."""
    from ..ops.io import read_parquet as io_read
    ds = io_read(crawl_log_dir, columns=["image_ids"])
    ds = ds.map_batches(explode_image_ids, batch_format="pyarrow")
    # exact distinct via coarse hash partitions with pandas drop_duplicates
    # inside (ops/agg.py pattern — Ray's per-group aggregate pays ~ms per
    # distinct id; one group per image id would dominate the pipeline)
    from ..ops.agg import partitioned_group_apply
    ds = partitioned_group_apply(
        ds, ["image_id"],
        lambda df: df.drop_duplicates("image_id")[["image_id"]])
    # re-split BEFORE the heavy decode: the distinct step's block count
    # follows the (few) input blocks, which under-parallelizes decode at
    # high core counts (measured: 8 blocks → 8-way decode on 32 cores,
    # 6.1 s; after this repartition ~2 s). Unlike a post-compute pre-sink
    # repartition (see crawl.py — removed), this one moves only tiny id
    # rows and happens before the expensive stage.
    import ray as _ray
    ncpu = int(_ray.cluster_resources().get("CPU", 8))
    ds = ds.repartition(min(128, max(8, ncpu * 2)))
    # instance → task mode: codec state is cheap here, and spinning an actor
    # pool doubles wall time (14.4s vs 6.4s for 27k images measured); a real
    # deployment with heavy codec/model state passes the CLASS + concurrency
    ds = ds.map_batches(ImageFetchStage(web_cfg), batch_format="pyarrow",
                        batch_size=cfg.engine.decode_batch_size)
    # the image+caption table goes through the storage seam (Lance per the
    # north rule when available; parquet in this sandbox — ops/io.py)
    from ..ops.io import read_dataset, write_dataset
    write_dataset(ds, out_dir)

    check = read_dataset(
        out_dir, columns=["fmt", "psnr_db", "caption_ok", "phash_dist", "decode_ok"])
    df = check.to_pandas()  # small result — fine to materialize
    lossy = df[df["fmt"] != "png"]
    return {
        "n_images": len(df),
        "decode_ok_rate": float(df["decode_ok"].mean()) if len(df) else 1.0,
        "caption_ok_rate": float(df["caption_ok"].mean()) if len(df) else 1.0,
        "min_lossy_psnr_db": float(lossy["psnr_db"].min()) if len(lossy) else float("inf"),
        "max_phash_dist": int(df["phash_dist"].max()) if len(df) else 0,
    }
