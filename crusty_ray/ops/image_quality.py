"""Image quality filtering + per-format curation report — the gate a
training-data pipeline runs between crawl and dedup.

All decisions are pure column math over the image table's typed metadata
(w, h, fmt, decode_ok, caption) — ``bytes`` is never read, so at
100 TB only narrow columns leave storage (``read_dataset(columns=...)``
prunes at the reader). Filtering is one vectorized ``map_batches`` (no
shuffle); the report pre-aggregates per-batch partials and reduces with a
tiny per-format groupby sum.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_META_COLS = ["image_id", "w", "h", "fmt", "decode_ok", "caption"]


def _quality_flags(df: pd.DataFrame, min_w: int, min_h: int,
                   max_aspect_pm: int, min_caption_chars: int) -> pd.DataFrame:
    """Vectorized reject reasons. aspect is per-mille of max(w,h)/min(w,h)
    (integer math — no float-threshold ambiguity in the oracles)."""
    w = df["w"].to_numpy(dtype=np.int64)
    h = df["h"].to_numpy(dtype=np.int64)
    long_side = np.maximum(w, h)
    short_side = np.maximum(np.minimum(w, h), 1)
    aspect_pm = long_side * 1000 // short_side
    cap_len = df["caption"].str.len().fillna(0).to_numpy(dtype=np.int64)
    return pd.DataFrame({
        "image_id": df["image_id"],
        "fmt": df["fmt"],
        "r_decode": ~df["decode_ok"].to_numpy(dtype=bool),
        "r_small": (w < min_w) | (h < min_h),
        "r_aspect": aspect_pm > max_aspect_pm,
        "r_caption": cap_len < min_caption_chars,
    })


def image_quality_filter(images_path: str, min_w: int = 32, min_h: int = 32,
                         max_aspect_pm: int = 3000,
                         min_caption_chars: int = 8):
    """Kept image ids + dims after the standard curation gate: decodable,
    ≥ min resolution, aspect ratio ≤ max_aspect_pm/1000, caption long
    enough. Returns a Dataset(image_id, w, h, fmt) — a pure streaming
    filter, one pass, no shuffle."""
    from .io import read_dataset
    ds = read_dataset(images_path, columns=_META_COLS)

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        f = _quality_flags(df, min_w, min_h, max_aspect_pm,
                           min_caption_chars)
        ok = ~(f["r_decode"] | f["r_small"] | f["r_aspect"] | f["r_caption"])
        out = df.loc[ok.to_numpy(), ["image_id", "w", "h", "fmt"]].copy()
        out["w"] = out["w"].astype("int64")
        out["h"] = out["h"].astype("int64")
        return out

    return ds.map_batches(keep, batch_format="pandas")


def image_quality_report(images_path: str, min_w: int = 32, min_h: int = 32,
                         max_aspect_pm: int = 3000,
                         min_caption_chars: int = 8) -> pd.DataFrame:
    """Per-format curation report: total rows, kept rows, and per-reason
    reject counts (a row can fail several gates; reasons count
    independently). Partial counts per batch, then one per-format sum —
    only |formats| rows ever shuffle."""
    from ray.data.aggregate import Sum

    from .io import read_dataset
    ds = read_dataset(images_path, columns=_META_COLS)

    reason_cols = ["n_undecodable", "n_too_small", "n_bad_aspect",
                   "n_short_caption"]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        f = _quality_flags(df, min_w, min_h, max_aspect_pm,
                           min_caption_chars)
        f["n_total"] = 1
        f["n_kept"] = ~(f["r_decode"] | f["r_small"] | f["r_aspect"]
                        | f["r_caption"])
        agg = f.groupby("fmt", as_index=False).agg(
            n_total=("n_total", "sum"), n_kept=("n_kept", "sum"),
            n_undecodable=("r_decode", "sum"), n_too_small=("r_small", "sum"),
            n_bad_aspect=("r_aspect", "sum"),
            n_short_caption=("r_caption", "sum"))
        return agg.astype({c: "int64"
                           for c in ["n_total", "n_kept"] + reason_cols})

    cols = ["n_total", "n_kept"] + reason_cols
    out = ds.map_batches(partial, batch_format="pandas") \
        .groupby("fmt").aggregate(*[Sum(c, alias_name=c) for c in cols]) \
        .to_pandas()  # |formats| rows
    return out.astype({c: "int64" for c in cols}) \
        .sort_values("fmt").reset_index(drop=True)


def caption_reuse_report(images_path: str):
    """Captions reused across DISTINCT images (same caption text, >1 distinct
    phash) — the joint text/image curation signal: boilerplate/spam captions
    attached to many pictures. One coarse partition on the caption
    fingerprint; only (caption_md5, phash) pairs shuffle, never bytes.
    Returns (caption_md5, n_rows, n_distinct_images) for reused captions."""
    import hashlib

    from .agg import partitioned_group_apply
    from .io import read_dataset

    ds = read_dataset(images_path, columns=["caption", "phash"])

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "caption_md5": [hashlib.md5(c.encode()).hexdigest()
                            for c in df["caption"].fillna("")],
            "phash": df["phash"].astype("int64"),
        })

    def reused(df: pd.DataFrame) -> pd.DataFrame:
        agg = df.groupby("caption_md5", as_index=False).agg(
            n_rows=("phash", "size"), n_distinct_images=("phash", "nunique"))
        out = agg[agg["n_distinct_images"] > 1]
        return out.astype({"n_rows": "int64", "n_distinct_images": "int64"})

    res = partitioned_group_apply(ds.map_batches(pairs,
                                                 batch_format="pandas"),
                                  ["caption_md5"], reused).to_pandas()
    if res.empty:  # Ray drops the schema when every partition is empty
        res = pd.DataFrame({"caption_md5": pd.Series([], dtype=str),
                            "n_rows": pd.Series([], dtype="int64"),
                            "n_distinct_images": pd.Series([], dtype="int64")})
    return res  # small report table: reused captions only


def image_text_curation(images_path: str, min_w: int = 32, min_h: int = 32,
                        max_aspect_pm: int = 3000, min_caption_chars: int = 8,
                        bounds_pm: dict | None = None):
    """LAION-style end-to-end image-text pair curation in ONE composition:
    quality gate -> exact-phash dedup (keep the smallest image_id per phash
    among gated rows) -> deterministic md5-bucket train/val/test split.
    The image-payload counterpart of ``curation.corpus_curation_ds``: the
    output (image_id, phash, w, h, fmt, split) IS the training-set manifest
    a contrastive image-text job consumes.

    Scale plan: the gate is a pure streaming filter fused with the slim
    projection (bytes never read -- typed metadata only leaves storage);
    the dedup shuffles slim (phash, image_id) rows through
    ``grouped_top_n(n=1)``'s local-prune plan so a hot phash (watermark /
    placeholder images repeated millions of times) contributes at most one
    candidate row per block; the split is ``sample.assign_splits`` in
    append mode — a pure row function of image_id (stable under corpus
    growth), one md5 per kept row, zero shuffles.
    """
    from .agg import grouped_top_n
    from .io import read_dataset
    from .sample import assign_splits

    bounds = bounds_pm or {"train": 900, "val": 950, "test": 1000}
    ds = read_dataset(images_path, columns=_META_COLS + ["phash"])

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        f = _quality_flags(df, min_w, min_h, max_aspect_pm,
                           min_caption_chars)
        ok = ~(f["r_decode"] | f["r_small"] | f["r_aspect"] | f["r_caption"])
        out = df.loc[ok.to_numpy(),
                     ["image_id", "phash", "w", "h", "fmt"]].copy()
        return out.astype({"phash": "int64", "w": "int64", "h": "int64"})

    def project(df: pd.DataFrame) -> pd.DataFrame:
        # grouped_top_n drops the schema on all-empty blocks (gate rejected
        # every row); downstream consumers need the typed manifest columns.
        # Also drops grouped_top_n's rank column.
        if "image_id" not in df.columns:
            return pd.DataFrame({
                "image_id": pd.Series([], dtype="object"),
                "phash": pd.Series([], dtype="int64"),
                "w": pd.Series([], dtype="int64"),
                "h": pd.Series([], dtype="int64"),
                "fmt": pd.Series([], dtype="object")})
        return df[["image_id", "phash", "w", "h", "fmt"]]

    canon = grouped_top_n(ds.map_batches(keep, batch_format="pandas"),
                          ["phash"], "image_id", n=1, ascending=True) \
        .map_batches(project, batch_format="pandas")

    _schema = pa.schema([("image_id", pa.string()), ("phash", pa.int64()),
                         ("w", pa.int64()), ("h", pa.int64()),
                         ("fmt", pa.string()), ("split", pa.string())])

    def typed(df: pd.DataFrame) -> pa.Table:
        # emit Arrow so the all-rejected manifest keeps its typed schema
        # (empty pandas blocks lose theirs at the driver sink)
        return pa.Table.from_pandas(df[[f.name for f in _schema]],
                                    schema=_schema, preserve_index=False)

    # shared split logic (and its bounds-coverage assertion): full manifest
    # row + split column. The trailing union of one typed empty block keeps
    # the manifest schema when the gate rejects every row (an all-empty
    # shuffle yields zero blocks, so no UDF runs to restore it).
    import ray
    return assign_splits(canon, "image_id", bounds, append=True) \
        .map_batches(typed, batch_format="pandas") \
        .union(ray.data.from_arrow(_schema.empty_table()))
