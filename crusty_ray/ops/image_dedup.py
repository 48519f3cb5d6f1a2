"""Image near-duplicate detection over the image+caption payload table.

The input_hint schema carries ``phash`` (64-bit perceptual hash of the decoded
pixels). Near-dups = phash pairs within a hamming radius. Same scale plan as
SimHash text dedup (ops/dedup.py): bucket by 16-bit quadrants (pigeonhole: any
pair with hamming ≤ 3 shares at least one of four quadrants), generate
candidates per bucket, verify exact hamming — only (quadrant, id) rows
shuffle, never pixels.
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np
import pandas as pd

from .io import read_parquet


def phash_quadrants(batch: pd.DataFrame) -> pd.DataFrame:
    vals = batch["phash"].to_numpy().astype(np.int64).view(np.uint64)
    out = pd.DataFrame({"image_id": batch["image_id"]})
    out["phash"] = vals.astype(np.int64)
    for q in range(4):
        out[f"q{q}"] = ((vals >> np.uint64(16 * q)) & np.uint64(0xFFFF)).astype(np.int64)
    return out


def image_phash_pairs(images_path: str, max_hamming: int = 6) -> pd.DataFrame:
    """Near-dup image pairs from an images parquet table (bytes never read)."""
    ds = read_parquet(images_path, columns=["image_id", "phash"])
    sh = ds.map_batches(phash_quadrants, batch_format="pandas").to_pandas()
    sig = dict(zip(sh["image_id"], sh["phash"].astype(np.int64).astype(np.uint64)))
    cand: set[tuple] = set()
    for q in range(4):
        buckets = defaultdict(list)
        for iid, v in zip(sh["image_id"], sh[f"q{q}"]):
            buckets[v].append(iid)
        for ids in buckets.values():
            ids = sorted(ids)
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    cand.add((ids[i], ids[j]))
    rows = []
    for a, b in sorted(cand):
        d = int(bin(int(sig[a]) ^ int(sig[b])).count("1"))
        if d <= max_hamming:
            rows.append({"image_a": a, "image_b": b, "hamming": d})
    return pd.DataFrame(rows, columns=["image_a", "image_b", "hamming"])


def image_exact_dedup(images_path: str):
    """Exact duplicate groups by (phash, w, h) — the cheap first tier before
    hamming verification; keeps min image_id per group."""
    from .agg import partitioned_group_apply
    ds = read_parquet(images_path, columns=["image_id", "phash", "w", "h"])

    def first_per_key(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(["phash", "w", "h"], as_index=False).agg(
            keep_image_id=("image_id", "min"), n_dups=("image_id", "size"))
        return out.astype({"n_dups": "int64"})

    return partitioned_group_apply(ds, ["phash"], first_per_key)
