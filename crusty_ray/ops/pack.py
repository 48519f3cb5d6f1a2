"""Sequence / shard packing — fixed-budget contiguous chunk assignment by a
GLOBAL ordered prefix sum, distributed in two phases.

The primitive behind training-data exports: pack documents into fixed
token-budget training sequences, or image rows into byte-budget output
shards. ``chunk_id(item) = exclusive_prefix_sum(weight) // budget`` over
items ordered by the order column — SQL's
``SUM(w) OVER (ORDER BY k ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)``.

A global ordered cumsum looks inherently serial; it isn't. Phase 1
range-buckets items on the ORDER key value and reduces ONE weight total per
bucket (a tiny O(n_buckets)-row aggregate). The driver exclusive-scans those
totals into per-bucket offsets — O(buckets) work, broadcast once via
``ray.put``. Phase 2 is one coarse shuffle (`partitioned_group_apply` on the
bucket): each partition sorts its buckets, cumsums locally and adds the
bucket's offset — every item gets its exact global prefix sum with no serial
pass over the data. At 100 TB the only driver-side state is the bucket-total
vector; pick ``bucket_width`` so n_buckets ≈ 10^5-10^6 (a few MB).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray

from .agg import partitioned_group_apply
from .io import read_table

_BUCKET = "__pack_bucket"


def ordered_pack(ds, order_col: str, weight_col: str, budget: int,
                 bucket_width: int, out_col: str = "chunk_id",
                 num_partitions: int = 32):
    """Add ``out_col = exclusive_prefix_sum(weight_col) // budget`` over rows
    ordered by ``order_col`` (must be unique non-negative integers; weights
    non-negative int64). All other columns pass through. Items heavier than
    ``budget`` simply advance the chunk counter past themselves — the SQL
    window semantics, no special case."""

    def add_bucket(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch[_BUCKET] = (batch[order_col].astype("int64")
                          // bucket_width).astype("int64")
        return batch

    withb = ds.map_batches(add_bucket, batch_format="pandas")

    # Phase 1: one weight total per bucket. Per-batch partial sums shrink the
    # shuffle to <= buckets-per-block rows; the coarse partition finishes.
    def local_totals(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.groupby(_BUCKET, as_index=False)[weight_col].sum()
        return out.astype({weight_col: "int64"})

    totals = partitioned_group_apply(
        withb.map_batches(local_totals, batch_format="pandas"),
        [_BUCKET], local_totals, num_partitions).to_pandas()
    if _BUCKET not in totals.columns:  # empty input: Ray drops the schema
        totals = pd.DataFrame({_BUCKET: pd.Series([], dtype="int64"),
                               weight_col: pd.Series([], dtype="int64")})
    totals = totals.sort_values(_BUCKET).reset_index(drop=True)
    buckets = totals[_BUCKET].to_numpy(dtype=np.int64)
    sums = totals[weight_col].to_numpy(dtype=np.int64)
    offsets = np.concatenate(([0], np.cumsum(sums)[:-1]))  # exclusive scan
    offsets_ref = ray.put((buckets, offsets))

    # Phase 2: per-bucket local cumsum + broadcast bucket offset.
    def assign(part: pd.DataFrame, _cache={}) -> pd.DataFrame:
        if "o" not in _cache:  # one fetch/deserialize per worker process
            _cache["o"] = ray.get(offsets_ref)
        bkts, offs = _cache["o"]
        g = part.sort_values([_BUCKET, order_col],
                             kind="mergesort").reset_index(drop=True)
        w = g[weight_col].to_numpy(dtype=np.int64)
        run = g.groupby(_BUCKET, sort=False)[weight_col].cumsum() \
            .to_numpy(dtype=np.int64) - w  # exclusive within bucket
        base = offs[np.searchsorted(bkts, g[_BUCKET].to_numpy())]
        g[out_col] = (base + run) // budget
        return g.drop(columns=_BUCKET)

    return partitioned_group_apply(withb, [_BUCKET], assign, num_partitions)


def pack_token_chunks_ds(sf_dir: str, budget: int = 512,
                         bucket_width: int = 64):
    """Pack documents (ordered by doc_id) into fixed token-budget training
    chunks. Token count = ``len(string_split(trim(text,' '), ' '))``, the
    repo-wide token_stats convention, so the DuckDB window-function oracle
    hashes identically. Returns (doc_id, n_tokens, chunk_id)."""
    docs = read_table(sf_dir, "documents", ["doc_id", "text"])

    def tokens(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": batch["doc_id"].astype("int64"),
            "n_tokens": batch["text"].fillna("").str.strip(" ")
            .str.split(" ").map(len).astype("int64"),
        })

    slim = docs.map_batches(tokens, batch_format="pandas")
    return ordered_pack(slim, "doc_id", "n_tokens", budget, bucket_width)
