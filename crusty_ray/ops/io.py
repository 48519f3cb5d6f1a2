"""Read helpers — block-count discipline.

Ray Data's default parquet read splits aggressively (hundreds of tiny blocks
for a single small file), which makes every downstream shuffle pay per-block
fixed costs — measured 6× on a 600k-row groupby. At 100 TB the default
heuristics are right; at benchmark scale we cap blocks by actual input size
(~16 MiB per block, bounded by CPU count) so shuffles see sane partition
counts either way.
"""

from __future__ import annotations

import glob
import os

import ray

_TARGET_BLOCK_BYTES = 16 << 20


def _size_of(path: str) -> int:
    if os.path.isdir(path):
        return sum(os.path.getsize(f) for f in
                   glob.glob(f"{path}/**/*.parquet", recursive=True))
    return os.path.getsize(path)


def blocks_for(path: str, max_blocks: int | None = None) -> int:
    if max_blocks is None:
        max_blocks = int(ray.cluster_resources().get("CPU", 8))
    by_size = _size_of(path) // _TARGET_BLOCK_BYTES + 1
    # floor of a few blocks so map stages on small inputs still parallelize
    return max(1, min(max_blocks, max(by_size, min(8, max_blocks))))


def read_parquet(path: str, columns=None, max_blocks: int | None = None):
    """read_parquet with size-appropriate block count (columns still pruned
    at the read)."""
    return ray.data.read_parquet(path, columns=columns,
                                 override_num_blocks=blocks_for(path, max_blocks))


def read_table(sf_dir: str, name: str, columns=None):
    return read_parquet(f"{sf_dir}/{name}.parquet", columns=columns)
