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


# ----------------------------------------------------------- storage backend
#
# BASELINE.json's north_rule/input_hint specify *Lance* tables for the
# image+caption payload. The `lance` package is NOT installed in this sandbox
# (documented substitution: README / BASELINE.md), so parquet is the runnable
# backend; every table sink/source that the rule names goes through this seam
# so the swap is one import away.

_BACKEND: str | None = None


def storage_backend() -> str:
    """'lance' when the lance package is importable, else 'parquet'."""
    global _BACKEND
    if _BACKEND is None:
        try:
            import lance  # noqa: F401
            _BACKEND = "lance"
        except ImportError:
            _BACKEND = "parquet"
    return _BACKEND


def write_dataset(ds, path: str) -> None:
    """Dataset sink through the storage seam (Lance when available)."""
    if storage_backend() == "lance":
        ds.write_lance(path)
    else:
        ds.write_parquet(path)


def read_dataset(path: str, columns=None, max_blocks: int | None = None):
    """Dataset source through the storage seam. A directory is a Lance
    dataset iff it has Lance's `_versions` manifest dir (so parquet output
    written before a backend switch still reads)."""
    if storage_backend() == "lance" and os.path.isdir(f"{path}/_versions"):
        return ray.data.read_lance(path, columns=columns)
    return read_parquet(path, columns=columns, max_blocks=max_blocks)


def lance_fragment_rows(total_rows: int, total_bytes: int,
                        target_bytes: int = 64 << 20,
                        max_rows: int = 1 << 20,
                        min_rows: int = 1) -> int:
    """Rows-per-fragment sizing for a Lance compaction — the same
    byte-budget discipline as ``compact_dataset``: measure bytes/row from
    the dataset itself (never guess from row counts), target
    ``target_bytes`` per fragment, clamp to [min_rows, max_rows] (Lance's
    default fragment ceiling is 1M rows; a payload table with MB-scale
    binary rows must size fragments by BYTES or one fragment balloons to
    tens of GB and every scan/merge of it stops being parallel)."""
    if total_rows <= 0:
        return max_rows  # nothing measured: Lance's own default ceiling
    bytes_per_row = max(1, total_bytes // total_rows)
    return int(max(min_rows, min(max_rows, target_bytes // bytes_per_row)))


def lance_maintain(path: str, target_bytes: int = 64 << 20,
                   keep_hours: float = 24.0 * 7,
                   compact_min_fragments: int = 2) -> dict:
    """The Lance storage-maintenance pass a long ingest needs (the Lance
    analog of ``compact_dataset`` — per-epoch appends accumulate small
    fragments AND every commit appends a version manifest, so both axes
    need periodic trimming):

    1. **fragment compaction** — when the dataset holds ≥
       ``compact_min_fragments`` fragments, rewrite toward
       ``lance_fragment_rows``-sized fragments (bytes-measured, clamped);
    2. **version pruning** — drop manifests older than ``keep_hours``
       (time-travel window; the compaction itself creates a version, so
       pruning runs after it).

    Returns a summary dict (fragments/versions before/after, the
    rows-per-fragment used, bytes freed). Requires the ``lance`` package —
    callers gate on ``storage_backend() == 'lance'``; the logic itself is
    exercised in-sandbox against a minimal API fake
    (tests/test_storage_seam.py) since the real package cannot be
    installed here."""
    from datetime import timedelta

    import lance

    ds = lance.dataset(path)
    frags_before = len(ds.get_fragments())
    rows = ds.count_rows()
    data_bytes = sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _dn, fs in os.walk(path) for f in fs
        if not dp.startswith(os.path.join(path, "_versions")))
    per_frag = lance_fragment_rows(rows, data_bytes,
                                   target_bytes=target_bytes)
    compacted = False
    if frags_before >= compact_min_fragments:
        ds.optimize.compact_files(target_rows_per_fragment=per_frag)
        ds = lance.dataset(path)  # reopen at the post-compaction version
        compacted = True
    versions_before = len(ds.versions())
    stats = ds.cleanup_old_versions(older_than=timedelta(hours=keep_hours))
    ds = lance.dataset(path)
    return {
        "fragments_before": frags_before,
        "fragments_after": len(ds.get_fragments()),
        "rows_per_fragment": per_frag,
        "compacted": compacted,
        "versions_before": versions_before,
        "versions_after": len(ds.versions()),
        "bytes_removed": int(getattr(stats, "bytes_removed", 0)),
        "rows": rows,
    }


def compact_dataset(path: str, out_path: str,
                    target_bytes: int = 64 << 20):
    """Small-file compaction — the storage-maintenance pass a long crawl
    needs: per-epoch partitioned writes produce many small parquet files
    (one per shard per epoch), and small files tax every later scan
    (per-file open cost, tiny row groups, block explosion). Rewrite the
    dataset into ~``target_bytes`` files.

    Scale plan: one streaming read → ``repartition(n)`` (n sized from the
    measured on-disk bytes, never row-count guesses) → one write. The
    repartition is the one unavoidable exchange — compaction IS data
    movement; rows never touch the driver.

    Returns a one-row summary DataFrame
    (in_files, out_files, rows, in_bytes) for verification/monitoring.
    """
    import pandas as pd

    in_files = glob.glob(f"{path}/**/*.parquet", recursive=True)
    if not in_files:  # nothing written yet: report, don't crash in the read
        return pd.DataFrame([{"in_files": 0, "out_files": 0,
                              "rows": 0, "in_bytes": 0}]).astype("int64")
    in_bytes = sum(os.path.getsize(f) for f in in_files)
    n_out = max(1, in_bytes // target_bytes
                + (1 if in_bytes % target_bytes else 0))
    ds = read_parquet(path)
    ds.repartition(int(n_out)).write_parquet(out_path)
    out_files = glob.glob(f"{out_path}/**/*.parquet", recursive=True)
    rows = ray.data.read_parquet(out_path).count()
    return pd.DataFrame([{
        "in_files": len(in_files), "out_files": len(out_files),
        "rows": int(rows), "in_bytes": int(in_bytes)}]).astype("int64")


def read_any(path: str, columns=None, max_blocks: int | None = None):
    """Format-aware source — corpora arrive as parquet, CSV dumps, JSONL
    exports, or Lance datasets; this seam routes each into the same
    Dataset pipelines without a conversion pass:

    - Lance dataset dir (``_versions`` manifest + importable lance) →
      ``read_lance`` with column pruning pushed into the read;
    - ``.csv`` → ``ray.data.read_csv`` (Arrow CSV, quoted fields OK);
    - ``.jsonl`` / ``.json`` → ``ray.data.read_json`` (newline-delimited);
    - everything else → the block-count-disciplined ``read_parquet``.

    Row formats have no column projection, so CSV/JSONL prune with
    ``select_columns`` AFTER the read — correct but not I/O-pruned; at
    100 TB convert row dumps to parquet/lance once (``write_dataset``)
    rather than re-scanning them per query.
    """
    if os.path.isdir(path) and os.path.isdir(f"{path}/_versions") \
            and storage_backend() == "lance":
        return ray.data.read_lance(path, columns=columns)
    ext = os.path.splitext(path)[1].lower()
    if ext == ".csv":
        ds = ray.data.read_csv(path)
    elif ext in (".jsonl", ".json"):
        ds = ray.data.read_json(path)
    else:
        return read_parquet(path, columns=columns, max_blocks=max_blocks)
    return ds.select_columns(columns) if columns else ds


def export_jsonl(ds, path: str) -> None:
    """Dataset → newline-delimited JSON files — the format most training
    ingestion stacks consume; one file per block, distributed write."""
    ds.write_json(path)
