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
                 num_partitions: int = 32,
                 tie_cols: list[str] | None = None,
                 group_cols: list[str] | None = None):
    """Add ``out_col = exclusive_prefix_sum(weight_col) // budget`` over rows
    ordered by ``order_col`` (non-negative integers; weights non-negative
    int64). ``tie_cols`` must make the order total when ``order_col`` is not
    unique (ties share a bucket, so tie-breaking is partition-local). All
    other columns pass through. Items heavier than ``budget`` simply advance
    the chunk counter past themselves — the SQL window semantics, no special
    case.

    ``group_cols``: the PARTITION BY generalization — the prefix sum (and
    therefore the chunk counter) restarts per group:
    ``SUM(w) OVER (PARTITION BY groups ORDER BY k ROWS ... 1 PRECEDING)``.
    The driver's exclusive scan runs per group over the same
    O(groups × range-buckets) totals vector; phase 2 is unchanged except
    the range bucket is keyed (groups..., bucket). Groups must be few
    enough that groups × n_buckets stays driver-sized (aspect buckets,
    sources — not doc ids)."""
    groups = list(group_cols or [])

    def add_bucket(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch[_BUCKET] = (batch[order_col].astype("int64")
                          // bucket_width).astype("int64")
        return batch

    withb = ds.map_batches(add_bucket, batch_format="pandas")
    keys = groups + [_BUCKET]

    # Phase 1: one weight total per (group, bucket). Per-batch partial sums
    # shrink the shuffle to <= keys-per-block rows; the coarse partition
    # finishes.
    def local_totals(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.groupby(keys, as_index=False)[weight_col].sum()
        return out.astype({weight_col: "int64", _BUCKET: "int64"})

    totals = partitioned_group_apply(
        withb.map_batches(local_totals, batch_format="pandas"),
        keys, local_totals, num_partitions).to_pandas()
    if _BUCKET not in totals.columns:  # empty input: Ray drops the schema
        totals = pd.DataFrame({c: pd.Series([], dtype="object")
                               for c in groups}
                              | {_BUCKET: pd.Series([], dtype="int64"),
                                 weight_col: pd.Series([], dtype="int64")})
    totals = totals.sort_values(keys).reset_index(drop=True)
    if groups:
        csum = totals.groupby(groups, sort=False)[weight_col].cumsum() \
            .to_numpy(dtype=np.int64)
    else:
        csum = totals[weight_col].cumsum().to_numpy(dtype=np.int64)
    offsets_df = totals[keys].copy()
    offsets_df["__off"] = csum - totals[weight_col].to_numpy(dtype=np.int64)
    offsets_ref = ray.put(offsets_df)  # O(groups × buckets) rows

    # Phase 2: per-(group, bucket) local cumsum + broadcast offset (attached
    # by a vectorized left merge — left order is preserved, so the cumsum
    # rows stay aligned).
    def assign(part: pd.DataFrame, _cache={}) -> pd.DataFrame:
        if "o" not in _cache:  # one fetch/deserialize per worker process
            _cache["o"] = ray.get(offsets_ref)
        offs = _cache["o"]
        g = part.sort_values(keys + [order_col] + list(tie_cols or []),
                             kind="mergesort").reset_index(drop=True)
        w = g[weight_col].to_numpy(dtype=np.int64)
        run = g.groupby(keys, sort=False)[weight_col].cumsum() \
            .to_numpy(dtype=np.int64) - w  # exclusive within (group, bucket)
        base = g[keys].merge(offs, on=keys, how="left")["__off"] \
            .to_numpy(dtype=np.int64)
        g[out_col] = (base + run) // budget
        return g.drop(columns=_BUCKET)

    return partitioned_group_apply(withb, keys, assign, num_partitions)


def pack_token_chunks_ds(sf_dir: str, budget: int = 512,
                         bucket_width: int = 64):
    """Pack documents (ordered by doc_id) into fixed token-budget training
    chunks. Token count = ``len(string_split(trim(text,' '), ' '))``, the
    repo-wide token_stats convention, so the DuckDB window-function oracle
    hashes identically. Returns (doc_id, n_tokens, chunk_id).

    ``bucket_width`` is tuned to the test corpus (500 docs → 8 buckets);
    size it to keep n_buckets ≈ 10^5-10^6 at corpus scale (module note)."""
    docs = read_table(sf_dir, "documents", ["doc_id", "text"])

    def tokens(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": batch["doc_id"].astype("int64"),
            "n_tokens": batch["text"].fillna("").str.strip(" ")
            .str.split(" ").map(len).astype("int64"),
        })

    slim = docs.map_batches(tokens, batch_format="pandas")
    return ordered_pack(slim, "doc_id", "n_tokens", budget, bucket_width)


def _id_key(ids) -> np.ndarray:
    """Deterministic non-negative int64 order key from a string id (md5-based
    so the global shard order is stable and uniform; collisions are resolved
    by the image_id tie-break inside ordered_pack)."""
    import hashlib
    return np.fromiter(
        (int.from_bytes(hashlib.md5(i.encode()).digest()[:8], "big")
         & ((1 << 63) - 1) for i in ids),
        dtype=np.int64, count=len(ids))


def export_image_shards(images_path: str, out_dir: str | None,
                        shard_bytes: int = 4 << 20,
                        num_partitions: int = 32, min_w: int = 32,
                        min_h: int = 32, max_aspect_pm: int = 3000,
                        min_caption_chars: int = 8):
    """The training-data EXPORT step for the image+caption payload: quality
    gate → exact dedup → byte-budget shard assignment → partitioned parquet
    (``shard_id=K/`` dirs — resumable, one directory per output shard).

    Scale plan: every decision runs in SLIM space (metadata columns only —
    ``n_bytes`` is recorded at ingest so the payload is never read to plan):
    vectorized quality gate (no shuffle), keep-first exact dedup (one slim
    shuffle on phash), byte-budget packing via ``ordered_pack`` over the
    md5-derived id key (slim). The payload then moves exactly ONCE: a
    co-partitioned ``hash_join`` of the full rows against the tiny
    (image_id, shard_id) assignment, written straight to the partitioned
    sink. Returns the per-shard summary (shard_id, n_images, total_bytes),
    computed from slim rows. ``out_dir=None`` skips the payload write and
    returns the summary only."""
    from .agg import partitioned_group_apply
    from .io import read_dataset

    assignment = _shard_assignment(images_path, shard_bytes, num_partitions,
                                   min_w, min_h, max_aspect_pm,
                                   min_caption_chars)

    if out_dir is not None:
        from .joins import hash_join
        full = read_dataset(images_path)
        rows = hash_join(
            full,
            assignment.drop_columns(["n_bytes"]),
            on=["image_id"], num_partitions=num_partitions)
        rows.write_parquet(out_dir, partition_cols=["shard_id"])

    def summarize(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("shard_id", as_index=False).agg(
            n_images=("image_id", "size"), total_bytes=("n_bytes", "sum"))
        return out.astype({"n_images": "int64", "total_bytes": "int64"})

    return partitioned_group_apply(assignment, ["shard_id"], summarize,
                                   num_partitions)


def _shard_assignment(images_path: str, shard_bytes: int,
                      num_partitions: int, min_w: int, min_h: int,
                      max_aspect_pm: int, min_caption_chars: int):
    """Shared slim plan of the export ops: quality gate → keep-first exact
    dedup → byte-budget shard packing. Returns the MATERIALIZED
    (image_id, n_bytes, shard_id) assignment — slim rows only, the payload
    is never read."""
    from .agg import partitioned_group_apply
    from .image_quality import _quality_flags
    from .io import read_dataset

    slim_cols = ["image_id", "w", "h", "fmt", "decode_ok", "caption",
                 "phash", "n_bytes"]
    slim = read_dataset(images_path, columns=slim_cols)

    def gate(df: pd.DataFrame) -> pd.DataFrame:
        f = _quality_flags(df, min_w, min_h, max_aspect_pm,
                           min_caption_chars)
        ok = ~(f["r_decode"] | f["r_small"] | f["r_aspect"] | f["r_caption"])
        out = df.loc[ok.to_numpy(),
                     ["image_id", "phash", "w", "h", "n_bytes"]].copy()
        return out.astype({"n_bytes": "int64"})

    def keep_first(df: pd.DataFrame) -> pd.DataFrame:
        g = df.sort_values("image_id", kind="mergesort")
        out = g.groupby(["phash", "w", "h"], as_index=False).first()
        return out[["image_id", "n_bytes"]]

    kept = partitioned_group_apply(
        slim.map_batches(gate, batch_format="pandas"),
        ["phash"], keep_first, num_partitions)

    def add_key(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__key"] = _id_key(df["image_id"].tolist())
        return df

    packed = ordered_pack(
        kept.map_batches(add_key, batch_format="pandas"),
        "__key", "n_bytes", shard_bytes, bucket_width=1 << 47,
        out_col="shard_id", num_partitions=num_partitions,
        tie_cols=["image_id"])

    def strip(df: pd.DataFrame) -> pd.DataFrame:
        return df[["image_id", "n_bytes", "shard_id"]]

    # materialize: the slim assignment feeds BOTH the payload join and the
    # per-shard summary — lazy, the whole gate→dedup→pack chain would
    # re-execute per consumer
    return packed.map_batches(strip, batch_format="pandas").materialize()


def export_webdataset(images_path: str, out_dir: str,
                      shard_bytes: int = 4 << 20, num_partitions: int = 32,
                      min_w: int = 32, min_h: int = 32,
                      max_aspect_pm: int = 3000, min_caption_chars: int = 8):
    """WebDataset-style tar-shard export of the curated image+caption
    corpus — the artifact an image-text training job actually streams:
    ``shard-NNNNNN.tar`` files, each sample stored as two adjacent members
    ``{image_id}.{fmt}`` (payload bytes) and ``{image_id}.txt`` (caption,
    UTF-8). Same gate → dedup → byte-budget plan as
    ``export_image_shards`` (shared ``_shard_assignment``).

    The tars are BYTE-deterministic: members sorted by image_id, USTAR
    format, zeroed mtime/uid/gid — re-running the export reproduces
    identical files, so a resumed run can cheaply verify finished shards.
    Each shard is written to a temp path then ``os.replace``d (atomic on
    one filesystem; retries overwrite, never corrupt). Per-task memory is
    bounded by ``shard_bytes`` × shards-per-partition: the payload moves
    exactly once, straight from the join into its tar.

    Returns the per-shard summary (shard_id, n_images, tar_bytes, path).
    """
    import os
    import tarfile
    from io import BytesIO

    from .agg import partitioned_group_apply
    from .io import read_dataset
    from .joins import hash_join

    os.makedirs(out_dir, exist_ok=True)
    assignment = _shard_assignment(images_path, shard_bytes, num_partitions,
                                   min_w, min_h, max_aspect_pm,
                                   min_caption_chars)
    full = read_dataset(images_path,
                        columns=["image_id", "bytes", "fmt", "caption"])
    rows = hash_join(full, assignment.drop_columns(["n_bytes"]),
                     on=["image_id"], num_partitions=num_partitions)

    def _member(tar, name: str, payload: bytes) -> None:
        info = tarfile.TarInfo(name=name)
        info.size = len(payload)
        info.mtime = 0
        info.uid = info.gid = 0
        info.uname = info.gname = ""
        info.mode = 0o644
        tar.addfile(info, BytesIO(payload))

    def write_shards(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for sid, g in df.groupby("shard_id", sort=True):
            g = g.sort_values("image_id", kind="mergesort")
            path = os.path.join(out_dir, f"shard-{int(sid):06d}.tar")
            tmp = path + ".tmp"
            with tarfile.open(tmp, "w", format=tarfile.USTAR_FORMAT) as tar:
                for r in g.itertuples(index=False):
                    _member(tar, f"{r.image_id}.{r.fmt}", bytes(r.bytes))
                    _member(tar, f"{r.image_id}.txt",
                            str(r.caption or "").encode("utf-8"))
            os.replace(tmp, path)
            out.append((int(sid), len(g), os.path.getsize(path), path))
        return pd.DataFrame(out, columns=["shard_id", "n_images",
                                          "tar_bytes", "path"]) \
            .astype({"shard_id": "int64", "n_images": "int64",
                     "tar_bytes": "int64"})

    summary = partitioned_group_apply(rows, ["shard_id"], write_shards,
                                      num_partitions).to_pandas()
    if summary.empty:
        summary = pd.DataFrame({
            "shard_id": pd.Series([], dtype="int64"),
            "n_images": pd.Series([], dtype="int64"),
            "tar_bytes": pd.Series([], dtype="int64"),
            "path": pd.Series([], dtype="object")})
    return summary.sort_values("shard_id").reset_index(drop=True)


_ASPECTS_PM = (500, 750, 1000, 1333, 2000)  # h:w per-mille anchor buckets


def aspect_bucket_batches(images_path: str, batch_rows: int = 16,
                          num_partitions: int = 32):
    """Aspect-ratio-bucketed training batches for the image payload — the
    SDXL-style step: route each image to the nearest anchor aspect (so a
    batch crops/pads minimally), then number fixed-size batches per bucket
    in a deterministic md5-key order.

    All in slim metadata space (w/h only — bytes never read). Bucket
    assignment is pure integer math (nearest anchor by |aspect_pm − a|,
    ties to the smaller anchor — exactly reproducible in SQL); per-bucket
    batch numbering is ``ordered_pack(group_cols=[bucket], weight=1,
    budget=batch_rows)`` — i.e. ``(row_number() − 1) // batch_rows`` per
    bucket, the window-function shape, with no serial pass. Returns
    (image_id, aspect_bucket_pm, batch_id)."""
    from .io import read_dataset

    slim = read_dataset(images_path, columns=["image_id", "w", "h"])
    anchors = np.asarray(_ASPECTS_PM, dtype=np.int64)

    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        w = df["w"].to_numpy(dtype=np.int64)
        h = df["h"].to_numpy(dtype=np.int64)
        aspect_pm = 1000 * h // np.maximum(w, 1)
        dist = np.abs(aspect_pm[:, None] - anchors[None, :])
        bucket = anchors[np.argmin(dist, axis=1)]  # argmin → first = smaller
        out = pd.DataFrame({
            "image_id": df["image_id"],
            "aspect_bucket_pm": bucket,
            "__key": _id_key(df["image_id"].tolist()),
            "__one": np.ones(len(df), dtype=np.int64),
        })
        return out

    keyed = slim.map_batches(bucketize, batch_format="pandas")
    packed = ordered_pack(keyed, "__key", "__one", budget=batch_rows,
                          bucket_width=1 << 47, out_col="batch_id",
                          num_partitions=num_partitions,
                          tie_cols=["image_id"],
                          group_cols=["aspect_bucket_pm"])

    def tidy(df: pd.DataFrame) -> pd.DataFrame:
        return df[["image_id", "aspect_bucket_pm", "batch_id"]] \
            .astype({"aspect_bucket_pm": "int64", "batch_id": "int64"})

    return packed.map_batches(tidy, batch_format="pandas")


def data_mixture_ds(sf_dir: str, budget_pm_of_corpus: int = 500,
                    bucket_width: int = 64, num_partitions: int = 32):
    """Training-data MIXTURE construction — the GPT-3/Pile "sample each
    source with its own weight until its token budget is hit" step
    (Brown et al. 2020 §2.2's per-dataset sampling weights), made
    deterministic: per source, documents are admitted in doc_id order while
    the source's EXCLUSIVE token prefix sum stays below its budget.

    Budgets: ``budget_src = weight_pm(src) · B // 1000`` where
    ``B = total_corpus_tokens · budget_pm_of_corpus // 1000`` and
    ``weight_pm(srcI) = 25 · (I + 1)`` (the same up-weighting ramp as
    ``sample.sample_stratified_ds``, but in token space — weights need not
    sum to 1000; they are independent per-source token allowances).

    Scale plan: token counts are slim per-doc rows; ``B`` is one
    distributed sum (O(1) driver state); the per-source exclusive prefix
    sum is ``ordered_pack(group_cols=["source"], budget=1)`` — the
    distributed two-phase scan, no serial pass, no driver materialization.
    The admit decision is then a pure vectorized comparison. Returns every
    doc's verdict (doc_id, source, n_tokens, cum_before, keep) so the face
    is LEFT-complete — downstream consumes ``keep = 1`` rows.

    Token convention = ``pack_token_chunks_ds`` (len of split of
    trim-by-space), so the DuckDB window-function oracle hashes
    identically.
    """
    docs = read_table(sf_dir, "documents", ["doc_id", "source", "text"])

    def tokens(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": batch["doc_id"].astype("int64"),
            "source": batch["source"].astype(str),
            "n_tokens": batch["text"].fillna("").str.strip(" ")
            .str.split(" ").map(len).astype("int64"),
        })

    # Materialized ONCE: the expensive text tokenization runs a single time;
    # what persists is the slim fixed-width projection (3 columns, O(docs)
    # rows — a standard shuffle-input footprint, spillable), consumed by the
    # total-sum and both ordered_pack phases below.
    slim = docs.map_batches(tokens, batch_format="pandas").materialize()
    total = int(slim.sum("n_tokens"))
    corpus_budget = total * budget_pm_of_corpus // 1000

    scanned = ordered_pack(slim, "doc_id", "n_tokens", budget=1,
                           bucket_width=bucket_width,
                           out_col="cum_before",
                           num_partitions=num_partitions,
                           group_cols=["source"])

    def admit(batch: pd.DataFrame) -> pd.DataFrame:
        # weight_pm = 25·(index+1), parsed from the 'srcN' name — integer
        # math end-to-end so the SQL face is bit-exact.
        idx = batch["source"].str.slice(3).astype("int64")
        budget_src = (25 * (idx + 1)) * corpus_budget // 1000
        keep = (batch["cum_before"].to_numpy(dtype=np.int64)
                < budget_src.to_numpy(dtype=np.int64)).astype("int64")
        out = batch[["doc_id", "source", "n_tokens", "cum_before"]].copy()
        out["keep"] = keep
        return out.astype({"doc_id": "int64", "n_tokens": "int64",
                           "cum_before": "int64"})

    return scanned.map_batches(admit, batch_format="pandas")


def _shuffle_keyed_docs(sf_dir: str):
    """(doc_id, n_tokens, __key, __one) projection of the documents table
    with the shuffle-permutation key ``md5_48(doc_id)·2^15 + doc_id mod
    2^15`` (63 bits, unique, uniform — range buckets balanced by
    construction)."""
    import hashlib

    from .io import read_parquet as _io_read

    def keyed(batch: pd.DataFrame) -> pd.DataFrame:
        from .text import n_tokens_nonempty
        ids = batch["doc_id"].astype("int64")
        key = pd.Series(
            [int(hashlib.md5(str(i).encode()).hexdigest()[:12], 16)
             * 32768 + int(i) % 32768 for i in ids],
            dtype="int64", index=batch.index)
        return pd.DataFrame({"doc_id": ids,
                             "n_tokens": n_tokens_nonempty(batch["text"]),
                             "__key": key,
                             "__one": np.int64(1)})

    return _io_read(f"{sf_dir}/documents.parquet",
                    columns=["doc_id", "text"]) \
        .map_batches(keyed, batch_format="pandas")


def _shuffle_pack(ds, budget: int, num_partitions: int):
    """Shuffle rank + token-budget shard over a keyed doc set: two
    ``ordered_pack`` range-partitioned prefix scans (weight 1 → rank;
    weight n_tokens → shard), no global sort."""
    ranked = ordered_pack(ds, "__key", "__one", budget=1,
                          bucket_width=1 << 50, out_col="shuffle_rank",
                          num_partitions=num_partitions)
    # ranked feeds the second pack's phase-1 totals AND its phase-2 map;
    # left lazy it would execute twice (the split_leakage/hash_join hazard)
    ranked = ranked.materialize()
    sharded = ordered_pack(ranked, "__key", "n_tokens", budget=budget,
                           bucket_width=1 << 50, out_col="shard_id",
                           num_partitions=num_partitions)

    def finish(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[["doc_id", "n_tokens", "shuffle_rank", "shard_id"]] \
            .astype("int64")

    return sharded.map_batches(finish, batch_format="pandas")


def global_shuffle_shards_ds(sf_dir: str, budget: int = 4096,
                             num_partitions: int = 32):
    """Deterministic global training shuffle + shard assignment — the
    delivery step after curation: documents are ordered by a seedless
    hash permutation (md5 of the doc id — reshuffling is changing the
    salt), given their global shuffle rank, and packed into token-budget
    shards IN THAT ORDER (so every shard is an unbiased sample, the
    property "tokenize-and-shuffle" pipelines exist to guarantee).

    Returns (doc_id, n_tokens, shuffle_rank, shard_id).
    """
    return _shuffle_pack(_shuffle_keyed_docs(sf_dir), budget,
                         num_partitions)


def training_manifest_ds(sf_dir: str, budget: int = 4096,
                         num_partitions: int = 32):
    """THE end-to-end data-prep deliverable: the exact file a training
    job consumes. Composition of the oracle-checked pieces — corpus
    curation (quality gate → exact dedup → decontaminate → split) keeps
    the clean train docs, then the shuffled token-budget shard packing
    (``global_shuffle_shards``) runs over exactly that kept set: every
    shard an unbiased sample of the CURATED train corpus.

    Scale plan: ``corpus_curation_ds``'s one-shuffle chain → a slim
    train-only doc_id projection → one ``hash_join`` against the keyed
    token projection (both fact-scale, co-partitioned) → the two-scan
    shuffle pack. Nothing new touches the driver.

    Returns (doc_id, n_tokens, shuffle_rank, shard_id) over the kept
    train split only.
    """
    from .joins import hash_join
    from .curation import corpus_curation_ds

    kept = corpus_curation_ds(sf_dir)

    def train_ids(batch: pd.DataFrame) -> pd.DataFrame:
        sel = batch["split"] == "train"
        return pd.DataFrame({"doc_id": batch.loc[sel, "doc_id"]
                             .astype("int64")})

    tr = kept.map_batches(train_ids, batch_format="pandas")
    joined = hash_join(tr, _shuffle_keyed_docs(sf_dir), on=["doc_id"],
                       num_partitions=num_partitions)
    # joined feeds ordered_pack's totals pass AND its assign pass; left
    # lazy, the join shuffle would execute twice (the documented hazard)
    joined = joined.materialize()
    return _shuffle_pack(joined, budget, num_partitions)


# ----------------------------------------------------------- z-order layout

def _spread16(v: np.ndarray) -> np.ndarray:
    """Spread the low 16 bits of each int64 to the even bit positions of a
    32-bit result (the classic Morton-code bit twiddle, vectorized)."""
    v = v & 0xFFFF
    v = (v | (v << 8)) & 0x00FF00FF
    v = (v | (v << 4)) & 0x0F0F0F0F
    v = (v | (v << 2)) & 0x33333333
    v = (v | (v << 1)) & 0x55555555
    return v


def zorder_key(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """32-bit Morton (z-order) interleave of two 16-bit bucket columns —
    x in the even bits, y in the odd bits."""
    return _spread16(x.astype(np.int64)) | (_spread16(y.astype(np.int64))
                                            << 1)


def zorder_events_layout_ds(sf_dir: str, n_files: int = 64,
                            num_partitions: int = 32):
    """Z-order (Morton-curve) file layout for the events table — the
    lakehouse ``OPTIMIZE ZORDER BY (user_id, minute)`` step: rows map to
    output files by the top bits of the interleaved (user_id, minute)
    buckets, so a scan filtered on EITHER column touches a bounded band of
    files (a single-column sort would cluster one column and scatter the
    other). Returns the layout manifest the writer and the pruning planner
    consume: per file, the row count and the min/max of both bucket
    columns — exactly the parquet row-group statistics a reader prunes on.

    ``n_files`` must be a power of four ≤ 2^32 for an even x/y bit split
    (64 → top 6 Morton bits → 3 bits of each axis). The whole op is one
    streaming vectorized ``map_batches`` (the Morton twiddle over numpy
    int64) + a per-batch-partial min/max/count reduce: per-file partials
    shuffle, never rows — O(n_files) output regardless of input scale.
    The actual file WRITE is ``write_dataset(..., partition_cols=
    ["file_id"])`` over the same key; the manifest face keeps the op
    oracle-checkable.
    """
    shift = 32 - int(n_files - 1).bit_length()
    if n_files != 1 << (32 - shift):
        raise ValueError(f"n_files must be a power of two, got {n_files}")

    from .analog import minute_of

    def keyed(batch: pd.DataFrame) -> pd.DataFrame:
        x = batch["user_id"].to_numpy(dtype=np.int64) % 65536
        y = minute_of(batch["ts"]) % 65536
        z = zorder_key(x, y)
        df = pd.DataFrame({"file_id": (z >> shift).astype(np.int64),
                           "xb": x, "yb": y})
        out = df.groupby("file_id", as_index=False).agg(
            n_rows=("xb", "size"),
            min_user_bucket=("xb", "min"), max_user_bucket=("xb", "max"),
            min_minute_bucket=("yb", "min"), max_minute_bucket=("yb", "max"))
        return out.astype("int64")

    pre = read_table(sf_dir, "events", ["user_id", "ts"]) \
        .map_batches(keyed, batch_format="pandas")

    def reduce_part(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("file_id", as_index=False).agg(
            n_rows=("n_rows", "sum"),
            min_user_bucket=("min_user_bucket", "min"),
            max_user_bucket=("max_user_bucket", "max"),
            min_minute_bucket=("min_minute_bucket", "min"),
            max_minute_bucket=("max_minute_bucket", "max"))
        return out.astype("int64")

    return partitioned_group_apply(pre, ["file_id"], reduce_part,
                                   num_partitions)


# ----------------------------------------------------- multi-epoch shuffle

def epoch_shuffle_manifest_ds(sf_dir: str, n_epochs: int = 3,
                              budget: int = 4096,
                              num_partitions: int = 32):
    """Multi-epoch training delivery: ``global_shuffle_shards`` repeated
    for ``n_epochs`` epochs, each under a DIFFERENT deterministic
    permutation (the epoch number salts the md5 shuffle key), in ONE
    pipeline — the manifest a multi-epoch training job reads so no epoch
    repeats the previous epoch's order (the "reshuffle each epoch"
    guarantee, without any stored RNG state).

    Scale plan: the per-batch key map replicates each doc row ×n_epochs
    (slim fixed-width rows — id, token count, key), then BOTH prefix scans
    (rank, then token-budget shard) run per epoch via ``ordered_pack``'s
    ``group_cols`` — the driver's exclusive scan is over O(epochs ×
    range-buckets) totals, everything else stays in workers. Returns
    (epoch, doc_id, n_tokens, shuffle_rank, shard_id).
    """
    import hashlib

    from .io import read_parquet as _io_read

    def keyed(batch: pd.DataFrame) -> pd.DataFrame:
        from .text import n_tokens_nonempty
        ids = batch["doc_id"].astype("int64")
        nt = n_tokens_nonempty(batch["text"]).to_numpy()
        frames = []
        for e in range(n_epochs):
            key = pd.Series(
                [int(hashlib.md5(f"{e}:{i}".encode()).hexdigest()[:12], 16)
                 * 32768 + int(i) % 32768 for i in ids],
                dtype="int64")
            frames.append(pd.DataFrame({
                "epoch": np.full(len(ids), e, dtype=np.int64),
                "doc_id": ids.to_numpy(), "n_tokens": nt,
                "__key": key.to_numpy(), "__one": np.int64(1)}))
        return pd.concat(frames, ignore_index=True)

    docs = _io_read(f"{sf_dir}/documents.parquet",
                    columns=["doc_id", "text"]) \
        .map_batches(keyed, batch_format="pandas")

    ranked = ordered_pack(docs, "__key", "__one", budget=1,
                          bucket_width=1 << 50, out_col="shuffle_rank",
                          num_partitions=num_partitions,
                          group_cols=["epoch"])
    # feeds the second pack's totals pass AND its assign pass — left lazy
    # the whole chain would execute twice (the _shuffle_pack hazard)
    ranked = ranked.materialize()
    sharded = ordered_pack(ranked, "__key", "n_tokens", budget=budget,
                           bucket_width=1 << 50, out_col="shard_id",
                           num_partitions=num_partitions,
                           group_cols=["epoch"])

    def finish(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[["epoch", "doc_id", "n_tokens", "shuffle_rank",
                      "shard_id"]].astype("int64")

    return sharded.map_batches(finish, batch_format="pandas")


# ----------------------------------------------- bloom data-skipping index

def bloom_prune_report_ds(sf_dir: str, nbits: int = 256,
                          n_queries: int = 20, num_partitions: int = 32):
    """Bloom data-skipping index + point-lookup prune report — the
    lakehouse file-skipping pattern (Parquet/Delta bloom filters): each
    hour-shard of the event log publishes the SET of md5 bit positions its
    user ids light up (2 salted hashes, ``nbits`` buckets); a point lookup
    consults only the index and reads a shard iff BOTH its bits are
    present. Deterministic md5 bits make index AND report SQL-exact —
    false negatives are impossible by construction (the oracle proves it:
    every actually-containing shard appears), false positives show up as
    ``hit = 0`` rows, the read amplification a capacity planner watches.

    Plan: one streaming pass emits (shard, bit) pairs (per-batch local
    dedup), one coarse distinct builds the index; the ``n_queries``
    smallest user ids probe it — their 2·n probe bits broadcast as a
    constant, candidates resolve per (shard, bit) IN the index partition,
    and ground truth joins in through the same coarse (user, shard)
    partition. Returns (user_id, shard, hit) for every may-contain pair.
    """
    import ray as _ray

    from .agg import partitioned_group_apply
    from .analog import md5_shard
    from .graph import distinct_rows
    from .io import read_table

    ev = read_table(sf_dir, "events", ["ts", "user_id"])

    def shard_user(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "shard": (df["ts"].astype("int64") // 3_600_000_000)
            .astype("int64"),
            "user_id": df["user_id"].astype("int64")}).drop_duplicates()

    su = ev.map_batches(shard_user, batch_format="pandas").materialize()

    def bit_rows(df: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for s in (0, 1):
            frames.append(pd.DataFrame({
                "shard": df["shard"],
                "bit": md5_shard(f"b{s}:" + df["user_id"].astype(str),
                                 nbits)}))
        return pd.concat(frames, ignore_index=True).drop_duplicates()

    bits = distinct_rows(su.map_batches(bit_rows, batch_format="pandas"),
                         ["shard", "bit"], num_partitions)

    # ---- the n smallest user ids (per-block prune, tiny driver merge)
    def bottomq(df: pd.DataFrame) -> pd.DataFrame:
        return df[["user_id"]].drop_duplicates().nsmallest(n_queries,
                                                           "user_id")

    q = su.map_batches(bottomq, batch_format="pandas").to_pandas() \
        .drop_duplicates().nsmallest(n_queries, "user_id")
    probe = pd.concat([
        pd.DataFrame({"user_id": q["user_id"].astype("int64"),
                      "bit": md5_shard(f"b{s}:" + q["user_id"].astype(str),
                                       nbits),
                      "salt": np.full(len(q), s, dtype=np.int64)})
        for s in (0, 1)], ignore_index=True)
    pref = _ray.put(probe)
    quser = _ray.put(set(q["user_id"].astype("int64")))

    def candidates(df: pd.DataFrame, _cache={}) -> pd.DataFrame:
        if "p" not in _cache:  # one fetch/deserialize per worker process
            _cache["p"] = _ray.get(pref)
        m = df.merge(_cache["p"], on="bit")
        return m[["user_id", "shard", "salt"]]

    cand = bits.map_batches(candidates, batch_format="pandas")

    def truth_rows(df: pd.DataFrame, _cache={}) -> pd.DataFrame:
        if "q" not in _cache:
            _cache["q"] = _ray.get(quser)
        qs = _cache["q"]
        m = df[df["user_id"].isin(list(qs))]
        return pd.DataFrame({"user_id": m["user_id"].astype("int64"),
                             "shard": m["shard"].astype("int64"),
                             "salt": np.full(len(m), -1, dtype=np.int64)})

    both = cand.union(su.map_batches(truth_rows, batch_format="pandas"))

    def report(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["user_id", "shard"])["salt"] \
            .agg(lambda s: (1 if {0, 1} <= set(s) else 0)
                 + (2 if (s == -1).any() else 0)).reset_index(name="m")
        may = g[g["m"] % 2 == 1]
        return pd.DataFrame({
            "user_id": may["user_id"].astype("int64"),
            "shard": may["shard"].astype("int64"),
            "hit": (may["m"] >= 2).astype("int64")})

    return partitioned_group_apply(both, ["user_id", "shard"], report,
                                   num_partitions)


def zonemap_prune_report_ds(sf_dir: str, shard_hours: int = 24,
                            num_partitions: int = 32):
    """Zone-map (min/max) data-skipping report — bloom pruning's RANGE
    twin: each day-shard of the event log publishes its (min, max) event
    minute; a fixed band of range queries (one per shard: that shard's
    FIRST hour, the hottest pattern a time-series reader issues) is
    checked against every shard's zone — a shard must be scanned iff its
    [min, max] intersects the query window. Exact by construction (min/max
    on integers); the report shows which scans a zone map saves: rows are
    (query_id, shard, overlaps) for the full query × shard matrix, and
    ``overlaps = 0`` rows are the reads skipped.

    Plan: the zones are a per-batch (shard, min, max) partial reduce —
    one card-sized shuffle; the query band derives from the tiny zone
    table itself; the cross-check is O(shards²) on the driver (shards are
    card-sized at any corpus scale: one row per day)."""
    from .io import read_table
    from .agg import partitioned_group_apply
    from .analog import minute_of

    ev = read_table(sf_dir, "events", ["ts"])
    span = 60 * shard_hours

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        m = minute_of(b["ts"])
        t = pd.DataFrame({"shard": m // span, "minute": m})
        out = t.groupby("shard", as_index=False).agg(
            min_minute=("minute", "min"), max_minute=("minute", "max"))
        return out.astype({"shard": "int64", "min_minute": "int64",
                           "max_minute": "int64"})

    def reduce_shard(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("shard", as_index=False).agg(
            min_minute=("min_minute", "min"),
            max_minute=("max_minute", "max"))
        return out.astype({"shard": "int64", "min_minute": "int64",
                           "max_minute": "int64"})

    zones = partitioned_group_apply(
        ev.map_batches(partial, batch_format="pandas"),
        ["shard"], reduce_shard, num_partitions).to_pandas()
    if "shard" not in zones.columns:
        return pd.DataFrame({"query_id": pd.Series([], dtype="int64"),
                             "shard": pd.Series([], dtype="int64"),
                             "overlaps": pd.Series([], dtype="int64")})
    zones = zones.sort_values("shard").reset_index(drop=True)
    # query band: each shard's first hour [shard*span, shard*span + 59]
    q_lo = zones["shard"].to_numpy() * span
    q_hi = q_lo + 59
    rows = []
    for qi in range(len(zones)):
        overlaps = ((zones["min_minute"].to_numpy() <= q_hi[qi])
                    & (zones["max_minute"].to_numpy() >= q_lo[qi]))
        rows.append(pd.DataFrame({
            "query_id": np.full(len(zones), int(zones["shard"].iloc[qi]),
                                dtype=np.int64),
            "shard": zones["shard"].to_numpy(),
            "overlaps": overlaps.astype(np.int64)}))
    return pd.concat(rows, ignore_index=True)
