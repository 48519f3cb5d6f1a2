"""End-to-end corpus curation — the flagship training-data composition.

One pipeline chaining the standard pre-training hygiene steps over the
documents table, each step the same deterministic convention as its
standalone oracle-checked face:

    quality gate  (``text.quality_class`` buckets; keep fair+good)
  → exact dedup   (``dedup.exact_dedup_ds``: min doc_id per md5(text))
  → decontaminate (``text.decontaminate_ds``: 3-gram overlap vs the
                   held-out benchmark source; keepers must be clean)
  → split assign  (``sample.assign_splits``: stable 90/5/5 md5 buckets)

The whole chain costs ONE shuffle: every per-document feature (quality
bucket, text md5, contamination count against the broadcast benchmark-gram
set, split bucket) is computed in a single shuffle-free ``map_batches``
pass, and the only exchange is the exact-dedup group-apply on the text
hash. At 100 TB that is the minimum possible: dedup inherently co-locates
equal texts; everything else stays embarrassingly parallel.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from .io import read_parquet as _io_read
from .text import _PUNCT_RE, bench_gram_ref, space_split_ngrams


def corpus_curation_ds(sf_dir: str, bench_source: str = "src0",
                       n: int = 5, num_partitions: int = 32):
    """Surviving curated corpus: one row per kept document —
    (doc_id, quality_bucket, n_dups, split).

    Contract (SQL-oracled end to end):
    - corpus = documents outside ``bench_source`` with quality_bucket >= 1;
    - within the corpus, one keeper (min doc_id) per distinct text;
      ``n_dups`` = how many corpus docs shared its text;
    - a keeper survives only if NONE of its word n-grams appear in the
      benchmark source's documents (5-grams here — the standalone
      ``decontaminate`` face scores 3-gram overlap, but a curation DROP
      wants the longer, lower-false-positive span, GPT-3-style);
    - ``split`` is the stable 90/5/5 md5-bucket assignment of the doc_id.
    """
    import ray as _ray

    path = f"{sf_dir}/documents.parquet"
    gref = bench_gram_ref(path, bench_source, n)

    def per_doc(batch: pd.DataFrame, _cache={}) -> pd.DataFrame:
        if "g" not in _cache:  # one object-store fetch per worker process
            _cache["g"] = _ray.get(gref)
        bg = _cache["g"]
        sub = batch[batch["source"] != bench_source]
        text = sub["text"].fillna("")
        n_chars = text.str.len()
        n_punct = text.str.count(_PUNCT_RE)
        qb = np.where((n_chars >= 100) & (n_chars <= 2000) & (n_punct > 0),
                      2, np.where(n_chars >= 30, 1, 0)).astype(np.int64)
        keep = qb >= 1
        sub, text, qb = sub[keep], text[keep], qb[keep]
        md5s = [hashlib.md5(t.encode("utf-8")).hexdigest() for t in text]
        cont = np.fromiter(
            (len(space_split_ngrams(t, n) & bg) for t in text),
            dtype=np.int64, count=len(text))
        return pd.DataFrame({
            "doc_id": sub["doc_id"].astype("int64").to_numpy(),
            "text_md5": pd.Series(md5s, dtype="object"),
            "quality_bucket": qb,
            "n_contaminated": cont,
        })

    def keeper_per_hash(df: pd.DataFrame) -> pd.DataFrame:
        df = df.reset_index(drop=True)  # idxmin needs unique labels
        k = df.loc[df.groupby("text_md5")["doc_id"].idxmin()]
        sizes = df.groupby("text_md5").size()
        k = k.assign(n_dups=sizes.loc[k["text_md5"]].to_numpy(np.int64))
        k = k[k["n_contaminated"] == 0]
        return k[["doc_id", "quality_bucket", "n_dups"]].astype("int64") \
            .reset_index(drop=True)

    from .agg import partitioned_group_apply

    feats = _io_read(path, columns=["doc_id", "source", "text"]) \
        .map_batches(per_doc, batch_format="pandas")
    keepers = partitioned_group_apply(feats, ["text_md5"], keeper_per_hash,
                                      num_partitions)

    # same 90/5/5 md5-bucket convention as sample.assign_splits (a pure row
    # function of doc_id, so it's recomputed in place instead of joining
    # assign_splits' (doc_id, split) projection back onto the stats)
    def with_split(batch: pd.DataFrame) -> pd.DataFrame:
        from .analog import md5_shard
        b = md5_shard(batch["doc_id"], 1000)
        split = np.where(b < 900, "train", np.where(b < 950, "val", "test"))
        out = batch.copy()
        out["split"] = pd.Series(split, dtype="object", index=batch.index)
        return out

    return keepers.map_batches(with_split, batch_format="pandas")
