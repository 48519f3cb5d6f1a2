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


def source_quality_gate_ds(sf_dir: str, min_mean_len_mc: int = 299_000):
    """Domain-level quality filtering (the RefinedWeb "judge the whole
    site, not just the page" curation step): aggregate a per-doc signal to
    the source, drop every document of a source whose MEAN falls below the
    bar — content farms lose even their few good-looking pages, and a good
    site keeps an occasional weak page.

    The per-doc signal here is document length (the sf corpus is
    punctuation-free, so the 0/1/2 quality bucket is uniform across
    sources; mean length is the discriminating stand-in — "domains of
    mostly-short pages" is itself a standard RefinedWeb drop rule). The
    gate machinery is signal-agnostic: per-source mean length in
    milli-chars ``(1000·Σ n_chars) // n_docs``, keep iff ≥
    ``min_mean_len_mc``. Returns one row per document:
    (doc_id, source, n_chars, src_mean_len_mc, keep).

    Scale plan — at crawl scale the source/domain table is itself
    fact-sized (~250M domains at 10^10 URLs), so the per-source means are
    NOT broadcast: the docs side joins them back through the generic
    shuffle ``hash_join`` on the source key (both sides partition; no
    driver materialization, no small-side assumption). The source agg is
    algebraic per-batch partials ((source, n, s) rows) summed in one
    coarse partition pass — only O(sources) slim rows shuffle.
    """
    from .agg import partitioned_group_apply
    from .joins import hash_join

    path = f"{sf_dir}/documents.parquet"
    docs = _io_read(path, columns=["doc_id", "source", "n_chars"])

    def partials(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby("source", as_index=False).agg(
            n=("doc_id", "size"), s=("n_chars", "sum"))
        return g.astype({"n": "int64", "s": "int64"})

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("source", as_index=False)[["n", "s"]].sum()
        g["src_mean_len_mc"] = (1000 * g["s"]) // g["n"]
        return g[["source", "src_mean_len_mc"]]

    src = partitioned_group_apply(
        docs.map_batches(partials, batch_format="pandas"),
        ["source"], finish, num_partitions=32)

    joined = hash_join(docs, src, on=["source"])

    def gate(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch[["doc_id", "source", "n_chars",
                     "src_mean_len_mc"]].copy()
        out["keep"] = (batch["src_mean_len_mc"] >= min_mean_len_mc) \
            .astype("int64")
        return out

    return joined.map_batches(gate, batch_format="pandas")
