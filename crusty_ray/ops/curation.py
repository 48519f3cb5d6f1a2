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


def _surprisal_rank(ds, out_col: str, num_partitions: int,
                    group_cols: list[str] | None = None):
    """Shared rank plumbing for the surprisal-ordered ops: rank rows by
    ``(mean_millibits, doc_id)`` (globally, or within ``group_cols``) with
    ``pack.ordered_pack``'s two-phase range-partitioned prefix scan —
    weight 1 / budget 1 makes the pack index an exclusive prefix COUNT,
    i.e. a 0-based rank, with no global sort.

    The composite int64 key ``millibits * 2^40 + doc_id`` totalizes the
    order while keeping range buckets aligned to the difficulty axis
    (doc_id < 2^40 — the repo-wide packing invariant, one definition here).
    Input needs columns ``doc_id``, ``mean_millibits`` (+ group cols);
    passthrough columns survive."""
    from .pack import ordered_pack

    def keyed(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch.copy()
        b["__key"] = (b["mean_millibits"].astype("int64") * (1 << 40)
                      + b["doc_id"].astype("int64"))
        b["__one"] = np.int64(1)
        return b

    return ordered_pack(ds.map_batches(keyed, batch_format="pandas"),
                        "__key", "__one", budget=1,
                        bucket_width=64 << 40, out_col=out_col,
                        num_partitions=num_partitions,
                        group_cols=group_cols)


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


def source_overlap_matrix_ds(sf_dir: str, n: int = 3,
                             num_partitions: int = 32):
    """Inter-source n-gram overlap matrix — the mirror-site / re-crawl
    detector a corpus curation run uses to drop whole duplicated SOURCES
    before per-document dedup (the RefinedWeb/Dolma "source-level" analog
    of ``ngram_jaccard_pairs``): for every unordered source pair, how many
    distinct word n-grams they share, scored as integer per-mille Jaccard
    over the union of their distinct gram sets.

    Scale plan (pure slim-row shuffles, no doc pair space): distinct
    (source, gram) rows are pre-deduped IN-BATCH at explode, fully deduped
    and counted inside ONE coarse gram-hash partition pass — each gram's
    source list lives in exactly one partition, so the per-gram source-pair
    contributions (and each source's distinct-gram total) are decided
    exactly there. Per-pair/per-source partial counts (O(sources²)
    ≪ corpus) sum in a second slim pass. Sources are a bounded label set
    (thousands at web scale), so the final matrix is tiny; the gram rows —
    the fact-sized part — move through exactly one hash partition.
    A hot gram shared by all S sources contributes S(S-1)/2 pair rows from
    its single partition: bounded by the label-set size, not the corpus.

    Returns (source_a, source_b, shared, union_, jaccard_pm) for every
    pair with shared ≥ 1 and source_a < source_b (string order); ``union_``
    is trailing-underscored because UNION is reserved in SQL.
    """
    from .agg import partitioned_group_apply

    path = f"{sf_dir}/documents.parquet"

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        src, gram = [], []
        for s, t in zip(batch["source"], batch["text"].fillna("")):
            for g in space_split_ngrams(t, n):
                src.append(s)
                gram.append(g)
        return pd.DataFrame({"source": pd.Series(src, dtype="object"),
                             "gram": pd.Series(gram, dtype="object")}) \
            .drop_duplicates()

    grams = _io_read(path, columns=["source", "text"]) \
        .map_batches(explode, batch_format="pandas")

    def pair_partials(df: pd.DataFrame) -> pd.DataFrame:
        # batches may re-introduce duplicates across docs: final dedup here,
        # where every (source, gram) row of a gram is co-located
        df = df.drop_duplicates()
        m = df.merge(df, on="gram")
        m = m[m["source_x"] < m["source_y"]]
        pairs = m.groupby(["source_x", "source_y"], as_index=False) \
            .agg(shared=("gram", "size"))
        pairs.columns = ["source_a", "source_b", "shared"]
        totals = df.groupby("source", as_index=False) \
            .agg(n_grams=("gram", "size"))
        # side-channel the per-source totals through the same slim stream
        totals = pd.DataFrame({
            "source_a": totals["source"].astype(str),
            "source_b": pd.Series(["\x00total"] * len(totals),
                                  dtype="object"),
            "shared": totals["n_grams"].astype("int64"),
        })
        return pd.concat([pairs, totals], ignore_index=True)

    partials = partitioned_group_apply(grams, ["gram"], pair_partials,
                                       num_partitions)

    def reduce_pairs(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["source_a", "source_b"], as_index=False) \
            .agg(shared=("shared", "sum"))

    summed = partitioned_group_apply(partials, ["source_a", "source_b"],
                                     reduce_pairs, num_partitions)

    # O(sources²) rows from here on — tiny by contract; finish driver-side
    sm = summed.to_pandas()
    tot = sm[sm["source_b"] == "\x00total"] \
        .set_index("source_a")["shared"]
    pairs = sm[sm["source_b"] != "\x00total"].copy()
    na = pairs["source_a"].map(tot).astype("int64")
    nb = pairs["source_b"].map(tot).astype("int64")
    union = na + nb - pairs["shared"]
    pairs["union_"] = union.astype("int64")
    pairs["jaccard_pm"] = ((1000 * pairs["shared"]) // union).astype("int64")
    pairs["shared"] = pairs["shared"].astype("int64")
    return pairs.reset_index(drop=True)


def split_leakage_ds(sf_dir: str, threshold_pm: int = 500,
                     num_partitions: int = 32,
                     max_gram_df: int | None = None):
    """Train/test contamination audit — the curation step that keeps a
    held-out split honest: a val/test document is LEAKED when its dedup
    group (exact-md5 ∪ n-gram-Jaccard near-dup connected components, the
    ``doc_dedup_groups`` decision surface) also contains a TRAIN document.
    This is the split-aware reading of "deduplicate across splits"
    (Lee et al. 2021 §6; GPT-3's contamination analysis) — run it BEFORE
    training, drop or re-split the flagged rows.

    Plan (all fact-scale sides co-partitioned, nothing driver-held):
      1. dedup groups: reuse ``doc_dedup_groups_ds`` (distributed edges →
         connected components);
      2. split labels: ``sample.assign_splits`` md5-bucket 90/5/5 — a pure
         row function;
      3. one ``hash_join`` on doc_id attaches splits to groups;
      4. per-canonical "has a train member" is a slim grouped max over
         (canonical_id, is_train), joined back through a second
         ``hash_join`` on canonical_id — both joins shuffle only slim
         int64 rows.
    Returns LEFT-complete (doc_id, split, canonical_id, leaked): every doc
    gets a verdict; train rows are 0 by definition.
    """
    from .agg import partitioned_group_apply
    from .dedup import doc_dedup_groups_ds
    from .io import read_table
    from .joins import hash_join
    from .sample import assign_splits

    groups = doc_dedup_groups_ds(sf_dir, threshold_pm=threshold_pm,
                                 max_gram_df=max_gram_df)

    def slim_groups(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[["doc_id", "canonical_id"]].astype("int64")

    groups = groups.map_batches(slim_groups, batch_format="pandas")
    splits = assign_splits(read_table(sf_dir, "documents", ["doc_id"]),
                           "doc_id",
                           {"train": 900, "val": 950, "test": 1000})
    joined = hash_join(groups, splits, on=["doc_id"],
                       num_partitions=num_partitions)
    # joined feeds TWO consumers (the has_train reduce and the final join);
    # left lazy, its upstream shuffle chain would execute twice — the exact
    # hazard hash_join's _materialize_if_shuffle_lineage documents (8x wall
    # on re-executed chains)
    joined = joined.materialize()

    def train_partials(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.assign(has_train=(batch["split"] == "train")
                           .astype("int64")) \
            .groupby("canonical_id", as_index=False)["has_train"].max()
        return out.astype({"canonical_id": "int64", "has_train": "int64"})

    def train_reduce(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("canonical_id", as_index=False)["has_train"].max()
        return out.astype({"canonical_id": "int64", "has_train": "int64"})

    has_train = partitioned_group_apply(
        joined.map_batches(train_partials, batch_format="pandas"),
        ["canonical_id"], train_reduce, num_partitions)

    flagged = hash_join(joined, has_train, on=["canonical_id"],
                        num_partitions=num_partitions)

    def verdict(batch: pd.DataFrame) -> pd.DataFrame:
        leaked = ((batch["split"] != "train")
                  & (batch["has_train"] == 1)).astype("int64")
        return pd.DataFrame({
            "doc_id": batch["doc_id"].astype("int64"),
            "split": batch["split"].astype(str),
            "canonical_id": batch["canonical_id"].astype("int64"),
            "leaked": leaked,
        })

    return flagged.map_batches(verdict, batch_format="pandas")


def curriculum_order_ds(sf_dir: str, num_partitions: int = 32):
    """Curriculum ordering — rank every document by a difficulty signal
    (unigram-LM surprisal, ``text.unigram_surprisal_ds``'s integer
    mean_millibits) so training can consume easy->hard (Bengio et al.
    2009 curriculum learning; data-ordering studies use exactly this
    LM-surprisal proxy). The output is the global training ORDER, not a
    score: rank 0 is the easiest (lowest-surprisal) document, ties broken
    by doc_id — a total, engine-independent order.

    Scale plan: the global rank is NOT a global sort — it reuses
    ``pack.ordered_pack``'s two-phase range-partitioned prefix scan with
    weight 1 / budget 1 (rank = exclusive prefix count): phase 1 ships one
    count per difficulty range-bucket (O(buckets) driver rows), phase 2 is
    a shuffle-free map adding bucket offsets. The composite int64 key
    ``millibits * 2^40 + doc_id`` makes the order total while keeping
    range buckets aligned to the difficulty axis.

    Returns (doc_id, difficulty_millibits, rank).
    """
    from .text import unigram_surprisal_ds

    surp = unigram_surprisal_ds(sf_dir) \
        .map_batches(lambda b: b[["doc_id", "mean_millibits"]],
                     batch_format="pandas")
    ranked = _surprisal_rank(surp, "rank", num_partitions)

    def finish(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": batch["doc_id"].astype("int64"),
            "difficulty_millibits": batch["mean_millibits"].astype("int64"),
            "rank": batch["rank"].astype("int64"),
        })

    return ranked.map_batches(finish, batch_format="pandas")


def vocab_growth_ds(sf_dir: str, n_checkpoints: int = 10,
                    num_partitions: int = 32):
    """Heaps'-law vocabulary-growth curve — distinct tokens seen after
    each decile of the corpus (docs ordered by doc_id): the diagnostic
    that tells a corpus builder whether more data still buys new
    vocabulary or the source is saturating (sub-linear growth flattening
    early = heavy duplication or a closed domain).

    Scale plan: tokens never re-shuffle per checkpoint — each batch emits
    per-token (token, min_bucket) partials (the FIRST decile the token
    appears in, computable in-batch because deciles are a pure function
    of doc_id); one coarse token partition takes the global min per
    token; the curve is the O(n_checkpoints) cumulative histogram of
    those minima. One shuffle of distinct (token, bucket) pairs total.

    Returns (checkpoint, docs_upto, new_tokens, vocab_size):
    checkpoint k covers doc_ids in [0, (k+1)·ceil(N/K)), vocab_size is
    cumulative.
    """
    from .agg import partitioned_group_apply

    path = f"{sf_dir}/documents.parquet"
    n_docs = _io_read(path, columns=["doc_id"]).count()
    k = n_checkpoints
    step = (n_docs + k - 1) // k  # ceil(N/K)

    def partials(batch: pd.DataFrame) -> pd.DataFrame:
        w = batch["text"].fillna("").str.split(" ").explode()
        w = w[w != ""].dropna()
        bucket = (batch["doc_id"].astype("int64") // step) \
            .reindex(w.index)
        out = pd.DataFrame({"w": w.to_numpy(),
                            "b": bucket.to_numpy(dtype=np.int64)})
        return out.groupby("w", as_index=False)["b"].min() \
            .astype({"b": "int64"})

    def bucket_counts(df: pd.DataFrame) -> pd.DataFrame:
        # every token lives in exactly this partition: its global first
        # bucket is exact here, so emit the <= K-row histogram partial —
        # the driver never sees token strings (O(K x partitions) rows)
        m = df.groupby("w")["b"].min()
        out = m.groupby(m).size().rename_axis("b").reset_index(name="new")
        return out.astype("int64")

    parts = partitioned_group_apply(
        _io_read(path, columns=["doc_id", "text"])
        .map_batches(partials, batch_format="pandas"),
        ["w"], bucket_counts, num_partitions).to_pandas()

    counts = parts.groupby("b")["new"].sum()
    rows, cum = [], 0
    for c in range(k):
        new = int(counts.get(c, 0))
        cum += new
        rows.append({"checkpoint": c,
                     "docs_upto": min((c + 1) * step, n_docs),
                     "new_tokens": new, "vocab_size": cum})
    return pd.DataFrame(rows).astype("int64")


def corpus_report_ds(sf_dir: str):
    """Dataset-card composition report — docs and tokens per
    (source, lang) with ROLLUP margins (per-source totals + grand total),
    the table every dataset release publishes (C4/Pile/Dolma dataset
    cards) and the input the mixture-weight ops consume.

    Scale plan: per-batch pre-aggregated (source, lang, n_docs, n_tokens)
    partials — O(sources x langs) rows per block — reduced on the driver
    (the result is card-sized by definition); ROLLUP margins derive from
    the finest level, one pass over the corpus total. Token = non-empty
    whitespace token (the ``tk`` convention shared with the surprisal /
    BM25 faces); rolled-up columns carry the 'ALL' sentinel so the face
    stays string-typed (no NULL hash ambiguity).

    Returns (source, lang, n_docs, n_tokens).
    """
    path = f"{sf_dir}/documents.parquet"

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        from .text import n_tokens_nonempty
        df = pd.DataFrame({"source": batch["source"].astype(str),
                           "lang": batch["lang"].astype(str),
                           "n_tokens": n_tokens_nonempty(batch["text"])})
        out = df.groupby(["source", "lang"], as_index=False).agg(
            n_docs=("n_tokens", "size"), n_tokens=("n_tokens", "sum"))
        return out.astype({"n_docs": "int64", "n_tokens": "int64"})

    parts = _io_read(path, columns=["source", "lang", "text"]) \
        .map_batches(partial, batch_format="pandas").to_pandas()
    finest = parts.groupby(["source", "lang"], as_index=False)[
        ["n_docs", "n_tokens"]].sum()
    per_source = finest.groupby("source", as_index=False)[
        ["n_docs", "n_tokens"]].sum()
    per_source["lang"] = "ALL"
    grand = pd.DataFrame([{
        "source": "ALL", "lang": "ALL",
        "n_docs": int(finest["n_docs"].sum()),
        "n_tokens": int(finest["n_tokens"].sum())}])
    out = pd.concat([finest, per_source, grand], ignore_index=True)
    out = out[["source", "lang", "n_docs", "n_tokens"]] \
        .astype({"n_docs": "int64", "n_tokens": "int64"})
    return out.sort_values(["source", "lang"]).reset_index(drop=True)


def quality_blend_rank_ds(sf_dir: str):
    """FineWeb/DCLM-style ensemble quality score: blend several weak
    quality signals by their GLOBAL percentile rank rather than raw value
    (raw signals have incomparable scales; ranks are scale-free). Signals
    are the integer Gopher kernels (``text.gopher_quality_ds``): n_words
    (up-weighted 2x, longer = better here), dup_2gram_pm and top_word_pm
    (repetition/dominance, lower = better, so their percentiles invert).

    blend_pm = (2·p_words + (1000 − p_dup) + (1000 − p_top)) // 4, where
    p_x = 1000·(strictly-lower count) // max(N−1, 1) — DuckDB's
    ``(rank() OVER (ORDER BY x) − 1)`` percent-rank numerator, ties
    sharing the min rank.

    Scale plan: a percentile rank needs only "how many docs score strictly
    lower", and every signal has bounded cardinality (per-mille signals
    ≤ 1001 distinct values; n_words ≤ max doc length) — so one
    ``map_batches`` emits per-batch (signal, value, count) histogram
    partials, one small ``groupby`` reduces them, the driver cumulates
    O(distinct values) rows into exclusive prefix counts, and a broadcast
    (``ray.put``) shuffle-free ``searchsorted`` map scores every doc. No
    global sort, no per-doc shuffle. The signal table is materialized once
    (per-doc int columns only) because both the histogram pass and the
    scoring pass consume it.

    Returns (doc_id, words_pct_pm, dup_pct_pm, top_pct_pm, blend_pm).
    """
    import ray as _ray
    from ray.data.aggregate import Sum

    from .text import gopher_quality_ds

    _SIGS = ["n_words", "dup_2gram_pm", "top_word_pm"]
    sig = gopher_quality_ds(sf_dir).materialize()

    def hist(batch: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for col in _SIGS:
            vc = batch[col].value_counts()
            outs.append(pd.DataFrame({
                "sig": col,
                "v": vc.index.to_numpy(dtype=np.int64),
                "c": vc.to_numpy(dtype=np.int64)}))
        return pd.concat(outs, ignore_index=True)

    hs = sig.map_batches(hist, batch_format="pandas") \
        .groupby(["sig", "v"]).aggregate(Sum("c", alias_name="c")) \
        .to_pandas()

    n_docs = int(hs.loc[hs["sig"] == _SIGS[0], "c"].sum())
    nm1 = max(n_docs - 1, 1)
    maps = {}
    for col in _SIGS:
        h = hs[hs["sig"] == col].sort_values("v")
        vals = h["v"].to_numpy(dtype=np.int64)
        # exclusive prefix count = docs strictly below each distinct value
        smaller = np.concatenate(
            [[0], np.cumsum(h["c"].to_numpy(dtype=np.int64))[:-1]])
        maps[col] = (vals, smaller)
    maps_ref = _ray.put((maps, nm1))

    def score(batch: pd.DataFrame, _cache={}) -> pd.DataFrame:
        if "m" not in _cache:  # one object-store fetch per worker process
            _cache["m"] = _ray.get(maps_ref)
        m, d = _cache["m"]
        pct = {}
        for col in _SIGS:
            vals, smaller = m[col]
            # every batch value is present in vals by construction
            idx = np.searchsorted(vals, batch[col].to_numpy(dtype=np.int64))
            pct[col] = (1000 * smaller[idx]) // d
        blend = (2 * pct["n_words"] + (1000 - pct["dup_2gram_pm"])
                 + (1000 - pct["top_word_pm"])) // 4
        return pd.DataFrame({
            "doc_id": batch["doc_id"].astype("int64"),
            "words_pct_pm": pct["n_words"].astype(np.int64),
            "dup_pct_pm": pct["dup_2gram_pm"].astype(np.int64),
            "top_pct_pm": pct["top_word_pm"].astype(np.int64),
            "blend_pm": blend.astype(np.int64),
        })

    return sig.map_batches(score, batch_format="pandas")


def ccnet_perplexity_buckets_ds(sf_dir: str, num_partitions: int = 32):
    """CCNet-style perplexity bucketing: within each language, split the
    corpus into head / middle / tail thirds by LM surprisal (Wenzek et al.
    2020 — CCNet keeps the "head" as the cleanest training slice and
    discards or down-weights the tail). Difficulty is the integer
    ``mean_millibits`` from ``text.unigram_surprisal_ds``; the within-lang
    order is made total by (mean_millibits, doc_id), so the buckets are
    engine-independent: bucket = head iff rank0·3 < n_lang, middle iff
    rank0·3 < 2·n_lang, else tail (rank0 = 0-based within-lang rank).

    Scale plan: NO global or per-lang sort. The within-lang rank reuses
    ``pack.ordered_pack``'s two-phase range-partitioned prefix scan with
    ``group_cols=["lang"]`` (weight 1, budget 1 → rank): phase 1 ships one
    count per (lang, difficulty-bucket) — O(langs × buckets) driver rows —
    phase 2 is a shuffle-free map adding offsets. A hot language spreads
    across difficulty buckets instead of landing in one task. Per-lang
    totals are a card-sized ``grouped_count`` broadcast through the
    closure.

    Returns (doc_id, lang, mean_millibits, ppl_bucket).
    """
    from .agg import grouped_count
    from .joins import hash_join
    from .text import unigram_surprisal_ds

    surp = unigram_surprisal_ds(sf_dir) \
        .map_batches(lambda b: b[["doc_id", "mean_millibits"]],
                     batch_format="pandas")
    langs = _io_read(f"{sf_dir}/documents.parquet",
                     columns=["doc_id", "lang"])
    scored = hash_join(surp, langs, on=["doc_id"],
                       num_partitions=num_partitions)

    n_lang = grouped_count(
        _io_read(f"{sf_dir}/documents.parquet", columns=["lang"]),
        ["lang"], "n", num_partitions).to_pandas()
    totals = dict(zip(n_lang["lang"], n_lang["n"].astype(int)))

    ranked = _surprisal_rank(scored, "__rank0", num_partitions,
                             group_cols=["lang"])

    def finish(batch: pd.DataFrame) -> pd.DataFrame:
        n = batch["lang"].map(totals).astype("int64").to_numpy()
        r3 = batch["__rank0"].astype("int64").to_numpy() * 3
        bucket = np.where(r3 < n, "head",
                          np.where(r3 < 2 * n, "middle", "tail"))
        return pd.DataFrame({
            "doc_id": batch["doc_id"].astype("int64"),
            "lang": batch["lang"].astype(str),
            "mean_millibits": batch["mean_millibits"].astype("int64"),
            "ppl_bucket": pd.Series(bucket, dtype="object",
                                    index=batch.index)})

    return ranked.map_batches(finish, batch_format="pandas")


# -------------------------------- chi² discriminative tokens per source

def source_token_chi2_ds(sf_dir: str, k: int = 10,
                         num_partitions: int = 32):
    """Top-``k`` DISCRIMINATIVE tokens per source by the 2×2 chi-square
    statistic over document frequency — the classic feature-selection
    score (Yang & Pedersen ICML'97) a corpus curator uses to fingerprint
    what makes each source distinct (and a quality analyst uses to catch
    boilerplate: a template string chi²-locks onto its source).

    For token t and source s over N docs:
      o11 = docs in s containing t        o12 = df(t) − o11
      o21 = n_s − o11                     o22 = N − n_s − o12
      chi² = N·(o11·o22 − o12·o21)² / ((o11+o12)(o21+o22)(o11+o21)(o12+o22))

    Integer contract: ``chi2_e6 = trunc(chi²·10^6)`` computed with Python
    bignums (the cross term overflows int64; DuckDB mirrors in HUGEINT);
    the result ≤ N·10^6 fits int64. Only tokens PRESENT in the source are
    ranked (absent tokens measure anti-association), and tokens appearing
    in every doc are excluded (o21+o22 = 0 — chi² undefined; they also
    discriminate nothing). Ties break by token string.

    Scale plan: DISTINCT (doc, source, token) rows explode in-batch; one
    token-keyed coarse partition holds each token's whole posting list, so
    df and the per-source o11 are exact in-partition; the per-source doc
    counts (card-sized: o(sources)) broadcast as plain Python values
    captured in the closure; ``grouped_top_n`` finishes the per-source
    top-k. No text ever shuffles.

    Returns (source, w, o11, chi2_e6, rnk), rnk 1..k — bit-exact vs
    ``oracle_sql()['source_token_chi2']``."""
    from .agg import grouped_top_n, partitioned_group_apply

    docs = _io_read(f"{sf_dir}/documents.parquet",
                    columns=["doc_id", "source", "text"])

    # card-sized source census (one tiny aggregate; the only driver state)
    census = docs.map_batches(
        lambda b: b.groupby("source", as_index=False)
                   .agg(n_s=("doc_id", "size")),
        batch_format="pandas").to_pandas() \
        .groupby("source", as_index=False)["n_s"].sum()
    n_s_map = dict(zip(census["source"], census["n_s"].astype(int)))
    n_total = int(census["n_s"].sum())

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        ids, srcs, toks = [], [], []
        for d, s, t in zip(batch["doc_id"], batch["source"],
                           batch["text"].fillna("")):
            ws = {w for w in t.split(" ") if w}
            ids.extend([int(d)] * len(ws))
            srcs.extend([s] * len(ws))
            toks.extend(ws)
        return pd.DataFrame({"doc_id": pd.Series(ids, dtype="int64"),
                             "source": pd.Series(srcs, dtype=object),
                             "w": pd.Series(toks, dtype=object)})

    rows = docs.map_batches(explode, batch_format="pandas")

    def chi2_in_part(df: pd.DataFrame) -> pd.DataFrame:
        out = {"source": [], "w": [], "o11": [], "chi2_e6": []}
        per = df.groupby("w")
        for w, grp in per:
            dft = len(grp)  # distinct docs containing w (doc_id unique)
            if dft >= n_total:
                continue  # token in every doc: o21+o22 = 0, undefined
            for s, o11 in grp.groupby("source")["doc_id"].size().items():
                o11 = int(o11)
                n_s = n_s_map[s]
                o12 = dft - o11
                o21 = n_s - o11
                o22 = n_total - n_s - o12
                num = n_total * (o11 * o22 - o12 * o21) ** 2 * 10 ** 6
                den = (o11 + o12) * (o21 + o22) * (o11 + o21) * (o12 + o22)
                if den == 0:
                    continue  # single-source corpus (o12+o22 = 0)
                out["source"].append(s)
                out["w"].append(w)
                out["o11"].append(o11)
                out["chi2_e6"].append(num // den)
        return pd.DataFrame({
            "source": pd.Series(out["source"], dtype=object),
            "w": pd.Series(out["w"], dtype=object),
            "o11": pd.Series(out["o11"], dtype="int64"),
            "chi2_e6": pd.Series(out["chi2_e6"], dtype="int64")})

    scored = partitioned_group_apply(rows, ["w"], chi2_in_part,
                                     num_partitions)
    return grouped_top_n(scored, ["source"], "chi2_e6", k, ascending=False,
                         tie_cols=["w"], rank_col="rnk",
                         num_partitions=num_partitions)
