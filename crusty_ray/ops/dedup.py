"""Deduplication operators — exact, MinHash-LSH, SimHash, n-gram Jaccard,
embedding-cosine — each expressed Ray-Data-first.

Scale notes (the part that matters at 100 TB):
- exact dedup is a hash-partitioned ``groupby(content_hash)`` keeping the min
  doc_id per group — one shuffle of (hash, id) pairs, never of full texts;
- MinHash signatures/shingles are computed vectorized per batch, then only the
  (band_id, band_hash, doc_id) triples shuffle (``groupby`` on the band key) —
  the classic sig→band→bucket plan from the LSH literature;
- SimHash buckets by 16-bit quadrants (hamming ≤ 3 ⇒ at least one of four
  quadrants equal — pigeonhole), so candidate generation is again a small-row
  shuffle;
- n-gram Jaccard is the exact verifier (and its own SQL-expressible operator);
- embedding near-dup quantizes to integers (``floor(x·1000)`` in float64) so
  the DuckDB oracle is bit-exact — float scoring paths live in
  ``ops/similarity.py``.
"""

from __future__ import annotations

import hashlib
from collections import defaultdict

import numpy as np
import pandas as pd

import ray

from .io import read_parquet as _io_read

from ..core.hashing import hash64_batch

# ---------------------------------------------------------------- exact dedup

def exact_dedup_ds(sf_dir: str):
    """One surviving doc_id (the min) per distinct text, keyed by md5."""
    def add_hash(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["text_md5"] = [hashlib.md5(t.encode("utf-8")).hexdigest()
                             for t in batch["text"].fillna("")]
        return batch[["doc_id", "text_md5"]]

    from .agg import partitioned_group_apply
    ds = _io_read(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    ds = ds.map_batches(add_hash, batch_format="pandas")

    def first_per_hash(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("text_md5", as_index=False).agg(
            keep_doc_id=("doc_id", "min"), n_dups=("doc_id", "size"))
        return out.astype({"keep_doc_id": "int64", "n_dups": "int64"})

    # high-cardinality key (one group per distinct text) → coarse partitions
    return partitioned_group_apply(ds, ["text_md5"], first_per_hash)


# ---------------------------------------------------------------- shingling

def word_ngrams(text: str, n: int = 3) -> set[str]:
    toks = text.split()
    if len(toks) < n:
        return {" ".join(toks)} if toks else set()
    return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}


# ---------------------------------------------------------------- minhash-lsh

N_PERM = 64
N_BANDS = 16        # 16 bands × 4 rows: catches Jaccard ≳ 0.5 w.h.p.
ROWS_PER_BAND = N_PERM // N_BANDS


_PERM_OFFSETS = (np.arange(N_PERM, dtype=np.uint64)
                 * np.uint64(0x9E3779B97F4A7C15))


def minhash_signature(grams: set[str]) -> np.ndarray:
    """64-perm MinHash from one base hash + splitmix-derived families,
    computed in one vectorized (n_grams × N_PERM) pass."""
    if not grams:
        return np.full(N_PERM, np.iinfo(np.uint64).max, dtype=np.uint64)
    base = hash64_batch(sorted(grams))
    from ..core.hashing import mix64
    with np.errstate(over="ignore"):
        fam = mix64(base[:, None] + _PERM_OFFSETS[None, :])
    return fam.min(axis=0)


def minhash_bands_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """doc → N_BANDS rows (band_id, band_hash, doc_id): the only thing that
    shuffles."""
    out_doc, out_band, out_hash = [], [], []
    for doc_id, text in zip(batch["doc_id"], batch["text"].fillna("")):
        sig = minhash_signature(word_ngrams(text))
        for b in range(N_BANDS):
            chunk = sig[b * ROWS_PER_BAND:(b + 1) * ROWS_PER_BAND]
            h = hashlib.blake2b(chunk.tobytes(), digest_size=8).hexdigest()
            out_doc.append(doc_id)
            out_band.append(b)
            out_hash.append(h)
    return pd.DataFrame({"doc_id": out_doc, "band_id": out_band,
                         "band_hash": out_hash})


def _pairs_from_buckets(group: pd.DataFrame) -> pd.DataFrame:
    ids = sorted(set(group["doc_id"]))
    if len(ids) < 2:
        return pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                             "doc_b": pd.Series([], dtype="int64")})
    a, b = [], []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a.append(ids[i])
            b.append(ids[j])
    return pd.DataFrame({"doc_a": pd.Series(a, dtype="int64"),
                         "doc_b": pd.Series(b, dtype="int64")})


def minhash_candidates_ds(sf_dir: str):
    """documents → LSH candidate pairs (distinct, with matching-band counts).

    Both groupbys key on high-cardinality values (band buckets; pairs), so
    they run as coarse hash partitions with pandas inside (ops/agg.py)."""
    from .agg import partitioned_group_apply
    ds = _io_read(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    bands = ds.map_batches(minhash_bands_batch, batch_format="pandas")

    def pairs_in_part(df: pd.DataFrame) -> pd.DataFrame:
        frames = [_pairs_from_buckets(g)
                  for _, g in df.groupby(["band_id", "band_hash"])]
        if not frames:
            return pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                                 "doc_b": pd.Series([], dtype="int64")})
        return pd.concat(frames, ignore_index=True)

    pairs = partitioned_group_apply(bands, ["band_hash"], pairs_in_part)

    def count_pairs(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(["doc_a", "doc_b"], as_index=False).size() \
                .rename(columns={"size": "n_bands"})
        return out.astype({"n_bands": "int64"})

    return partitioned_group_apply(pairs, ["doc_a", "doc_b"], count_pairs)


def minhash_dedup_pairs(sf_dir: str, threshold: float = 0.7) -> pd.DataFrame:
    """Candidates → exact-Jaccard-verified near-dup pairs (small result).

    The verify step re-reads only candidate docs (broadcast of the candidate
    id set, semi-join inside map_batches) and computes exact word-3-gram
    Jaccard; at scale the verifier is itself a ``map_batches`` over a
    bucket-joined pair table.
    """
    cands = minhash_candidates_ds(sf_dir).to_pandas()
    if not len(cands):
        return pd.DataFrame({"doc_a": [], "doc_b": [], "jaccard_pm": []})
    need = set(cands["doc_a"]) | set(cands["doc_b"])
    need_ref = ray.put(need)

    def project(batch: pd.DataFrame) -> pd.DataFrame:
        want = ray.get(need_ref)
        return batch[batch["doc_id"].isin(want)]

    docs = _io_read(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"]) \
        .map_batches(project, batch_format="pandas").to_pandas()
    grams = {r.doc_id: word_ngrams(r.text or "") for r in docs.itertuples()}
    rows = []
    for a, b in zip(cands["doc_a"], cands["doc_b"]):
        ga, gb = grams.get(a, set()), grams.get(b, set())
        inter = len(ga & gb)
        union = len(ga | gb) or 1
        j = inter / union
        if j >= threshold:
            rows.append({"doc_a": int(a), "doc_b": int(b),
                         "jaccard_pm": int(round(j * 1000))})
    return pd.DataFrame(rows, columns=["doc_a", "doc_b", "jaccard_pm"]) \
        .sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


# ---------------------------------------------------------------- simhash

def simhash64(text: str) -> int:
    toks = text.split()
    if not toks:
        return 0
    hashes = hash64_batch(toks)
    bits = ((hashes[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1))
    counts = bits.sum(axis=0)
    sh = (counts * 2 > len(toks)).astype(np.uint64)
    return int((sh << np.arange(64, dtype=np.uint64)).sum())


def simhash_batch(batch: pd.DataFrame) -> pd.DataFrame:
    vals = np.array([simhash64(t) for t in batch["text"].fillna("")],
                    dtype=np.uint64)
    out = pd.DataFrame({"doc_id": batch["doc_id"]})
    out["simhash"] = vals.astype(np.int64)
    for q in range(4):  # 16-bit quadrant keys for hamming<=3 candidate buckets
        out[f"q{q}"] = ((vals >> np.uint64(16 * q)) & np.uint64(0xFFFF)).astype(np.int64)
    return out


def simhash_pairs(sf_dir: str, max_hamming: int = 3) -> pd.DataFrame:
    """Near-dup pairs by SimHash: quadrant-bucket candidates → hamming verify."""
    ds = _io_read(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    sh = ds.map_batches(simhash_batch, batch_format="pandas").to_pandas()
    sig = dict(zip(sh["doc_id"], sh["simhash"].astype(np.uint64)))
    cand: set[tuple] = set()
    for q in range(4):
        buckets = defaultdict(list)
        for d, v in zip(sh["doc_id"], sh[f"q{q}"]):
            buckets[v].append(d)
        for ids in buckets.values():
            ids = sorted(ids)
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    cand.add((ids[i], ids[j]))
    rows = []
    for a, b in sorted(cand):
        d = int(bin(int(sig[a]) ^ int(sig[b])).count("1"))
        if d <= max_hamming:
            rows.append({"doc_a": int(a), "doc_b": int(b), "hamming": d})
    return pd.DataFrame(rows, columns=["doc_a", "doc_b", "hamming"])


# ---------------------------------------------------------------- ngram jaccard (SQL-parity)

def ngram_jaccard_pairs_ds(sf_dir: str, n: int = 3, threshold_pm: int = 500):
    """Exact word-n-gram Jaccard pairs within each ``source`` partition.

    Fully SQL-expressible (explode n-grams → self-join on gram within source →
    jaccard = inter/union): the oracle-checked face of near-dup. The ``source``
    partition bound is the blocking key that keeps the pair space tractable —
    same role as an LSH band, but deterministic and SQL-checkable. Output uses
    integer per-mille jaccard for cross-engine hash equality.
    """
    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        doc, src, gram = [], [], []
        for d, s, t in zip(batch["doc_id"], batch["source"], batch["text"].fillna("")):
            toks = t.split(" ")
            grams = {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)} \
                if len(toks) >= n else set()
            for g in grams:
                doc.append(d)
                src.append(s)
                gram.append(g)
        return pd.DataFrame({"doc_id": doc, "source": src, "gram": gram})

    ds = _io_read(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "source", "text"])
    grams = ds.map_batches(explode, batch_format="pandas")

    def pairs_in_source(group: pd.DataFrame) -> pd.DataFrame:
        counts = group.groupby("doc_id")["gram"].nunique()
        inter: dict[tuple, int] = defaultdict(int)
        for _, sub in group.groupby("gram"):
            ids = sorted(sub["doc_id"].unique())
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    inter[(ids[i], ids[j])] += 1
        rows = []
        for (a, b), shared in inter.items():
            union = counts[a] + counts[b] - shared
            jpm = (1000 * shared) // union  # integer per-mille (SQL-exact)
            if jpm >= threshold_pm:
                rows.append({"doc_a": a, "doc_b": b, "jaccard_pm": jpm})
        return pd.DataFrame(rows, columns=["doc_a", "doc_b", "jaccard_pm"]).astype(
            {"doc_a": "int64", "doc_b": "int64", "jaccard_pm": "int64"})

    return grams.groupby("source").map_groups(pairs_in_source, batch_format="pandas")


# ---------------------------------------------------------------- embedding near-dup (SQL-parity)

def embedding_quant_dedup_ds(sf_dir: str, threshold: int = 300_000):
    """Near-identical embedding pairs by quantized inner product.

    Embeddings are L2-normalized floats; quantize each dim to
    ``floor(float64(x)·1000)`` (bit-exact in numpy and DuckDB) and join pairs
    within the same ``label`` block with quantized inner product ≥ threshold.
    The float cosine path (brute-force + LSH) is ops/similarity.py.
    """
    def quantize(batch: pd.DataFrame) -> pd.DataFrame:
        q = [np.floor(np.asarray(v, dtype=np.float64) * 1000.0).astype(np.int64)
             for v in batch["embedding"]]
        return pd.DataFrame({"vec_id": batch["vec_id"], "label": batch["label"],
                             "q": q})

    ds = _io_read(f"{sf_dir}/embeddings.parquet")
    qds = ds.map_batches(quantize, batch_format="pandas")

    def pairs(group: pd.DataFrame) -> pd.DataFrame:
        ids = group["vec_id"].to_numpy()
        mat = np.stack(group["q"].to_list())
        order = np.argsort(ids)
        ids, mat = ids[order], mat[order]
        dots = mat @ mat.T
        rows = []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                if dots[i, j] >= threshold:
                    rows.append({"vec_a": int(ids[i]), "vec_b": int(ids[j]),
                                 "qdot": int(dots[i, j])})
        return pd.DataFrame(rows, columns=["vec_a", "vec_b", "qdot"]).astype(
            {"vec_a": "int64", "vec_b": "int64", "qdot": "int64"})

    return qds.groupby("label").map_groups(pairs, batch_format="pandas")


def embedding_cosine_pairs(sf_dir: str, threshold_pm: int = 300) -> pd.DataFrame:
    """Float cosine near-dup pairs within each ``label`` block (the real
    embedding-dedup path; rows-only check — the bit-exact oracle face is
    ``embedding_quant_dedup_ds``). Output similarity as per-mille ints."""
    ds = _io_read(f"{sf_dir}/embeddings.parquet")

    def pairs(group: pd.DataFrame) -> pd.DataFrame:
        ids = group["vec_id"].to_numpy()
        order = np.argsort(ids)
        ids = ids[order]
        mat = np.stack(group["embedding"].to_numpy()[order]).astype(np.float64)
        mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        sims = mat @ mat.T
        iu, ju = np.triu_indices(len(ids), k=1)
        pm = np.floor(sims[iu, ju] * 1000.0).astype(np.int64)
        keep = pm >= threshold_pm
        return pd.DataFrame({"vec_a": pd.Series(ids[iu][keep], dtype="int64"),
                             "vec_b": pd.Series(ids[ju][keep], dtype="int64"),
                             "sim_pm": pd.Series(pm[keep], dtype="int64")})

    return ds.groupby("label").map_groups(pairs, batch_format="pandas")
