"""Deterministic sampling / splitting — training-data pipeline staples.

Both ops key every decision off a stable per-row hash (first 8 md5 hex digits
of the id — the same DuckDB-replicable face as ``analog.md5_shard``), so:

- results are reproducible run-to-run and engine-to-engine (no RNG state,
  no partition-order dependence — the decision is a pure row function, so it
  commutes with any repartitioning and streams at any scale);
- membership is stable under corpus growth: a doc's sample/split assignment
  never changes when other docs are added or removed (the property that
  keeps train/test splits honest across dataset versions).

Per-row md5 costs what ``text.fingerprint`` already pays (measured
compute-bound, required for oracle parity); swap in ``hash64_batch`` when
cross-engine SQL parity is not needed.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd


def _md5_bucket_pm(values: pd.Series) -> np.ndarray:
    """Per-mille bucket (0..999) — analog.md5_shard with 1000 shards (one
    kernel, one DuckDB-replicable convention; see its oracle SQL)."""
    from .analog import md5_shard
    return md5_shard(values, 1000)


def sample_stratified(ds, id_col: str, stratum_col: str,
                      rate_pm: dict[str, int], default_pm: int = 0):
    """Keep each row iff its id's per-mille bucket < its stratum's rate —
    per-stratum Bernoulli sampling with deterministic membership. One
    embarrassingly-parallel ``map_batches``; no shuffle, no driver pass."""

    def pick(batch: pd.DataFrame) -> pd.DataFrame:
        b = _md5_bucket_pm(batch[id_col])
        rates = batch[stratum_col].map(rate_pm).fillna(default_pm) \
            .to_numpy(dtype=np.int64)
        return batch.loc[b < rates, [id_col, stratum_col]]

    return ds.map_batches(pick, batch_format="pandas")


def assign_splits(ds, id_col: str, bounds_pm: dict[str, int],
                  out_col: str = "split", append: bool = False):
    """Deterministic train/val/test assignment: ``bounds_pm`` maps split name
    to the EXCLUSIVE per-mille upper bound, e.g. {"train": 900, "val": 950,
    "test": 1000} → buckets [0,900) train, [900,950) val, [950,1000) test.
    Emits (id_col, out_col), or the full row + out_col when ``append=True``;
    same stability guarantees as the sampler."""
    names = sorted(bounds_pm, key=bounds_pm.get)
    cuts = [bounds_pm[n] for n in names]
    assert cuts[-1] == 1000, "last bound must be 1000 (cover all buckets)"

    def assign(batch: pd.DataFrame) -> pd.DataFrame:
        b = _md5_bucket_pm(batch[id_col])
        idx = np.searchsorted(cuts, b, side="right")
        split = pd.Series([names[i] for i in idx], dtype="object")
        if append:
            out = batch.reset_index(drop=True).copy()
            out[out_col] = split
            return out
        return pd.DataFrame({
            id_col: batch[id_col].reset_index(drop=True),
            out_col: split})

    return ds.map_batches(assign, batch_format="pandas")


# ----------------------------------------------------------- contract faces

def sample_stratified_ds(sf_dir: str):
    """Per-source document sampling, rate_pm = 50·(src_index+1) — src0 keeps
    ~5%, src19 keeps 100% (the up/down-weighting shape of a training-data
    mixture)."""
    from .io import read_table
    rates = {f"src{i}": 50 * (i + 1) for i in range(20)}
    ds = read_table(sf_dir, "documents", ["doc_id", "source"])
    return sample_stratified(ds, "doc_id", "source", rates)


def split_assignment_ds(sf_dir: str):
    """documents → (doc_id, split) with the 90/5/5 md5-bucket split."""
    from .io import read_table
    ds = read_table(sf_dir, "documents", ["doc_id"])
    return assign_splits(ds, "doc_id",
                         {"train": 900, "val": 950, "test": 1000})


def stratified_exact_k_ds(sf_dir: str, k: int = 20):
    """Exactly-k-per-stratum deterministic sample: within each ``source``,
    keep the k docs with the smallest md5(doc_id) digest (ties by doc_id —
    md5 collisions on distinct ids are practically impossible but the total
    order must not rely on that). The fixed-size counterpart of the
    Bernoulli sampler above: eval sets and per-source audits need EXACTLY k
    rows per stratum, not a rate.

    The md5-hex rank is a uniform permutation of each stratum, so the k
    rows are an unbiased fixed-size sample, stable run-to-run and
    engine-to-engine. Scale plan: ``grouped_top_n`` — a local per-batch
    prune keeps ≤ k rows per source per block, then ONE coarse partition
    finishes; no global sort, no stratum ever whole in one task before the
    prune."""
    import hashlib

    from .agg import grouped_top_n
    from .io import read_table

    def keyed(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "source": batch["source"].astype(str),
            "doc_id": batch["doc_id"].astype("int64").to_numpy(),
            "rank_md5": [hashlib.md5(str(int(d)).encode()).hexdigest()
                         for d in batch["doc_id"]]})

    ds = read_table(sf_dir, "documents", ["doc_id", "source"]) \
        .map_batches(keyed, batch_format="pandas")
    top = grouped_top_n(ds, ["source"], "rank_md5", n=k, ascending=True,
                        tie_cols=["doc_id"]).to_pandas()
    if top.empty:  # Ray drops the schema when every partition is empty
        top = pd.DataFrame({"source": pd.Series([], dtype="object"),
                            "doc_id": pd.Series([], dtype="int64"),
                            "rn": pd.Series([], dtype="int64")})
    out = top[["source", "doc_id", "rn"]] \
        .astype({"doc_id": "int64", "rn": "int64"})
    return out.sort_values(["source", "rn"]).reset_index(drop=True)


def temperature_sample(ds, id_col: str, stratum_col: str,
                       counts: dict[str, int]):
    """Examples-proportional mixing with temperature T=2 (sampling rate ∝
    n_s^(1/2), normalized so the largest source keeps everything — the
    multilingual-mixture rule of mT5/GPT-3 style training recipes, which
    damps head sources without starving the tail).

    Kept iff the row's per-mille md5 bucket b satisfies the EXACT integer
    inequality  b² · n_max < 10⁶ · n_s  —  algebraically b/1000 <
    sqrt(n_s/n_max) with no float sqrt on either engine, so the DuckDB
    twin is bit-exact. Deterministic, stable under repartitioning, and
    per-row (one md5, zero shuffles) given the card-sized ``counts``
    broadcast.
    """
    n_max = max(counts.values()) if counts else 0

    def pick(batch: pd.DataFrame) -> pd.DataFrame:
        b = _md5_bucket_pm(batch[id_col]).astype("int64")
        ns = batch[stratum_col].map(counts).fillna(0).to_numpy(dtype="int64")
        keep = b * b * n_max < 1_000_000 * ns
        return batch.loc[keep, [id_col, stratum_col]]

    return ds.map_batches(pick, batch_format="pandas")


def temperature_sample_ds(sf_dir: str):
    """Contract face: T=2 temperature sampling of documents by LANGUAGE —
    the mT5 rebalancing case (the corpus's lang counts are skewed ~3:1, so
    the rates actually bind; its ``source`` strata are uniform and would
    make the rule a no-op). Per-lang counts are a card-sized
    ``grouped_count`` (the shuffle carries distinct langs per block, not
    rows)."""
    from .agg import grouped_count
    from .io import read_table

    docs = read_table(sf_dir, "documents", ["doc_id", "lang"])
    n = grouped_count(read_table(sf_dir, "documents", ["lang"]),
                      ["lang"], "n").to_pandas()
    counts = dict(zip(n["lang"], n["n"].astype(int)))
    return temperature_sample(docs, "doc_id", "lang", counts)


# ------------------------------------------------- weighted priority sample
def weighted_priority_sample(ds, id_col: str, weight_col: str, n: int,
                             salt: str = "ws", num_partitions: int = 32):
    """Deterministic weighted sampling WITHOUT replacement — integer
    priority sampling (the A-Res / Efraimidis-Spirtsis idea with the
    repo's hash-in-place-of-RNG convention): each row draws the stable
    uniform ``md5_48(salt:id)`` and its priority is ``u // max(w, 1)`` —
    heavier rows get stochastically smaller priorities — and the sample is
    the global bottom-``n`` by (priority, id). All-integer, so the DuckDB
    face is bit-exact; membership is a pure row function (stable under
    repartitioning and corpus growth, like every sampler in this module).

    Scale plan: priorities are per-row map-only; the bottom-n is
    ``grouped_top_n`` under a constant group — a local per-batch prune
    keeps ≤ n rows per block, so the shuffle moves O(blocks·n) rows, never
    the corpus. Returns (rnk, id, weight, priority)."""
    # ONE priority kernel: the global sample is the per-group sampler
    # under a constant group (dropped on the way out)
    tagged = ds.map_batches(
        lambda b: b.assign(__g=np.zeros(len(b), dtype=np.int64)),
        batch_format="pandas")
    top = grouped_weighted_sample(tagged, id_col, "__g", weight_col, n,
                                  salt=salt, num_partitions=num_partitions)
    return top.map_batches(
        lambda df: df[["rnk", id_col, weight_col, "priority"]],
        batch_format="pandas")


def weighted_doc_sample_ds(sf_dir: str, n: int = 100):
    """Contract face: 100 documents sampled ∝ length (n_chars as the token
    proxy) — the importance-sampling step that upweights long documents in
    a mixture without replacement."""
    from .io import read_table

    docs = read_table(sf_dir, "documents", ["doc_id", "n_chars"])
    return weighted_priority_sample(docs, "doc_id", "n_chars", n)


def grouped_weighted_sample(ds, id_col: str, group_col: str,
                            weight_col: str, n: int, salt: str = "gws",
                            num_partitions: int = 32):
    """Per-GROUP deterministic weighted sampling without replacement — the
    stratified form of ``weighted_priority_sample`` (integer A-Res priority
    ``md5_48(salt:id) // max(w, 1)``, bottom-``n`` per group instead of
    globally). The mixture-building op: pick k docs ∝ length inside every
    language/source stratum in one pass.

    Scale plan identical to the global sampler: priorities are per-row
    map-only; ``grouped_top_n`` local-prunes each block to ≤ n rows per
    group it sees, so the shuffle moves O(blocks·groups·n) rows, never the
    corpus. Returns (group, rnk, id, weight, priority)."""
    import hashlib

    from .agg import grouped_top_n

    def prio(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch[id_col].astype("int64")
        w = np.maximum(batch[weight_col].to_numpy(dtype=np.int64), 1)
        u = np.fromiter(
            (int(hashlib.md5(f"{salt}:{i}".encode()).hexdigest()[:12], 16)
             for i in ids),
            dtype=np.int64, count=len(ids))
        return pd.DataFrame({group_col: batch[group_col], id_col: ids,
                             weight_col: batch[weight_col].astype("int64"),
                             "priority": u // w})

    keyed = ds.map_batches(prio, batch_format="pandas")
    top = grouped_top_n(keyed, [group_col], "priority", n, ascending=True,
                        tie_cols=[id_col], rank_col="rnk",
                        num_partitions=num_partitions)

    def tidy(df: pd.DataFrame) -> pd.DataFrame:
        return df[[group_col, "rnk", id_col, weight_col, "priority"]]

    return top.map_batches(tidy, batch_format="pandas")


def grouped_weighted_doc_sample_ds(sf_dir: str, n: int = 20):
    """Contract face: 20 documents per language sampled ∝ length — the
    per-stratum importance sample that keeps every language represented
    while upweighting long documents inside each."""
    from .io import read_table

    docs = read_table(sf_dir, "documents", ["doc_id", "lang", "n_chars"])
    return grouped_weighted_sample(docs, "doc_id", "lang", "n_chars", n)


def grouped_split_assignment_ds(sf_dir: str):
    """Leakage-safe GROUP-level split: every document of a source lands in
    the same train/val/test split, because the md5 per-mille bucket hashes
    the SOURCE, not the doc — the group-aware split that prevents
    near-duplicate leakage across splits when a source's documents
    correlate (the failure mode `split_leakage` measures; this op is the
    preventive assignment). Delegates to `assign_splits` keyed on the
    source column — ONE split kernel, map-only, stable under
    repartitioning and corpus growth. Returns (doc_id, source, split)."""
    from .io import read_table

    docs = read_table(sf_dir, "documents", ["doc_id", "source"])
    out = assign_splits(docs, "source",
                        {"train": 900, "val": 950, "test": 1000},
                        append=True)
    return out.map_batches(
        lambda b: pd.DataFrame({"doc_id": b["doc_id"].astype("int64"),
                                "source": b["source"],
                                "split": b["split"]}),
        batch_format="pandas")


def source_quota_allocation_ds(sf_dir: str, k: int = 100_000):
    """Hamilton (largest-remainder) apportionment of a fixed training-slot
    budget across sources ∝ total characters — the exact-integer mixture
    quota step (epochs-per-source / repetition factors) that float weights
    can't do reproducibly: Σquota == k exactly, floor share first, the
    k − Σfloor leftovers to the largest remainders (remainder DESC, source
    ASC tie-break).

    Scale plan: the char totals are a distributed per-source sum (per-batch
    partials, one card-sized shuffle); the apportionment itself runs on the
    driver over O(sources) rows in Python ints (chars·k would pass int64 at
    corpus scale). Returns (source, chars, quota)."""
    from .agg import partitioned_group_apply
    from .io import read_table

    docs = read_table(sf_dir, "documents", ["source", "n_chars"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        out = b.groupby("source", as_index=False)["n_chars"].sum() \
            .rename(columns={"n_chars": "chars"})
        return out.astype({"chars": "int64"})

    def sum_in_part(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("source", as_index=False)["chars"].sum()
        return out.astype({"chars": "int64"})

    s = partitioned_group_apply(
        docs.map_batches(partial, batch_format="pandas"),
        ["source"], sum_in_part).to_pandas()
    if "source" not in s.columns:  # empty corpus drops the schema
        return pd.DataFrame({"source": pd.Series([], dtype=object),
                             "chars": pd.Series([], dtype="int64"),
                             "quota": pd.Series([], dtype="int64")})
    total = int(s["chars"].sum())
    chars = [int(c) for c in s["chars"]]
    floors = [c * k // max(total, 1) for c in chars]
    rems = [c * k % max(total, 1) for c in chars]
    leftover = k - sum(floors)
    order = sorted(range(len(s)), key=lambda i: (-rems[i],
                                                 s["source"].iloc[i]))
    bump = set(order[:leftover])
    s = s.reset_index(drop=True)
    s["quota"] = pd.Series([floors[i] + (1 if i in bump else 0)
                            for i in range(len(s))], dtype="int64")
    return s.sort_values("source").reset_index(drop=True)


# ------------------------------------- priority (PPS bottom-k) sampling

def pps_sample_orders_ds(sf_dir: str, k: int = 32):
    """Priority sampling (Duffield, Lund & Thorup, JACM 2007): a
    deterministic weight-proportional sample WITHOUT replacement of ``k``
    orders — each order gets priority ``q = w·2^60 // h`` (w = price in
    cents, h = its uniform 60-bit md5 hash), the k largest q win. The
    classic one-pass mergeable PPS scheme: heavy rows are near-certain
    members, light rows enter with probability ∝ w, and subset-sum
    estimates over the sample are unbiased (up to the integer floor).

    Mergeability is the bottom-k fold contract (KMV's, with max instead
    of min): top-k of a union = top-k of per-block top-k's — one slim
    partial per block, a tree merge, a card-sized driver finish. q needs
    128-bit arithmetic (w·2^60 overflows int64), so blocks rank with
    Python bignums and the OUTPUT carries (w_cents, hv, rnk), never q —
    DuckDB mirrors the ranking in HUGEINT (``ORDER BY
    CAST(w AS HUGEINT) * (1 << 60) // h DESC``).

    Returns (o_orderkey, w_cents, hv, rnk), rnk 1..k — bit-exact vs
    ``oracle_sql()['pps_sample_orders']``."""
    from .io import read_table

    ds = read_table(sf_dir, "orders", ["o_orderkey", "o_totalprice"])

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"o_orderkey": pd.Series([], dtype="int64"),
                                 "w_cents": pd.Series([], dtype="int64"),
                                 "hv": pd.Series([], dtype="int64")})
        from ..core.hashing import md5_int
        keys = df["o_orderkey"].astype("int64").to_numpy()
        w = np.floor(df["o_totalprice"].to_numpy(np.float64) * 100 + 0.5) \
            .astype(np.int64)
        hv = md5_int(keys)
        # rank by exact bigint q desc, tie by orderkey asc
        q = [(int(wi) << 60) // max(int(hi), 1) for wi, hi in zip(w, hv)]
        order = sorted(range(len(keys)), key=lambda i: (-q[i], keys[i]))[:k]
        return pd.DataFrame({"o_orderkey": keys[order],
                             "w_cents": w[order],
                             "hv": hv[order]}).astype("int64")

    def merge_topk(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df
        df = df.drop_duplicates("o_orderkey")
        q = [((int(wi) << 60) // max(int(hi), 1), int(ki))
             for wi, hi, ki in zip(df["w_cents"], df["hv"],
                                   df["o_orderkey"])]
        order = sorted(range(len(df)),
                       key=lambda i: (-q[i][0], q[i][1]))[:k]
        return df.iloc[order].reset_index(drop=True)

    parts = ds.map_batches(local_topk, batch_format="pandas",
                           batch_size=None) \
        .map_batches(merge_topk, batch_format="pandas", batch_size=64 * k) \
        .to_pandas()
    out = merge_topk(parts).reset_index(drop=True)
    out["rnk"] = np.arange(1, len(out) + 1, dtype=np.int64)
    return out.astype("int64")
