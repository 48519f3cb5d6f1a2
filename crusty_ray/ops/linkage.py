"""Record-linkage scoring — the Fellegi–Sunter decision model (Fellegi &
Sunter 1969) over blocked candidate pairs: the classic entity-resolution
step between blocking (which candidate pairs to look at) and clustering
(which matches to merge). The reference engine has no linkage stage; this
is part of the training-data curation surface (joining crawled corpora to
catalog/metadata sets without a shared key).

Plan shape: candidate pairs come from the already-distributed
sorted-neighborhood blocking plan (``dedup.sorted_neighborhood_pairs_ds``
— no new pair generator); each pair is then re-joined to the record table
twice through the generic ``hash_join`` (record table stays fact-scale,
never broadcast), and the field-agreement scoring is one vectorized pandas
expression per partition. Weights are INTEGER log-odds-style scores so the
DuckDB oracle hashes bit-exact.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

# Integer agreement weights (log-odds flavored: agreement on a selective
# field earns more than a common field; disagreement penalties are milder
# than agreements, per the classic m/u asymmetry). These constants are the
# oracle contract — the SQL face repeats them literally.
W_LANG_AGREE, W_LANG_DIS = 22, -8
W_SOURCE_AGREE, W_SOURCE_DIS = 18, -12
W_GAP_ZERO, W_GAP_NEAR, W_GAP_FAR = 15, 6, -4
T_MATCH, T_POSSIBLE = 40, 10


_FIELDS = ["lang", "source"]  # the fields the weight table scores on


def fs_score_pairs(pairs, records, id_col: str,
                   num_partitions: int = 32):
    """Score (doc_a, doc_b, char_gap) candidate pairs against ``records``
    (``id_col`` + lang + source columns) with the Fellegi–Sunter integer
    weights above (the weight table is field-specific, so the field list
    is fixed alongside it). Two co-partitioned ``hash_join`` passes pull
    each side's field vector onto the pair row; the comparison itself is
    vectorized. Returns (doc_a, doc_b, fs_score, decision)."""
    from .joins import hash_join

    def side(suffix: str, key: str):
        def rename(df: pd.DataFrame) -> pd.DataFrame:
            out = pd.DataFrame({key: df[id_col].astype("int64")})
            for f in _FIELDS:
                out[f + suffix] = df[f]
            return out
        return rename

    a = records.map_batches(side("_a", "doc_a"), batch_format="pandas")
    b = records.map_batches(side("_b", "doc_b"), batch_format="pandas")
    joined = hash_join(
        hash_join(pairs, a, on=["doc_a"], num_partitions=num_partitions),
        b, on=["doc_b"], num_partitions=num_partitions)

    def score(df: pd.DataFrame) -> pd.DataFrame:
        n = len(df)
        s = np.zeros(n, dtype=np.int64)
        # pandas object == with NaN on either side is False -> the
        # disagreement branch, same as SQL's CASE WHEN a = b (NULL-false)
        lang_eq = (df["lang_a"] == df["lang_b"]).to_numpy()
        src_eq = (df["source_a"] == df["source_b"]).to_numpy()
        s += np.where(lang_eq, W_LANG_AGREE, W_LANG_DIS)
        s += np.where(src_eq, W_SOURCE_AGREE, W_SOURCE_DIS)
        gap = df["char_gap"].to_numpy(dtype=np.int64)
        s += np.where(gap == 0, W_GAP_ZERO,
                      np.where(gap <= 2, W_GAP_NEAR, W_GAP_FAR))
        decision = np.where(s >= T_MATCH, "match",
                            np.where(s >= T_POSSIBLE, "possible",
                                     "non_match"))
        return pd.DataFrame({
            "doc_a": df["doc_a"].astype("int64"),
            "doc_b": df["doc_b"].astype("int64"),
            "fs_score": s,
            "decision": pd.Series(decision, dtype="object")})

    return joined.map_batches(score, batch_format="pandas")


def record_linkage_scores_ds(sf_dir: str, window: int = 2,
                             num_partitions: int = 32):
    """Fellegi–Sunter linkage over the documents table: SNM length-blocked
    candidate pairs scored on (lang, source, char_gap) agreement. Returns
    (doc_a, doc_b, fs_score, decision) for every candidate pair."""
    from .dedup import sorted_neighborhood_pairs_ds
    from .io import read_table

    pairs = sorted_neighborhood_pairs_ds(sf_dir, window=window,
                                         num_partitions=num_partitions)
    records = read_table(sf_dir, "documents", ["doc_id"] + _FIELDS)
    return fs_score_pairs(pairs, records, "doc_id", num_partitions)


# --------------------------------------------------- edit-distance linkage
def levenshtein_batch(sa, sb) -> np.ndarray:
    """Unit-cost Levenshtein distance for a BATCH of string pairs — the
    classic Wagner–Fischer DP vectorized across the batch axis: the
    (L1+1)-wide DP column advances once per character of the longer side,
    each cell update a full-batch numpy op, so the Python loop is
    O(L1·L2) (string lengths, ~hundreds of iterations), never O(n_pairs).
    Matches DuckDB's ``levenshtein`` (unit insert/delete/substitute)."""
    n = len(sa)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    la = np.fromiter((len(s) for s in sa), dtype=np.int64, count=n)
    lb = np.fromiter((len(s) for s in sb), dtype=np.int64, count=n)
    L1, L2 = int(la.max()), int(lb.max())
    A = np.zeros((n, L1), dtype=np.uint32)
    B = np.zeros((n, L2), dtype=np.uint32)
    for r, s in enumerate(sa):
        A[r, :len(s)] = np.frombuffer(s.encode("utf-32-le"),
                                      dtype=np.uint32)
    for r, s in enumerate(sb):
        B[r, :len(s)] = np.frombuffer(s.encode("utf-32-le"),
                                      dtype=np.uint32)
    # prev[r, i] = D(i, j-1); row r's answer is D(la[r], lb[r])
    prev = np.tile(np.arange(L1 + 1, dtype=np.int64), (n, 1))
    out = np.where(lb == 0, la, -1)
    for j in range(1, L2 + 1):
        cur = np.empty_like(prev)
        cur[:, 0] = j
        bj = B[:, j - 1]
        for i in range(1, L1 + 1):
            sub = prev[:, i - 1] + (A[:, i - 1] != bj)
            cur[:, i] = np.minimum(np.minimum(prev[:, i] + 1,
                                              cur[:, i - 1] + 1), sub)
        done = lb == j
        if done.any():
            out[done] = cur[done, la[done]]
        prev = cur
    return out.astype(np.int64)


def name_linkage_ds(sf_dir: str, window: int = 2,
                    num_partitions: int = 32):
    """Edit-distance record linkage over customers: SNM blocking on the
    integer account balance (duplicate accounts tend to carry duplicated
    balances), then exact Levenshtein between the two names — the
    string-similarity verify step of the Fellegi–Sunter stack. Returns
    (cust_a, cust_b, bal_gap_cents, name_distance), all integer so the
    DuckDB ``levenshtein`` oracle hashes bit-exact.

    Scale plan: the generic ``snm_pairs`` rank plan (no global sort,
    boundary-replicated blocks), names joined per side through the generic
    ``hash_join`` (the customer table is never broadcast), and the DP
    kernel vectorizes across each batch of pairs."""
    from .dedup import snm_pairs
    from .io import read_table
    from .joins import hash_join

    cust = read_table(sf_dir, "customer", ["c_custkey", "c_acctbal",
                                           "c_name"]).materialize()

    def cents(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "c_custkey": df["c_custkey"].astype("int64"),
            "cents": np.floor(df["c_acctbal"].to_numpy(dtype=np.float64)
                              * 100 + 0.5).astype(np.int64)})

    # TPC-H acctbal ∈ [-999.99, 9999.99] → +100000 keeps the packed
    # rank key non-negative
    pairs = snm_pairs(cust.map_batches(cents, batch_format="pandas"),
                      "c_custkey", "cents", window=window,
                      metric_offset=100_000,
                      out_a="cust_a", out_b="cust_b",
                      gap_col="bal_gap_cents",
                      num_partitions=num_partitions)

    def side(key: str, out: str):
        def rename(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({key: df["c_custkey"].astype("int64"),
                                 out: df["c_name"]})
        return rename

    joined = hash_join(
        hash_join(pairs, cust.map_batches(side("cust_a", "name_a"),
                                          batch_format="pandas"),
                  on=["cust_a"], num_partitions=num_partitions),
        cust.map_batches(side("cust_b", "name_b"), batch_format="pandas"),
        on=["cust_b"], num_partitions=num_partitions)

    def dist(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "cust_a": df["cust_a"].astype("int64"),
            "cust_b": df["cust_b"].astype("int64"),
            "bal_gap_cents": df["bal_gap_cents"].astype("int64"),
            "name_distance": levenshtein_batch(df["name_a"].tolist(),
                                               df["name_b"].tolist())})

    return joined.map_batches(dist, batch_format="pandas")


# ------------------------------------------------- entity resolution clusters

def entity_clusters_ds(sf_dir: str, window: int = 2,
                       num_partitions: int = 32):
    """Entity resolution end-to-end: SNM blocking → Fellegi–Sunter scoring
    → transitive closure of the ``match`` decisions into entity clusters.
    Every document is labeled with its entity id (the min doc_id reachable
    through match edges — singletons are their own entity) plus the
    entity's total size, the grouping a curation pipeline uses to pick one
    canonical record per real-world entity (Benjelloun et al. 2009's
    "merge" step after pairwise matching).

    Composition, nothing new driver-side: ``record_linkage_scores_ds``
    (already-distributed SNM + scoring) → filter to matches →
    ``dedup.connected_components`` (hash-min label propagation, adaptive
    driver/BSP) → one coarse-partitioned count per entity attached back to
    the member rows in the same partition pass. Returns
    (doc_id, entity_id, entity_size)."""
    from .agg import partitioned_group_apply
    from .dedup import connected_components
    from .io import read_table

    scores = record_linkage_scores_ds(sf_dir, window=window,
                                      num_partitions=num_partitions)

    def match_edges(df: pd.DataFrame) -> pd.DataFrame:
        m = df[df["decision"] == "match"]
        return pd.DataFrame({"u": m["doc_a"].astype("int64"),
                             "v": m["doc_b"].astype("int64")})

    edges = scores.map_batches(match_edges, batch_format="pandas")
    nodes = read_table(sf_dir, "documents", ["doc_id"])
    labels = connected_components(edges, nodes, "doc_id",
                                  out_label="entity_id",
                                  num_partitions=num_partitions)

    def with_size(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out["entity_size"] = df.groupby("entity_id")["doc_id"] \
            .transform("size").astype("int64")
        out["doc_id"] = out["doc_id"].astype("int64")
        out["entity_id"] = out["entity_id"].astype("int64")
        return out

    return partitioned_group_apply(labels, ["entity_id"], with_size,
                                   num_partitions)


def golden_records_ds(sf_dir: str, num_partitions: int = 32):
    """Survivorship (golden-record merge) on top of entity resolution —
    the MDM step after `entity_clusters_ds`: each entity's canonical
    attributes from deterministic survivorship rules: canonical_doc =
    MIN member doc_id, canonical_lang = the members' modal lang
    (lexicographic tie-break), max_chars = MAX member length, n_members.

    Scale plan: the cluster map joins the doc attributes through the
    generic co-partitioned `hash_join` (both sides fact-scale, no
    broadcast); survivorship pre-aggregates per batch to (entity, lang)
    partial cells — counts/max/min are all associative, and the MODE
    becomes an argmax over the summed per-lang counts — then ONE coarse
    entity partition finishes. Returns (entity_id, canonical_doc,
    canonical_lang, n_members, max_chars)."""
    from .agg import partitioned_group_apply
    from .io import read_table
    from .joins import hash_join

    ent = entity_clusters_ds(sf_dir, num_partitions=num_partitions) \
        .map_batches(lambda b: b[["doc_id", "entity_id"]],
                     batch_format="pandas")
    docs = read_table(sf_dir, "documents", ["doc_id", "lang", "n_chars"])
    j = hash_join(ent, docs, on=["doc_id"], num_partitions=num_partitions)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        out = b.groupby(["entity_id", "lang"], as_index=False).agg(
            n=("doc_id", "size"), max_chars=("n_chars", "max"),
            min_doc=("doc_id", "min"))
        return out.astype({"n": "int64", "max_chars": "int64",
                           "min_doc": "int64"})

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        cell = df.groupby(["entity_id", "lang"], as_index=False).agg(
            n=("n", "sum"), max_chars=("max_chars", "max"),
            min_doc=("min_doc", "min"))
        cell = cell.sort_values(["entity_id", "n", "lang"],
                                ascending=[True, False, True],
                                kind="mergesort")
        top = cell.drop_duplicates("entity_id", keep="first")
        tot = cell.groupby("entity_id", as_index=False).agg(
            n_members=("n", "sum"), max_chars=("max_chars", "max"),
            canonical_doc=("min_doc", "min"))
        out = tot.merge(top[["entity_id", "lang"]], on="entity_id") \
            .rename(columns={"lang": "canonical_lang"})
        out = out[["entity_id", "canonical_doc", "canonical_lang",
                   "n_members", "max_chars"]]
        return out.astype({"entity_id": "int64", "canonical_doc": "int64",
                           "n_members": "int64", "max_chars": "int64"})

    cells = j.map_batches(partial, batch_format="pandas")
    return partitioned_group_apply(cells, ["entity_id"], finish,
                                   num_partitions)
