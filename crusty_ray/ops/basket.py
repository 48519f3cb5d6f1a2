"""Market-basket association-rule mining (Agrawal & Srikant 1994, the
Apriori statistics at pair depth): support / confidence / lift for
co-purchased item pairs — the classic recommendation and
data-exploration op a training-data pipeline reuses for co-occurrence
mining (tag pairs, domain pairs, token pairs).

All-integer contract: confidence and lift are floor-divided per-mille so
the DuckDB face hashes bit-exact.

Scale plan: pair occurrences are generated per BASKET inside one basket
partition by the shared shift sweep (`_sweep_pairs` — baskets bounded, no
per-basket Python loop; dedup is fused into the same partition pass, so
the table shuffles once), counted by ``grouped_count``; item supports are
``grouped_count_distinct`` on the raw stream (per-batch pair dedup, no
second full shuffle); both directions of each surviving rule join their
endpoint supports through the generic ``hash_join`` (never broadcast).
``min_support`` prunes the pair table BEFORE the joins — the hot-tail cap
of this plan.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .agg import grouped_count, grouped_count_distinct, \
    partitioned_group_apply
from .io import read_table


def _sweep_pairs(df: pd.DataFrame, key: str = "o", item: str = "p",
                 sort_col: str | None = None, max_d: int | None = None,
                 symmetric: bool = False, dedup: bool = True,
                 out_cols: tuple[str, str] = ("a", "b")) -> pd.DataFrame:
    """Per-group item pairs via the vectorized shift sweep — pairs at
    sorted distance d, so the Python loop is a handful of full-column
    vector ops, never per-group. The ONE pair generator shared by the
    co-purchase edge builders (`ops/graph.py`), association rules, and
    skip-gram pair extraction.

    Default shape (baskets): dedup (basket, item) lines, sort by item
    within basket, unbounded d → every basket containing both items emits
    the (a < b) pair exactly once. Variants: ``sort_col`` orders rows by a
    different column than the emitted one (skip-gram sorts by step, emits
    node); ``max_d`` caps the sweep distance (the skip-gram window);
    ``symmetric`` emits both directions; ``dedup=False`` keeps duplicate
    input rows (walks may revisit a node). The sweep always stops early
    when no group has more than d rows (no match at d ⇒ none at d+1)."""
    sort_col = sort_col or item
    df = df[list(dict.fromkeys([key, sort_col, item]))]
    if dedup:
        df = df.drop_duplicates()
    df = df.sort_values([key, sort_col])
    k = df[key].to_numpy(dtype=np.int64)
    p = df[item].to_numpy(dtype=np.int64)
    outs, d = [], 1
    while d < len(k) and (max_d is None or d <= max_d):
        m = k[d:] == k[:-d]
        if not m.any():
            break
        a, b = p[:-d][m], p[d:][m]
        outs.append(pd.DataFrame({out_cols[0]: a, out_cols[1]: b}))
        if symmetric:
            outs.append(pd.DataFrame({out_cols[0]: b, out_cols[1]: a}))
        d += 1
    if not outs:
        return pd.DataFrame({out_cols[0]: pd.Series([], dtype="int64"),
                             out_cols[1]: pd.Series([], dtype="int64")})
    return pd.concat(outs, ignore_index=True)


def pair_support_counts(baskets, basket_col: str, item_col: str,
                        num_partitions: int = 32):
    """(a, b, pair_support): for every item pair, the number of DISTINCT
    baskets containing both. One basket-keyed partition shuffle (dedup +
    sweep fused in the partition function) + one pair-keyed count."""

    def slim(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"o": df[basket_col].astype("int64"),
                             "p": df[item_col].astype("int64")})

    occ = partitioned_group_apply(
        baskets.map_batches(slim, batch_format="pandas"),
        ["o"], _sweep_pairs, num_partitions)
    return grouped_count(occ, ["a", "b"], "pair_support", num_partitions)


def association_rules(baskets, basket_col: str, item_col: str,
                      min_support: int = 3, num_partitions: int = 32):
    """Pair-depth association rules over a (basket, item) Dataset.
    Returns BOTH directions of every pair with joint support ≥
    ``min_support``: (antecedent, consequent, pair_support, ant_support,
    confidence_pm, lift_pm) where confidence_pm = 1000·supp(a,b)//supp(a)
    and lift_pm = 1000·N·supp(a,b) // (supp(a)·supp(b))."""
    from .joins import hash_join

    def slim(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"o": df[basket_col].astype("int64"),
                             "p": df[item_col].astype("int64")})

    raw = baskets.map_batches(slim, batch_format="pandas").materialize()

    pair_supp = pair_support_counts(raw, "o", "p", num_partitions)

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        return df[df["pair_support"] >= min_support]

    pair_supp = pair_supp.map_batches(keep, batch_format="pandas")

    # item support = distinct baskets containing the item: per-batch
    # (item, basket) dedup shrinks the shuffle to distinct pairs per block
    item_supp = grouped_count_distinct(raw, ["p"], "o", "item_support",
                                       num_partitions)
    # scalar N: per-batch basket dedup → one slim o-keyed count; its
    # row count IS the distinct-basket count (O(1) to the driver)
    n_orders = int(grouped_count(
        raw.map_batches(lambda df: pd.DataFrame(
            {"o": df["o"].drop_duplicates()}), batch_format="pandas"),
        ["o"], "c", num_partitions).count())

    def both_dirs(df: pd.DataFrame) -> pd.DataFrame:
        fwd = pd.DataFrame({"antecedent": df["a"], "consequent": df["b"],
                            "pair_support": df["pair_support"]})
        rev = pd.DataFrame({"antecedent": df["b"], "consequent": df["a"],
                            "pair_support": df["pair_support"]})
        return pd.concat([fwd, rev], ignore_index=True).astype("int64")

    def as_ant(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"antecedent": df["p"].astype("int64"),
                             "ant_support": df["item_support"]})

    def as_cons(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"consequent": df["p"].astype("int64"),
                             "cons_support": df["item_support"]})

    rules = hash_join(
        hash_join(pair_supp.map_batches(both_dirs, batch_format="pandas"),
                  item_supp.map_batches(as_ant, batch_format="pandas"),
                  on=["antecedent"], num_partitions=num_partitions),
        item_supp.map_batches(as_cons, batch_format="pandas"),
        on=["consequent"], num_partitions=num_partitions)

    def score(df: pd.DataFrame) -> pd.DataFrame:
        ps = df["pair_support"].to_numpy(dtype=np.int64)
        sa = df["ant_support"].to_numpy(dtype=np.int64)
        sc = df["cons_support"].to_numpy(dtype=np.int64)
        return pd.DataFrame({
            "antecedent": df["antecedent"].astype("int64"),
            "consequent": df["consequent"].astype("int64"),
            "pair_support": ps, "ant_support": sa,
            "confidence_pm": 1000 * ps // sa,
            "lift_pm": 1000 * n_orders * ps // (sa * sc)})

    return rules.map_batches(score, batch_format="pandas")


def association_rules_ds(sf_dir: str, min_support: int = 3,
                         num_partitions: int = 32):
    """Contract face: association rules over TPC-H order baskets —
    "customers who bought part a also bought part b", both directions,
    joint support ≥ 3 orders."""
    li = read_table(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    return association_rules(li, "l_orderkey", "l_partkey",
                             min_support=min_support,
                             num_partitions=num_partitions)
