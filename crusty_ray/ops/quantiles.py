"""Exact distributed quantiles — two-phase bucket selection.

``percentile_disc``-style exact order statistics over a numeric column
without ever sorting or materializing the column globally:

1. **Histogram pass** — each batch buckets values (``floor(x / bucket_width)``,
   vectorized) and a coarse-partition grouped count produces one
   ``(bucket, n)`` row per DISTINCT bucket. Only the histogram — bounded by
   the value RANGE over the width, independent of row count — reaches the
   driver, which locates the bucket containing each requested order statistic
   by cumulative sum.
2. **Refine pass** — a second read filters to just the buckets that contain a
   target statistic (predicate on the raw column, so parquet row-group stats
   prune the scan) and pulls only those values; the exact k-th element is
   selected among them. Pulled volume is the population of the few hit
   buckets — pick ``bucket_width`` so an average bucket fits the driver
   comfortably (a skew-robust engine would re-split a pathological bucket
   recursively; one level suffices for every distribution the driver ships).

The k convention matches SQL ``percentile_disc(p)``: the smallest value whose
cumulative distribution ≥ p, i.e. the element at 1-based index
``max(1, ceil(p·n))`` of the sorted column.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd


def _order_stats(ds, col: str, ks: set[int], bucket_width: float,
                 num_partitions: int) -> tuple[dict[int, float], int]:
    """The shared two-phase selection: exact values of the 1-based order
    statistics ``ks`` of ``ds[col]``, plus the total row count. Returns
    ({} , 0) on empty input; ks outside [1, n] are clamped by callers."""
    from .agg import grouped_count

    def bucketize(batch: pd.DataFrame) -> pd.DataFrame:
        v = batch[col].to_numpy(dtype=np.float64)
        return pd.DataFrame({
            "bucket": np.floor(v / bucket_width).astype(np.int64)})

    hist = grouped_count(ds.map_batches(bucketize, batch_format="pandas"),
                         ["bucket"], "n", num_partitions).to_pandas()
    if hist.empty:  # empty input: no histogram rows (and maybe no schema)
        return {}, 0
    hist = hist.sort_values("bucket").reset_index(drop=True)
    total = int(hist["n"].sum())
    cum = hist["n"].cumsum().to_numpy()
    # bucket index (into hist) holding each k, + the k's offset within it
    hits: dict[int, list[tuple[int, int]]] = {}
    for k in ks:
        k = min(max(1, k), total)
        i = int(np.searchsorted(cum, k, side="left"))
        before = int(cum[i - 1]) if i else 0
        hits.setdefault(i, []).append((k, k - before))  # 1-based in-bucket

    need = {int(hist["bucket"].iloc[i]) for i in hits}
    lo = min(need) * bucket_width
    hi = (max(need) + 1) * bucket_width

    def pick(batch: pd.DataFrame) -> pd.DataFrame:
        v = batch[col].to_numpy(dtype=np.float64)
        v = v[(v >= lo) & (v < hi)]
        b = np.floor(v / bucket_width).astype(np.int64)
        keep = np.isin(b, np.fromiter(need, dtype=np.int64))
        return pd.DataFrame({"v": v[keep], "b": b[keep]})

    vals = ds.map_batches(pick, batch_format="pandas").to_pandas()
    stats: dict[int, float] = {}
    for i, targets in hits.items():
        b = int(hist["bucket"].iloc[i])
        inb = np.sort(vals.loc[vals["b"] == b, "v"].to_numpy())
        for k, off in targets:
            stats[k] = float(inb[off - 1])
    return stats, total


def exact_quantiles(ds, col: str, ps_pm: list[int], bucket_width: float = 1.0,
                    num_partitions: int = 32) -> pd.DataFrame:
    """Exact per-mille quantiles of ``ds[col]``. Returns a small DataFrame
    (p_pm:int64, value:float64), one row per requested per-mille point."""
    # k = ceil(p/1000·n) needs n up front; on the parquet-read faces this
    # count is metadata-only, no data scan.
    total = ds.count()
    if not total:
        return pd.DataFrame({"p_pm": pd.Series(ps_pm, dtype="int64"),
                             "value": pd.Series([np.nan] * len(ps_pm))})
    ks = {p: max(1, math.ceil(p / 1000.0 * total)) for p in ps_pm}
    stats, _ = _order_stats(ds, col, set(ks.values()), bucket_width,
                            num_partitions)
    out = sorted((p, stats[k]) for p, k in ks.items())
    return pd.DataFrame(out, columns=["p_pm", "value"]) \
        .astype({"p_pm": "int64", "value": "float64"})


def exact_quantiles_cont(ds, col: str, ps_pm: list[int],
                         bucket_width: float = 1.0,
                         num_partitions: int = 32) -> pd.DataFrame:
    """Interpolated (``percentile_cont``) exact quantiles. Same two-phase
    selection for the two bracketing order statistics, then DuckDB's exact
    interpolation arithmetic (``lo·(⌈rn⌉−rn) + hi·(rn−⌊rn⌋)`` on
    ``rn = (n−1)·p`` doubles) so results hash bit-identically."""
    total = ds.count()
    if not total:
        return pd.DataFrame({"p_pm": pd.Series(ps_pm, dtype="int64"),
                             "value": pd.Series([np.nan] * len(ps_pm))})
    plan: dict[int, tuple[int, int, float, float]] = {}
    ks: set[int] = set()
    for p in ps_pm:
        rn = (total - 1) * (p / 1000.0)
        frn, crn = math.floor(rn), math.ceil(rn)
        plan[p] = (frn + 1, crn + 1, crn - rn, rn - frn)  # 1-based ks
        ks.update((frn + 1, crn + 1))
    stats, _ = _order_stats(ds, col, ks, bucket_width, num_partitions)
    out = []
    for p, (klo, khi, w_lo, w_hi) in sorted(plan.items()):
        if klo == khi:
            out.append((p, stats[klo]))
        else:
            out.append((p, stats[klo] * w_lo + stats[khi] * w_hi))
    return pd.DataFrame(out, columns=["p_pm", "value"]) \
        .astype({"p_pm": "int64", "value": "float64"})


def order_price_quantiles_ds(sf_dir: str,
                             ps_pm: tuple = (250, 500, 750, 900, 990)):
    """Exact o_totalprice percentiles (disc) — the SQL-checked face of
    ``exact_quantiles``. bucket_width 100.0 keeps the histogram a few
    thousand rows at any scale factor (prices are range-bounded)."""
    from .io import read_table
    ds = read_table(sf_dir, "orders", ["o_totalprice"])
    return exact_quantiles(ds, "o_totalprice", list(ps_pm),
                           bucket_width=100.0)


def order_price_quantiles_cont_ds(sf_dir: str,
                                  ps_pm: tuple = (250, 500, 613, 750, 990)):
    """Interpolated o_totalprice percentiles — the SQL-checked face of
    ``exact_quantiles_cont`` (bit-exact vs DuckDB ``percentile_cont``,
    including the 0.613 point that falls strictly between order stats)."""
    from .io import read_table
    ds = read_table(sf_dir, "orders", ["o_totalprice"])
    return exact_quantiles_cont(ds, "o_totalprice", list(ps_pm),
                                bucket_width=100.0)


def exact_group_quantiles(ds, key_col: str, col: str, ps_pm: list[int],
                          bucket_width: float = 1.0,
                          num_partitions: int = 32) -> pd.DataFrame:
    """Per-group exact per-mille quantiles — the GROUP BY generalization of
    ``exact_quantiles``. Same two-phase plan: the histogram is grouped by
    (key, bucket) so its size is Σ_g range_g/width (still row-count
    independent); the refine pass pulls only the (key, bucket) populations
    that contain a target statistic. Returns (key_col, p_pm, value), one row
    per group × requested point."""
    from .agg import grouped_count

    def bucketize(batch: pd.DataFrame) -> pd.DataFrame:
        v = batch[col].to_numpy(dtype=np.float64)
        return pd.DataFrame({
            key_col: batch[key_col].reset_index(drop=True),
            "bucket": np.floor(v / bucket_width).astype(np.int64)})

    hist = grouped_count(ds.map_batches(bucketize, batch_format="pandas"),
                         [key_col, "bucket"], "n", num_partitions).to_pandas()
    if hist.empty:
        return pd.DataFrame({key_col: [], "p_pm": pd.Series([], dtype="int64"),
                             "value": pd.Series([], dtype="float64")})
    hist = hist.sort_values([key_col, "bucket"]).reset_index(drop=True)

    # per group: locate the bucket holding each k = max(1, ceil(p/1000 · n))
    need: set[tuple] = set()
    targets: dict[tuple, list[tuple[int, int]]] = {}
    for key, g in hist.groupby(key_col, sort=False):
        cum = g["n"].cumsum().to_numpy()
        total = int(cum[-1])
        for p in ps_pm:
            k = max(1, math.ceil(p / 1000.0 * total))
            i = int(np.searchsorted(cum, k, side="left"))
            b = int(g["bucket"].iloc[i])
            before = int(cum[i - 1]) if i else 0
            need.add((key, b))
            targets.setdefault((key, b), []).append((p, k - before))

    def pick(batch: pd.DataFrame) -> pd.DataFrame:
        v = batch[col].to_numpy(dtype=np.float64)
        b = np.floor(v / bucket_width).astype(np.int64)
        keep = [(kk, bb) in need for kk, bb in zip(batch[key_col], b)]
        return pd.DataFrame({key_col: batch[key_col].reset_index(drop=True)[keep],
                             "v": v[keep], "b": b[keep]})

    vals = ds.map_batches(pick, batch_format="pandas").to_pandas()
    out = []
    for (key, b), pts in targets.items():
        inb = np.sort(vals.loc[(vals[key_col] == key) & (vals["b"] == b),
                               "v"].to_numpy())
        for p, off in pts:
            out.append((key, p, float(inb[off - 1])))
    res = pd.DataFrame(sorted(out), columns=[key_col, "p_pm", "value"])
    return res.astype({"p_pm": "int64", "value": "float64"})


def order_price_quantiles_by_priority_ds(sf_dir: str,
                                         ps_pm: tuple = (500, 900)):
    """Exact o_totalprice percentiles per o_orderpriority — the SQL-checked
    face of ``exact_group_quantiles``."""
    from .io import read_table
    ds = read_table(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])
    return exact_group_quantiles(ds, "o_orderpriority", "o_totalprice",
                                 list(ps_pm), bucket_width=100.0)


def exact_group_quantiles_cont(ds, key_col: str, col: str, ps_pm: list[int],
                               bucket_width: float = 1.0,
                               num_partitions: int = 32) -> pd.DataFrame:
    """Per-group interpolated (``percentile_cont``) quantiles — the GROUP BY
    generalization of ``exact_quantiles_cont``. The same grouped histogram
    locates, per group, the TWO bracketing order statistics of each point
    (group totals fall out of the histogram — no extra count pass); the
    refine pass pulls only the hit (key, bucket) populations; interpolation
    uses DuckDB's exact double arithmetic. Returns (key_col, p_pm, value)."""
    import math as _math

    from .agg import grouped_count

    def bucketize(batch: pd.DataFrame) -> pd.DataFrame:
        v = batch[col].to_numpy(dtype=np.float64)
        return pd.DataFrame({
            key_col: batch[key_col].reset_index(drop=True),
            "bucket": np.floor(v / bucket_width).astype(np.int64)})

    hist = grouped_count(ds.map_batches(bucketize, batch_format="pandas"),
                         [key_col, "bucket"], "n", num_partitions).to_pandas()
    if hist.empty:
        return pd.DataFrame({key_col: [], "p_pm": pd.Series([], dtype="int64"),
                             "value": pd.Series([], dtype="float64")})
    hist = hist.sort_values([key_col, "bucket"]).reset_index(drop=True)

    # per group: the plan (which ks, with which interpolation weights) and
    # the (key, bucket, in-bucket offset) address of every needed k
    need: set[tuple] = set()
    stat_addr: dict[tuple, list[tuple[int, int]]] = {}  # (key,b) -> [(k,off)]
    plans: dict[tuple, tuple[int, int, float, float]] = {}  # (key,p)

    def _locate(key, cum, buckets, k):
        i = int(np.searchsorted(cum, k, side="left"))
        b = int(buckets[i])
        before = int(cum[i - 1]) if i else 0
        need.add((key, b))
        stat_addr.setdefault((key, b), []).append((k, k - before))

    for key, g in hist.groupby(key_col, sort=False):
        cum = g["n"].cumsum().to_numpy()
        buckets = g["bucket"].to_numpy()
        total = int(cum[-1])
        for p in ps_pm:
            rn = (total - 1) * (p / 1000.0)
            frn, crn = _math.floor(rn), _math.ceil(rn)
            plans[(key, p)] = (frn + 1, crn + 1, crn - rn, rn - frn)
            _locate(key, cum, buckets, frn + 1)
            if crn != frn:
                _locate(key, cum, buckets, crn + 1)

    def pick(batch: pd.DataFrame) -> pd.DataFrame:
        v = batch[col].to_numpy(dtype=np.float64)
        b = np.floor(v / bucket_width).astype(np.int64)
        keep = [(kk, bb) in need for kk, bb in zip(batch[key_col], b)]
        return pd.DataFrame({key_col: batch[key_col].reset_index(drop=True)[keep],
                             "v": v[keep], "b": b[keep]})

    vals = ds.map_batches(pick, batch_format="pandas").to_pandas()
    stats: dict[tuple, float] = {}  # (key, k) -> order stat
    for (key, b), reqs in stat_addr.items():
        inb = np.sort(vals.loc[(vals[key_col] == key) & (vals["b"] == b),
                               "v"].to_numpy())
        for k, off in reqs:
            stats[(key, k)] = float(inb[off - 1])
    out = []
    for (key, p), (klo, khi, w_lo, w_hi) in plans.items():
        if klo == khi:
            out.append((key, p, stats[(key, klo)]))
        else:
            out.append((key, p,
                        stats[(key, klo)] * w_lo + stats[(key, khi)] * w_hi))
    res = pd.DataFrame(sorted(out), columns=[key_col, "p_pm", "value"])
    return res.astype({"p_pm": "int64", "value": "float64"})


def price_quantiles_by_priority_cont_ds(sf_dir: str,
                                        ps_pm: tuple = (500, 613, 900)):
    """Interpolated o_totalprice percentiles per o_orderpriority — the
    SQL-checked face of ``exact_group_quantiles_cont``."""
    from .io import read_table
    ds = read_table(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])
    return exact_group_quantiles_cont(ds, "o_orderpriority", "o_totalprice",
                                      list(ps_pm), bucket_width=100.0)
