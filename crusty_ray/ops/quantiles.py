"""Exact distributed quantiles — two-phase bucket selection.

``percentile_disc`` / ``percentile_cont`` exact order statistics over a
numeric column without ever sorting or materializing the column globally:

1. **Histogram pass** — each batch buckets values (``floor(x / bucket_width)``,
   vectorized) and a coarse-partition grouped count produces one
   ``(bucket, n)`` row per DISTINCT bucket. Only the histogram — bounded by
   the value RANGE over the width, independent of row count — reaches the
   driver, which locates the bucket containing each requested order statistic
   by cumulative sum.
2. **Refine pass** — a second read keeps just the values whose bucket
   contains a target statistic and selects the exact k-th element among
   them. Membership is decided by the SAME ``floor(x / width)`` function the
   histogram used (a float range prefilter can disagree with floor() at
   bucket boundaries — e.g. ``78 * 0.1 > 7.8`` — and silently drop counted
   values). Shuffle/driver volume in this pass is the population of the few
   hit buckets; the read itself is a second full column scan (the predicate
   lives in a UDF, so parquet row-group pruning does NOT apply — at 100 TB
   add a reader-level filter expression if the storage layout supports it).
   Pick ``bucket_width`` so an average bucket fits the driver comfortably
   (a skew-robust engine would re-split a pathological bucket recursively;
   one level suffices for every distribution the driver ships).

NULL/NaN semantics match SQL: NaN values are ignored in both passes (they
never enter the histogram or the refine set). A group whose values are all
NaN is omitted from the grouped outputs.

Conventions, both bit-exact vs DuckDB:
- disc: the element at 1-based index ``max(1, ceil(p·n))``.
- cont: ``lo·(⌈rn⌉−rn) + hi·(rn−⌊rn⌋)`` on ``rn = (n−1)·p`` doubles.
"""

from __future__ import annotations

import math
from typing import Callable, Iterable

import numpy as np
import pandas as pd


def _validate_ps(ps_pm: Iterable[int]) -> None:
    bad = [p for p in ps_pm if not 0 <= p <= 1000]
    if bad:
        raise ValueError(f"per-mille points outside [0, 1000]: {bad}")


def _disc_ks(ps_pm: Iterable[int], total: int) -> dict[int, int]:
    """p → 1-based order-statistic index, SQL percentile_disc convention."""
    return {p: min(max(1, math.ceil(p / 1000.0 * total)), total)
            for p in ps_pm}


def _cont_plan(ps_pm: Iterable[int],
               total: int) -> dict[int, tuple[int, int, float, float]]:
    """p → (k_lo, k_hi, w_lo, w_hi): the two bracketing 1-based order stats
    and DuckDB's exact interpolation weights. For p ∈ [0, 1000] both ks fall
    in [1, total] by construction."""
    plan = {}
    for p in ps_pm:
        rn = (total - 1) * (p / 1000.0)
        frn, crn = math.floor(rn), math.ceil(rn)
        plan[p] = (frn + 1, crn + 1, crn - rn, rn - frn)
    return plan


def _nan_result(ps_pm: list[int]) -> pd.DataFrame:
    return pd.DataFrame({"p_pm": pd.Series(ps_pm, dtype="int64"),
                         "value": pd.Series([np.nan] * len(ps_pm))})


def _empty_group_result(key_col: str) -> pd.DataFrame:
    return pd.DataFrame({key_col: [], "p_pm": pd.Series([], dtype="int64"),
                         "value": pd.Series([], dtype="float64")})


# ---------------------------------------------------------------- ungrouped

def _order_stats(ds, col: str, ks_builder: Callable[[int], Iterable[int]],
                 bucket_width: float,
                 num_partitions: int) -> tuple[dict[int, float], int]:
    """The shared two-phase selection: exact values of the 1-based order
    statistics ``ks_builder(total)`` of the non-NaN values of ``ds[col]``,
    plus that total. Returns ({}, 0) on empty/all-NaN input. The builder
    must return ks within [1, total]."""
    from .agg import grouped_count

    def bucketize(batch: pd.DataFrame) -> pd.DataFrame:
        v = batch[col].to_numpy(dtype=np.float64)
        v = v[~np.isnan(v)]  # SQL percentile_* ignore NULLs
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
    for k in set(ks_builder(total)):
        i = int(np.searchsorted(cum, k, side="left"))
        before = int(cum[i - 1]) if i else 0
        hits.setdefault(i, []).append((k, k - before))  # 1-based in-bucket
    need = np.fromiter((int(hist["bucket"].iloc[i]) for i in hits),
                       dtype=np.int64)

    def pick(batch: pd.DataFrame) -> pd.DataFrame:
        v = batch[col].to_numpy(dtype=np.float64)
        v = v[~np.isnan(v)]
        b = np.floor(v / bucket_width).astype(np.int64)
        keep = np.isin(b, need)
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
    """Exact per-mille quantiles of ``ds[col]`` (percentile_disc). Returns a
    small DataFrame (p_pm:int64, value:float64), one row per point."""
    _validate_ps(ps_pm)
    stats, total = _order_stats(
        ds, col, lambda n: _disc_ks(ps_pm, n).values(), bucket_width,
        num_partitions)
    if not total:
        return _nan_result(ps_pm)
    ks = _disc_ks(ps_pm, total)
    out = sorted((p, stats[k]) for p, k in ks.items())
    return pd.DataFrame(out, columns=["p_pm", "value"]) \
        .astype({"p_pm": "int64", "value": "float64"})


def exact_quantiles_cont(ds, col: str, ps_pm: list[int],
                         bucket_width: float = 1.0,
                         num_partitions: int = 32) -> pd.DataFrame:
    """Interpolated (``percentile_cont``) exact quantiles — the two
    bracketing order statistics through the same two-phase selection, then
    DuckDB's exact interpolation arithmetic so results hash identically."""
    _validate_ps(ps_pm)

    def builder(n: int) -> list[int]:
        return [k for klo, khi, _, _ in _cont_plan(ps_pm, n).values()
                for k in (klo, khi)]

    stats, total = _order_stats(ds, col, builder, bucket_width,
                                num_partitions)
    if not total:
        return _nan_result(ps_pm)
    out = []
    for p, (klo, khi, w_lo, w_hi) in sorted(_cont_plan(ps_pm, total).items()):
        if klo == khi:
            out.append((p, stats[klo]))
        else:
            out.append((p, stats[klo] * w_lo + stats[khi] * w_hi))
    return pd.DataFrame(out, columns=["p_pm", "value"]) \
        .astype({"p_pm": "int64", "value": "float64"})


# ------------------------------------------------------------------ grouped

def _group_order_stats(ds, key_col: str, col: str,
                       ks_builder: Callable[[int], Iterable[int]],
                       bucket_width: float, num_partitions: int
                       ) -> tuple[dict[tuple, float], dict]:
    """GROUP BY generalization of ``_order_stats``: per group, the exact
    values of the order statistics ``ks_builder(group_total)``. Returns
    (stats {(key, k): value}, totals {key: n}) over non-NaN values; groups
    with no non-NaN values are absent. The histogram is keyed
    (key, bucket) — size Σ_g range_g/width, still row-count independent;
    the refine pass keeps only the hit (key, bucket) populations via a
    vectorized merge (not a per-row Python membership loop)."""
    from .agg import grouped_count

    def bucketize(batch: pd.DataFrame) -> pd.DataFrame:
        v = batch[col].to_numpy(dtype=np.float64)
        ok = ~np.isnan(v)
        return pd.DataFrame({
            key_col: batch[key_col].reset_index(drop=True)[ok]
            .reset_index(drop=True),
            "bucket": np.floor(v[ok] / bucket_width).astype(np.int64)})

    hist = grouped_count(ds.map_batches(bucketize, batch_format="pandas"),
                         [key_col, "bucket"], "n", num_partitions).to_pandas()
    if hist.empty:
        return {}, {}
    hist = hist.sort_values([key_col, "bucket"]).reset_index(drop=True)

    totals: dict = {}
    need_rows: list[tuple] = []
    stat_addr: dict[tuple, list[tuple[int, int]]] = {}  # (key,b) -> [(k,off)]
    for key, g in hist.groupby(key_col, sort=False):
        cum = g["n"].cumsum().to_numpy()
        buckets = g["bucket"].to_numpy()
        total = int(cum[-1])
        totals[key] = total
        for k in set(ks_builder(total)):
            i = int(np.searchsorted(cum, k, side="left"))
            b = int(buckets[i])
            before = int(cum[i - 1]) if i else 0
            if (key, b) not in stat_addr:
                need_rows.append((key, b))
            stat_addr.setdefault((key, b), []).append((k, k - before))
    need_df = pd.DataFrame(need_rows, columns=[key_col, "b"])

    def pick(batch: pd.DataFrame) -> pd.DataFrame:
        v = batch[col].to_numpy(dtype=np.float64)
        ok = ~np.isnan(v)
        df = pd.DataFrame({
            key_col: batch[key_col].reset_index(drop=True)[ok]
            .reset_index(drop=True),
            "v": v[ok],
            "b": np.floor(v[ok] / bucket_width).astype(np.int64)})
        return df.merge(need_df, on=[key_col, "b"])  # C-speed membership

    vals = ds.map_batches(pick, batch_format="pandas").to_pandas()
    stats: dict[tuple, float] = {}
    for (key, b), grp in vals.groupby([key_col, "b"], sort=False):
        inb = np.sort(grp["v"].to_numpy())
        for k, off in stat_addr[(key, b)]:
            stats[(key, k)] = float(inb[off - 1])
    return stats, totals


def exact_group_quantiles(ds, key_col: str, col: str, ps_pm: list[int],
                          bucket_width: float = 1.0,
                          num_partitions: int = 32) -> pd.DataFrame:
    """Per-group exact per-mille quantiles (percentile_disc). Returns
    (key_col, p_pm, value), one row per group × requested point."""
    _validate_ps(ps_pm)
    stats, totals = _group_order_stats(
        ds, key_col, col, lambda n: _disc_ks(ps_pm, n).values(),
        bucket_width, num_partitions)
    if not totals:
        return _empty_group_result(key_col)
    out = []
    for key, total in totals.items():
        for p, k in _disc_ks(ps_pm, total).items():
            out.append((key, p, stats[(key, k)]))
    res = pd.DataFrame(sorted(out), columns=[key_col, "p_pm", "value"])
    return res.astype({"p_pm": "int64", "value": "float64"})


def exact_group_quantiles_cont(ds, key_col: str, col: str, ps_pm: list[int],
                               bucket_width: float = 1.0,
                               num_partitions: int = 32) -> pd.DataFrame:
    """Per-group interpolated (``percentile_cont``) quantiles — the same
    grouped machinery resolving the TWO bracketing order statistics per
    (group, point), interpolated with DuckDB's exact double arithmetic."""
    _validate_ps(ps_pm)

    def builder(n: int) -> list[int]:
        return [k for klo, khi, _, _ in _cont_plan(ps_pm, n).values()
                for k in (klo, khi)]

    stats, totals = _group_order_stats(ds, key_col, col, builder,
                                       bucket_width, num_partitions)
    if not totals:
        return _empty_group_result(key_col)
    out = []
    for key, total in totals.items():
        for p, (klo, khi, w_lo, w_hi) in _cont_plan(ps_pm, total).items():
            if klo == khi:
                out.append((key, p, stats[(key, klo)]))
            else:
                out.append((key, p, stats[(key, klo)] * w_lo
                            + stats[(key, khi)] * w_hi))
    res = pd.DataFrame(sorted(out), columns=[key_col, "p_pm", "value"])
    return res.astype({"p_pm": "int64", "value": "float64"})


# -------------------------------------------------------------------- faces

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


def order_price_quantiles_by_priority_ds(sf_dir: str,
                                         ps_pm: tuple = (500, 900)):
    """Exact o_totalprice percentiles per o_orderpriority — the SQL-checked
    face of ``exact_group_quantiles``."""
    from .io import read_table
    ds = read_table(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])
    return exact_group_quantiles(ds, "o_orderpriority", "o_totalprice",
                                 list(ps_pm), bucket_width=100.0)


def price_quantiles_by_priority_cont_ds(sf_dir: str,
                                        ps_pm: tuple = (500, 613, 900)):
    """Interpolated o_totalprice percentiles per o_orderpriority — the
    SQL-checked face of ``exact_group_quantiles_cont``."""
    from .io import read_table
    ds = read_table(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])
    return exact_group_quantiles_cont(ds, "o_orderpriority", "o_totalprice",
                                      list(ps_pm), bucket_width=100.0)


def bottomk_sample_quantiles(ds, id_col: str, value_col: str,
                             ps_pm: list[int], k: int = 256):
    """Approximate quantiles from a BOTTOM-K-BY-HASH sample — the
    order-independent quantile sketch. Each row's priority is
    ``md5(str(id))``; the sketch is the k rows with the smallest
    priorities, i.e. a deterministic uniform-without-replacement sample
    (KMV sampling, as in distinct-value sketches; rank error O(1/sqrt k)).
    Unlike KLL/t-digest compactors, bottom-k is a pure SET function of the
    data — merge = union + trim, independent of block order — so the face
    is bit-exact vs a SQL oracle and stable across runs and cluster
    shapes. Use the exact two-phase ops when error must be zero; use this
    one when a fixed tiny memory budget matters more (monitoring
    percentiles over a 100 TB stream: k rows per block move, ever).

    The approx quantile is the sample's order statistic at
    ``(p_pm * (n_sample - 1)) // 1000`` — an actual data value, so float
    equality is safe (no arithmetic on the value).

    Returns one row per p: (p_pm, value).
    """
    import hashlib as _hl

    def local(batch: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "h": [_hl.md5(str(i).encode()).hexdigest()
                  for i in batch[id_col]],
            "v": batch[value_col].to_numpy(),
        })
        # nsmallest rejects object dtype; sort+head is the string path
        return out.sort_values("h").head(k) if len(out) > k else out

    # O(blocks x k) slim partial rows; the global trim is driver-side and
    # bounded (the label_centroids partial-reduce shape)
    parts = ds.map_batches(local, batch_format="pandas").to_pandas()
    sample = parts.sort_values("h").head(k)
    vals = np.sort(sample["v"].to_numpy())
    n = len(vals)
    rows = [{"p_pm": int(p), "value": float(vals[(p * (n - 1)) // 1000])}
            for p in ps_pm] if n else []
    return pd.DataFrame(rows, columns=["p_pm", "value"]) \
        .astype({"p_pm": "int64"})


def order_price_quantiles_sketch_ds(sf_dir: str, k: int = 256,
                                    ps_pm: tuple = (250, 500, 750, 900)):
    """Bottom-k-sample o_totalprice percentiles — the SQL-checked face of
    ``bottomk_sample_quantiles`` (sampled by md5(o_orderkey))."""
    from .io import read_table
    ds = read_table(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    return bottomk_sample_quantiles(ds, "o_orderkey", "o_totalprice",
                                    list(ps_pm), k=k)


def grouped_bottomk_quantiles(ds, group_col: str, id_col: str,
                              value_col: str, ps_pm: list[int],
                              k: int = 256, num_partitions: int = 32):
    """Per-group bottom-k-by-hash approximate quantiles — the grouped face
    of ``bottomk_sample_quantiles`` (same KMV sample, same order-stat
    convention), finished entirely inside the workers: a vectorized
    per-batch per-group prune (<= k rows per group per block move), one
    coarse hash partition on the group, per-group trim + order stats in
    the partition. Unlike the global face there is NO driver reduce at
    all — groups scale without the driver seeing them.

    Returns one row per (group, p): (group_col, p_pm, value)."""
    import hashlib as _hl

    from .agg import partitioned_group_apply

    def local(batch: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "g": batch[group_col].to_numpy(),
            "h": [_hl.md5(str(i).encode()).hexdigest()
                  for i in batch[id_col]],
            "v": batch[value_col].to_numpy(),
        })
        return out.sort_values("h").groupby("g", sort=False).head(k)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for g, gg in df.groupby("g"):
            vals = np.sort(gg.sort_values("h").head(k)["v"].to_numpy())
            n = len(vals)
            rows.extend({group_col: g, "p_pm": int(p),
                         "value": float(vals[(p * (n - 1)) // 1000])}
                        for p in ps_pm)
        return pd.DataFrame(rows, columns=[group_col, "p_pm", "value"]) \
            .astype({"p_pm": "int64"})

    pruned = ds.map_batches(local, batch_format="pandas")
    return partitioned_group_apply(pruned, ["g"], finish, num_partitions)


def price_quantiles_by_priority_sketch_ds(sf_dir: str, k: int = 256,
                                          ps_pm: tuple = (500, 900)):
    """Per-priority bottom-k-sample o_totalprice percentiles — the
    SQL-checked face of ``grouped_bottomk_quantiles``."""
    from .io import read_table
    ds = read_table(sf_dir, "orders",
                    ["o_orderpriority", "o_orderkey", "o_totalprice"])
    return grouped_bottomk_quantiles(ds, "o_orderpriority", "o_orderkey",
                                     "o_totalprice", list(ps_pm), k=k)


def winsorized_group_stats(ds, key_col: str, col: str,
                           lo_pm: int = 50, hi_pm: int = 950,
                           bucket_width: float = 1.0,
                           num_partitions: int = 32):
    """Winsorized (clamped-tail) robust statistics per group — the standard
    outlier-tolerant aggregate for noisy numeric columns: values below the
    group's p_lo are raised to it, values above p_hi lowered to it, then
    n / sum / mean are taken over the clamped column (in exact integer
    cents, the repo-wide bit-exact-sum convention).

    Composition, not a new shuffle: the clamp bounds come from the existing
    two-phase ``exact_group_quantiles`` (O(groups x 2) driver rows), get
    broadcast once (``ray.put``), and the aggregate is one streaming
    ``map_batches`` of per-batch partials + a driver-side reduce of
    O(groups) rows. The fact column shuffles zero times beyond the quantile
    pass's bucket histogram.

    Returns (key_col, n_rows, win_sum_cents, win_mean_cents), int64.
    """
    import ray as _ray

    from .analytic import _price_cents

    # ds feeds three scans (quantile histogram + refine + the partial-sum
    # pass) — materialize the pruned projection once, as mad_group_stats does
    ds = ds.materialize()
    q = exact_group_quantiles(ds, key_col, col, [lo_pm, hi_pm],
                              bucket_width, num_partitions)
    lo_map = {k: float(g.loc[g["p_pm"] == lo_pm, "value"].iloc[0])
              for k, g in q.groupby(key_col)}
    hi_map = {k: float(g.loc[g["p_pm"] == hi_pm, "value"].iloc[0])
              for k, g in q.groupby(key_col)}
    bounds_ref = _ray.put((lo_map, hi_map))

    def partial(batch: pd.DataFrame, _cache={}) -> pd.DataFrame:
        if "b" not in _cache:  # one fetch per worker process
            _cache["b"] = _ray.get(bounds_ref)
        lo_m, hi_m = _cache["b"]
        # Series.map(dict) is the vectorized lookup path — no per-row
        # Python lambda on the fact-table streaming pass
        lo = batch[key_col].map(lo_m).to_numpy(dtype=np.float64)
        hi = batch[key_col].map(hi_m).to_numpy(dtype=np.float64)
        cents = _price_cents(
            pd.Series(np.clip(batch[col].to_numpy(dtype=np.float64), lo, hi)))
        g = pd.DataFrame({key_col: batch[key_col], "c": cents}) \
            .groupby(key_col, as_index=False) \
            .agg(n_rows=("c", "size"), win_sum_cents=("c", "sum"))
        return g.astype({"n_rows": "int64", "win_sum_cents": "int64"})

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    out = parts.groupby(key_col, as_index=False)[
        ["n_rows", "win_sum_cents"]].sum()
    out["win_mean_cents"] = out["win_sum_cents"] // out["n_rows"]
    return out.astype({"n_rows": "int64", "win_sum_cents": "int64",
                       "win_mean_cents": "int64"}) \
        .sort_values(key_col).reset_index(drop=True)


def price_winsorized_stats_ds(sf_dir: str):
    """Per-priority winsorized o_totalprice stats (p05/p95 clamp) — the
    SQL-checked face of ``winsorized_group_stats``."""
    from .io import read_table
    ds = read_table(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])
    return winsorized_group_stats(ds, "o_orderpriority", "o_totalprice",
                                  lo_pm=50, hi_pm=950, bucket_width=100.0)


def mad_group_stats(ds, key_col: str, col: str, bucket_width: float = 1.0,
                    num_partitions: int = 32):
    """Median absolute deviation per group — the robust dispersion twin of
    ``price_var_by_priority``'s exact variance (MAD ignores the tails that
    dominate a variance): median_cents = exact per-group median of the
    column in integer cents; mad_cents = exact per-group median of
    |cents − median_cents|.

    Two passes of the existing two-phase exact quantile selection (each
    ships one O(buckets) histogram per group, never rows), with the
    group→median map broadcast between them; the deviation column is
    computed in-stream. percentile_disc semantics end to end, so the
    DuckDB oracle is bit-exact.

    Returns (key_col, median_cents, mad_cents), int64.
    """
    import ray as _ray

    from .analytic import _price_cents

    def to_cents(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({key_col: batch[key_col],
                             "cents": _price_cents(batch[col])})

    # the slim (key, cents) projection feeds four scans (2 passes × 2
    # quantile calls) — materialize it once instead of re-reading the fact
    # table each time (16 B/row in the object store, spillable)
    cents = ds.map_batches(to_cents, batch_format="pandas").materialize()
    med = exact_group_quantiles(cents, key_col, "cents", [500],
                                bucket_width, num_partitions)
    med_map = dict(zip(med[key_col], med["value"].astype(np.int64)))
    med_ref = _ray.put(med_map)

    def abs_dev(batch: pd.DataFrame, _cache={}) -> pd.DataFrame:
        if "m" not in _cache:  # one fetch per worker process
            _cache["m"] = _ray.get(med_ref)
        m = batch[key_col].map(_cache["m"]).to_numpy(dtype=np.int64)
        return pd.DataFrame({
            key_col: batch[key_col],
            "dev": np.abs(batch["cents"].to_numpy(dtype=np.int64) - m)})

    mad = exact_group_quantiles(cents.map_batches(abs_dev,
                                                  batch_format="pandas"),
                                key_col, "dev", [500],
                                bucket_width, num_partitions)
    out = pd.DataFrame({
        key_col: med[key_col],
        "median_cents": med["value"].astype("int64"),
    }).merge(pd.DataFrame({key_col: mad[key_col],
                           "mad_cents": mad["value"].astype("int64")}),
             on=key_col)
    return out.sort_values(key_col).reset_index(drop=True)


def price_mad_by_priority_ds(sf_dir: str):
    """Per-priority median + MAD of o_totalprice cents — the SQL-checked
    face of ``mad_group_stats``."""
    from .io import read_table
    ds = read_table(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])
    return mad_group_stats(ds, "o_orderpriority", "o_totalprice",
                           bucket_width=10_000.0)


def ship_lag_quantiles_ds(sf_dir: str, ps_pm: tuple = (500, 900),
                          num_partitions: int = 32):
    """Order-to-ship latency quantiles per priority — the supply-chain
    SLA metric (does '1-URGENT' actually ship faster?): lag_days =
    ship epoch-day − order epoch-day, through the generic fact⋈fact
    ``hash_join`` (lineitem ⋈ orders on orderkey — neither side
    broadcast), then the same exact two-phase grouped quantiles the
    price faces use. Lag rides as float64 so the ``percentile_disc``
    value column types match the oracle exactly. Returns
    (o_orderpriority, p_pm, value)."""
    from .io import read_table
    from .joins import hash_join

    li = read_table(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])
    orders = read_table(sf_dir, "orders",
                        ["o_orderkey", "o_orderdate", "o_orderpriority"])

    def okey(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "l_orderkey": b["o_orderkey"].astype("int64"),
            "o_orderpriority": b["o_orderpriority"],
            "__oday": (b["o_orderdate"].astype("int64")
                       // 86_400_000_000).astype("int64")})

    def lkey(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "l_orderkey": b["l_orderkey"].astype("int64"),
            "__sday": (b["l_shipdate"].astype("int64")
                       // 86_400_000_000).astype("int64")})

    j = hash_join(li.map_batches(lkey, batch_format="pandas"),
                  orders.map_batches(okey, batch_format="pandas"),
                  on=["l_orderkey"], num_partitions=num_partitions)

    def lag(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "o_orderpriority": b["o_orderpriority"],
            "lag_days": (b["__sday"] - b["__oday"])
            .to_numpy(dtype=np.float64)})

    lagged = j.map_batches(lag, batch_format="pandas")
    return exact_group_quantiles(lagged, "o_orderpriority", "lag_days",
                                 list(ps_pm), bucket_width=1.0)
