"""Exact distributed second moments — grouped variance from integer
partial sums.

Float variance is order-dependent (Welford streams differently on every
layout), so the bit-exact distributed form works on INTEGER moments:
per-batch partials (n, Σx, Σx²) over price cents are exact int64 — a
1024-row batch of ≤ 6·10⁷-cent values keeps Σx² < 4·10¹⁸ < 2⁶³ — and the
per-group reduce re-sums the partials in arbitrary-precision PYTHON ints
(the whole-corpus Σx² overflows int64; the partial rows are tiny, the
Python-int work is per-group on an already-reduced frame). The final
sample variance is the integer formula

    var = (n·Σx² − (Σx)²) // (n·(n−1))

which DuckDB reproduces exactly in HUGEINT — the oracle face hashes
identically. Only (group, n, Σx, Σx²) partial rows ever shuffle: blocks ×
groups-per-block rows, never the fact table.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .agg import partitioned_group_apply
from .io import read_table

# provably-safe per-partial row count for Σx² in int64 given values ≤ 6e7
_PARTIAL_BATCH = 1024


def grouped_int_variance(ds, key_cols: list[str], val_col: str,
                         out_col: str = "var", num_partitions: int = 32):
    """Sample variance per group over an int64 value column, exact. Emits
    (key_cols..., n:int64, {out_col}:int64); groups with n < 2 get -1 (the
    SQL face COALESCEs NULL to the same sentinel).

    Contract: |values| ≤ 9·10⁷ so a 1024-row partial's Σx² stays below
    2⁶³ (scale money to cents, not micros). The cross-batch overflow is
    handled by the Python-int reduce, not by the partials."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        x = df[val_col].to_numpy(dtype=np.int64)
        tmp = df[key_cols].copy()
        tmp["__n"] = np.int64(1)
        tmp["__s"] = x
        tmp["__ss"] = x * x
        out = tmp.groupby(key_cols, as_index=False).sum()
        return out.astype({"__n": "int64", "__s": "int64", "__ss": "int64"})

    def reduce_part(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for key, g in df.groupby(key_cols, sort=False):
            # Python-int exact accumulation: Σx² over a large group exceeds
            # int64; the partial frame here is already blocks-per-group rows
            n = int(sum(int(v) for v in g["__n"]))
            s = sum(int(v) for v in g["__s"])
            ss = sum(int(v) for v in g["__ss"])
            var = ((n * ss - s * s) // (n * (n - 1))) if n >= 2 else -1
            key_vals = key if isinstance(key, tuple) else (key,)
            rows.append((*key_vals, n, var))
        out = pd.DataFrame(rows, columns=key_cols + ["n", out_col])
        return out.astype({"n": "int64", out_col: "int64"})

    parts = ds.map_batches(partial, batch_format="pandas",
                           batch_size=_PARTIAL_BATCH)
    return partitioned_group_apply(parts, key_cols, reduce_part,
                                   num_partitions)


def price_var_by_priority_ds(sf_dir: str):
    """Exact sample variance of o_totalprice (in cents²) per
    o_orderpriority — the SQL-checked face of ``grouped_int_variance``.
    Output: (o_orderpriority, n:int64, var_cents2:int64)."""
    from .analytic import _price_cents

    orders = read_table(sf_dir, "orders",
                        ["o_orderpriority", "o_totalprice"])

    def cents(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"o_orderpriority": df["o_orderpriority"],
                             "c": _price_cents(df["o_totalprice"])})

    return grouped_int_variance(
        orders.map_batches(cents, batch_format="pandas"),
        ["o_orderpriority"], "c", out_col="var_cents2")


def numeric_profile_ds(sf_dir: str, table: str = "lineitem",
                       cols: tuple = ("l_quantity", "l_extendedprice",
                                      "l_discount", "l_tax"),
                       num_partitions: int = 32):
    """Table profiler — per-numeric-column (n, exact NDV, min, max, sum)
    in cents, the data-profiling pass an engine runs before planning
    (statistics collection / ANALYZE): NDV drives join ordering and
    dictionary decisions, min/max drive zone maps, sums sanity-check
    loads. Integer cents (floor(x·100 + 0.5), the repo-wide money
    convention) keep the face bit-exact vs the SQL oracle; a 100 TB
    corpus (~10^12 cent-scale values) keeps Σ under 2^63 — and the
    per-batch partials are exact int64 regardless.

    Scale plan: ONE pass emits |cols| slim agg-partial rows per batch
    (driver reduce is O(blocks x cols)); NDV is exact via the
    ``grouped_count_distinct`` two-level plan — per-batch per-column
    value dedup, then one coarse shuffle of the distinct (column, value)
    pairs. Nothing fact-scale ever reaches the driver.

    Returns one row per column:
    (column_name, n_rows, ndv, min_cents, max_cents, sum_cents).
    """
    from .agg import grouped_count_distinct
    from .io import read_table

    ds = read_table(sf_dir, table, list(cols))

    def agg_partials(batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for c in cols:
            v = batch[c].to_numpy(dtype=np.float64)
            v = v[~np.isnan(v)]  # SQL aggregates ignore NULLs
            if not len(v):
                continue
            cents = np.floor(v * 100.0 + 0.5).astype(np.int64)
            rows.append((c, len(cents), int(cents.min()),
                         int(cents.max()), int(cents.sum())))
        return pd.DataFrame(rows, columns=["column_name", "n_rows",
                                           "min_cents", "max_cents",
                                           "sum_cents"])

    parts = ds.map_batches(agg_partials, batch_format="pandas").to_pandas()
    if "column_name" not in parts.columns:  # empty table drops the schema
        parts = pd.DataFrame({"column_name": pd.Series([], dtype=object),
                              "n_rows": pd.Series([], dtype="int64"),
                              "min_cents": pd.Series([], dtype="int64"),
                              "max_cents": pd.Series([], dtype="int64"),
                              "sum_cents": pd.Series([], dtype="int64")})
    agg = parts.groupby("column_name", as_index=False).agg(
        n_rows=("n_rows", "sum"), min_cents=("min_cents", "min"),
        max_cents=("max_cents", "max"), sum_cents=("sum_cents", "sum"))

    def pairs(batch: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for c in cols:
            v = batch[c].to_numpy(dtype=np.float64)
            v = v[~np.isnan(v)]
            cents = np.unique(np.floor(v * 100.0 + 0.5).astype(np.int64))
            frames.append(pd.DataFrame({"column_name": c, "vc": cents}))
        return pd.concat(frames, ignore_index=True)

    ndv = grouped_count_distinct(
        ds.map_batches(pairs, batch_format="pandas"),
        ["column_name"], "vc", "ndv", num_partitions).to_pandas()
    if "column_name" not in ndv.columns:
        ndv = pd.DataFrame({"column_name": pd.Series([], dtype=object),
                            "ndv": pd.Series([], dtype="int64")})

    # LEFT-complete over the requested columns: an all-NULL column still
    # gets its row (n=0, 0 sentinels — the oracle COALESCEs to match)
    base = pd.DataFrame({"column_name": sorted(cols)})
    out = base.merge(agg, on="column_name", how="left") \
        .merge(ndv, on="column_name", how="left").fillna(0)
    out = out[["column_name", "n_rows", "ndv", "min_cents", "max_cents",
               "sum_cents"]]
    for c in out.columns[1:]:
        out[c] = out[c].astype("int64")
    return out.sort_values("column_name").reset_index(drop=True)


def fk_orphan_summary(child_ds, child_key: str, parent_ds, parent_key: str,
                      num_partitions: int = 32) -> dict:
    """Referential-integrity core: how many CHILD rows (and distinct child
    keys) reference a key absent from PARENT. Both sides may be fact-scale —
    neither is broadcast or driver-materialized.

    Plan: ONE pass over each side, one shuffle total. The child side
    pre-aggregates per batch to per-key partial counts (plus a flagged
    NULL-tally row, so the NULL count rides the same pass instead of a
    second fact scan); the parent side dedups per batch. Both land in the
    same coarse key partition (side-tagged union) where partials sum per
    key, a vectorized isin decides orphans, and each partition emits ONE
    partial row. The driver sums O(num_partitions) partials.

    NULL keys follow the LEFT-JOIN oracle semantics exactly: a NULL child
    key matches no parent, so its rows count in ``n_child_rows`` and
    ``n_orphan_rows`` — but NOT in ``n_orphan_keys`` (SQL COUNT(DISTINCT)
    ignores NULLs); a NULL parent key matches nothing and is dropped.
    """

    def local_child(df: pd.DataFrame) -> pd.DataFrame:
        k = df[child_key]
        cnt = k.dropna().astype("int64").value_counts()
        out = pd.DataFrame({"__key": cnt.index.to_numpy(dtype="int64"),
                            "__n": cnt.to_numpy(dtype="int64")})
        out["__null"] = np.zeros(len(out), dtype="int64")
        n_null = int(k.isna().sum())
        if n_null:
            out = pd.concat(
                [out, pd.DataFrame({"__key": np.zeros(1, dtype="int64"),
                                    "__n": np.full(1, n_null, dtype="int64"),
                                    "__null": np.ones(1, dtype="int64")})],
                ignore_index=True)
        out["__parent"] = np.zeros(len(out), dtype="int64")
        return out

    def local_parent(df: pd.DataFrame) -> pd.DataFrame:
        k = df[parent_key].dropna().drop_duplicates()
        return pd.DataFrame({
            "__key": k.astype("int64").to_numpy(),
            "__n": np.zeros(len(k), dtype="int64"),
            "__null": np.zeros(len(k), dtype="int64"),
            "__parent": np.ones(len(k), dtype="int64")})

    both = child_ds.map_batches(local_child, batch_format="pandas") \
        .union(parent_ds.map_batches(local_parent, batch_format="pandas"))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        nulls = df["__null"] == 1
        n_null = int(df.loc[nulls, "__n"].sum())
        df = df[~nulls]
        has_parent = df.loc[df["__parent"] == 1, "__key"].unique()
        # all partials of a key hash into this partition — the groupby sum
        # here IS the global per-key count
        ch = df[df["__parent"] == 0].groupby("__key", as_index=False)["__n"] \
            .sum()
        orphan = ~ch["__key"].isin(has_parent)
        return pd.DataFrame({
            "n_child_rows": pd.Series([int(ch["__n"].sum()) + n_null],
                                      dtype="int64"),
            "n_orphan_rows": pd.Series(
                [int(ch.loc[orphan, "__n"].sum()) + n_null], dtype="int64"),
            "n_orphan_keys": pd.Series([int(orphan.sum())], dtype="int64")})

    parts = partitioned_group_apply(both, ["__key"], partial,
                                    num_partitions).to_pandas()
    if parts.empty:
        return {"n_child_rows": 0, "n_orphan_rows": 0, "n_orphan_keys": 0}
    return {c: int(parts[c].sum()) for c in parts.columns}


def referential_integrity_ds(sf_dir: str, num_partitions: int = 32):
    """Foreign-key integrity audit over the warehouse's two fact→parent
    edges — the data-quality gate a pipeline runs before joining: orphan
    child rows silently vanish from inner joins and silently NULL-pad left
    joins, so the audit quantifies the blast radius up front. One row per
    relationship: total child rows, orphan child rows, distinct orphan
    keys."""
    rels = [
        ("lineitem.l_orderkey->orders.o_orderkey",
         read_table(sf_dir, "lineitem", ["l_orderkey"]), "l_orderkey",
         read_table(sf_dir, "orders", ["o_orderkey"]), "o_orderkey"),
        ("orders.o_custkey->customer.c_custkey",
         read_table(sf_dir, "orders", ["o_custkey"]), "o_custkey",
         read_table(sf_dir, "customer", ["c_custkey"]), "c_custkey"),
    ]
    rows = []
    for rel, child, ck, parent, pk in rels:
        s = fk_orphan_summary(child, ck, parent, pk, num_partitions)
        rows.append({"rel": rel, **s})
    out = pd.DataFrame(rows)
    for c in out.columns[1:]:
        out[c] = out[c].astype("int64")
    return out.sort_values("rel").reset_index(drop=True)


# ----------------------------------------------------------- grouped trend
def _trunc_div(num: np.ndarray, den: np.ndarray) -> np.ndarray:
    """Integer division TRUNCATING toward zero — DuckDB's ``//`` semantics
    for signed operands (Python/numpy ``//`` floors: -7//2 is -4 in
    Python but -3 in DuckDB). Required whenever an oracled quotient can
    be negative; the repo's usual ``//`` convention only holds for
    non-negative values. den == 0 raises (DuckDB errors there too) —
    mask zero denominators BEFORE calling, as ``user_value_trend`` does.
    Accepts object-dtype (Python int) arrays for quantities past int64."""
    num, den = np.asarray(num), np.asarray(den)
    if (den == 0).any():
        raise ZeroDivisionError("_trunc_div: zero denominator — mask "
                                "invalid rows before dividing")
    q = np.abs(num) // np.abs(den)
    return np.where(np.sign(num) * np.sign(den) < 0, -q, q)


def user_value_trend_ds(sf_dir: str, num_partitions: int = 32):
    """Per-user least-squares trend of event value over time — OLS slope
    from the four algebraic sums (n, Σx, Σy, Σxy, Σx²), the canonical
    "trend per entity" analytic a pipeline derives drift/engagement
    signals from. slope_pm = 1000·(n·Σxy − Σx·Σy) ⫽ (n·Σx² − (Σx)²)
    (truncating division, matching DuckDB ``//``; 0 when n < 2 or the
    x-variance is zero). x = minutes since the corpus's FIRST event
    (bounded magnitudes keep every product inside int64 — anchoring at
    epoch would overflow n·Σx²); y = value in exact integer milli-units.

    Plan: one O(1)-driver min-minute scan, per-batch partial sums (the
    algebraic-aggregate identity — sums add across blocks), one coarse
    user partition to finish. Returns (user_id, n_events, slope_pm)."""
    from .agg import partitioned_group_apply

    def xy(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "user_id": df["user_id"].astype("int64"),
            "x": (df["ts"].astype("int64") // 60_000_000).astype("int64"),
            "y": np.floor(df["value"].to_numpy(dtype=np.float64) * 1000
                          + 0.5).astype(np.int64)})

    ev = read_table(sf_dir, "events", ["user_id", "ts", "value"]) \
        .map_batches(xy, batch_format="pandas").materialize()
    if ev.count() == 0:  # empty-table face: typed empty, like the oracle
        import ray as _ray
        return _ray.data.from_pandas(
            pd.DataFrame({"user_id": pd.Series([], dtype="int64"),
                          "n_events": pd.Series([], dtype="int64"),
                          "slope_pm": pd.Series([], dtype="int64")}))
    x0 = int(ev.min("x"))  # O(1) driver scalar

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        x = df["x"].to_numpy(dtype=np.int64) - x0
        y = df["y"].to_numpy(dtype=np.int64)
        p = pd.DataFrame({"user_id": df["user_id"], "n": np.int64(1),
                          "sx": x, "sy": y, "sxy": x * y, "sxx": x * x})
        return p.groupby("user_id", as_index=False).sum().astype("int64")

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("user_id", as_index=False).sum().astype("int64")
        # the cross-term products run in PYTHON ints (object dtype): the
        # module's grouped_int_variance discipline — 1000·(n·Σxy − Σx·Σy)
        # exceeds int64 headroom on long event spans, and numpy would
        # wrap silently where the HUGEINT oracle stays exact
        n = g["n"].to_numpy(dtype=object)
        sx, sy = g["sx"].to_numpy(dtype=object), g["sy"].to_numpy(object)
        sxy = g["sxy"].to_numpy(dtype=object)
        sxx = g["sxx"].to_numpy(dtype=object)
        den = n * sxx - sx * sx
        valid = (g["n"].to_numpy() >= 2) & (den > 0).astype(bool)
        slope = np.zeros(len(g), dtype=np.int64)
        if valid.any():
            slope[valid] = _trunc_div(
                1000 * (n * sxy - sx * sy)[valid],
                den[valid]).astype(np.int64)
        return pd.DataFrame({
            "user_id": g["user_id"],
            "n_events": g["n"].astype("int64"),
            "slope_pm": slope})

    return partitioned_group_apply(
        ev.map_batches(partial, batch_format="pandas"),
        ["user_id"], finish, num_partitions)


def user_modal_event_ds(sf_dir: str, num_partitions: int = 32):
    """Per-user modal event type (the grouped MODE with a deterministic
    lexicographic-min tie-break) — each user's dominant action. One
    (user, type) ``grouped_count`` (per-batch partials) + the
    ``grouped_top_n(n=1)`` local-prune plan. Returns
    (user_id, modal_type, n_occurrences)."""
    from .agg import grouped_count, grouped_top_n

    ev = read_table(sf_dir, "events", ["user_id", "event_type"])
    counts = grouped_count(ev, ["user_id", "event_type"], "n_occurrences",
                           num_partitions)
    top = grouped_top_n(counts, ["user_id"], "n_occurrences", 1,
                        ascending=False, tie_cols=["event_type"],
                        num_partitions=num_partitions)

    def tidy(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "user_id": df["user_id"].astype("int64"),
            "modal_type": df["event_type"],
            "n_occurrences": df["n_occurrences"].astype("int64")})

    return top.map_batches(tidy, batch_format="pandas")


def segment_revenue_share_ds(sf_dir: str, num_partitions: int = 32):
    """Revenue share per market segment — the ratio-to-report analytic:
    share_pm = 1000 · segment_cents // total_cents over the
    customer⋈orders join. The join is the generic ``hash_join`` on
    custkey (both sides fact-scale capable); per-batch partial cent sums
    shrink the shuffle to distinct segments per block; the total derives
    from the segment sums (card-sized), no second pass. Returns
    (c_mktsegment, seg_cents, share_pm)."""
    from .agg import partitioned_group_apply
    from .joins import hash_join

    def cust_slim(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"o_custkey": df["c_custkey"].astype("int64"),
                             "c_mktsegment": df["c_mktsegment"]})

    def ord_slim(df: pd.DataFrame) -> pd.DataFrame:
        # per-batch pre-aggregation: cents per customer BEFORE the join
        # (integer sums commute) — the all-to-all moves ≤ customers-per-
        # block rows instead of every order (~10× fewer on TPC-H)
        out = pd.DataFrame({
            "o_custkey": df["o_custkey"].astype("int64"),
            "cents": np.floor(df["o_totalprice"].to_numpy(dtype=np.float64)
                              * 100 + 0.5).astype(np.int64)})
        return out.groupby("o_custkey", as_index=False)["cents"].sum() \
            .astype("int64")

    joined = hash_join(
        read_table(sf_dir, "orders", ["o_custkey", "o_totalprice"])
        .map_batches(ord_slim, batch_format="pandas"),
        read_table(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
        .map_batches(cust_slim, batch_format="pandas"),
        on=["o_custkey"], num_partitions=num_partitions)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("c_mktsegment", as_index=False)["cents"].sum()
        out["cents"] = out["cents"].astype("int64")
        return out

    segs = partitioned_group_apply(
        joined.map_batches(partial, batch_format="pandas"),
        ["c_mktsegment"], partial, num_partitions).to_pandas()
    if segs.empty:
        return pd.DataFrame({"c_mktsegment": pd.Series([], dtype="object"),
                             "seg_cents": pd.Series([], dtype="int64"),
                             "share_pm": pd.Series([], dtype="int64")})
    total = int(segs["cents"].sum())
    out = pd.DataFrame({
        "c_mktsegment": segs["c_mktsegment"],
        "seg_cents": segs["cents"].astype("int64"),
        "share_pm": (1000 * segs["cents"].astype("int64")
                     // max(total, 1)).astype("int64")})
    return out.sort_values("c_mktsegment").reset_index(drop=True)


def quality_rules_ds(sf_dir: str, num_partitions: int = 32):
    """Deequ-style data-quality RULE report over orders — the validation
    pass a pipeline runs before trusting an ingest: five declarative
    constraints (uniqueness, completeness, domain membership, freshness
    bound, value bound), each scored (n_checked, n_violations,
    pass_per_mille). Distinct from ``numeric_profile_ds`` (ANALYZE-style
    statistics): this asserts CONTRACTS and counts breaches.

    Scale plan: four rules are per-batch violation tallies (map-only slim
    partials, driver reduce is O(blocks·rules)); uniqueness is exact via
    the ``grouped_count_distinct`` two-level plan (per-batch key dedup →
    one coarse shuffle of distinct keys), violations = n − NDV. All-integer
    scoring (floor per-mille on non-negative operands) keeps the face
    bit-exact vs the SQL oracle."""
    from .agg import grouped_count_distinct
    from .io import read_table

    cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderdate",
            "o_totalprice"]
    ds = read_table(sf_dir, "orders", cols)

    def partials(batch: pd.DataFrame) -> pd.DataFrame:
        n = len(batch)
        cents = np.floor(batch["o_totalprice"].to_numpy(np.float64)
                         * 100.0 + 0.5).astype(np.int64)
        dt = batch["o_orderdate"].to_numpy()
        rows = [
            ("custkey_not_null", n, int(batch["o_custkey"].isna().sum())),
            ("status_in_domain", n,
             int((~batch["o_orderstatus"].isin(["F", "O", "P"])).sum())),
            ("orderdate_before_2001", n,
             int((dt >= np.datetime64("2001-01-01")).sum())),
            ("price_cents_le_40m", n, int((cents > 40_000_000).sum())),
        ]
        return pd.DataFrame(rows, columns=["rule_name", "n_checked",
                                           "n_violations"])

    parts = ds.map_batches(partials, batch_format="pandas").to_pandas()
    if "rule_name" not in parts.columns:  # empty table drops the schema
        parts = pd.DataFrame({"rule_name": pd.Series([], dtype=object),
                              "n_checked": pd.Series([], dtype="int64"),
                              "n_violations": pd.Series([], dtype="int64")})
    agg = parts.groupby("rule_name", as_index=False).sum()

    def key_rows(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "__g": np.zeros(batch["o_orderkey"].nunique(), dtype=np.int64),
            "k": batch["o_orderkey"].astype("int64").unique()})

    # the NDV leg re-scans, but pruned to the ONE key column (the tally
    # pass streams the 5-column read once; two pruned streaming scans beat
    # materializing a fact-sized intermediate)
    keys_only = read_table(sf_dir, "orders", ["o_orderkey"])
    ndv = grouped_count_distinct(
        keys_only.map_batches(key_rows, batch_format="pandas"),
        ["__g"], "k", "ndv", num_partitions).to_pandas()
    n_total = int(agg["n_checked"].max()) if len(agg) else 0
    n_distinct = int(ndv["ndv"].iloc[0]) if len(ndv) else 0
    agg = pd.concat([agg, pd.DataFrame(
        [("orderkey_unique", n_total, n_total - n_distinct)],
        columns=["rule_name", "n_checked", "n_violations"])],
        ignore_index=True)

    agg["n_checked"] = agg["n_checked"].astype("int64")
    agg["n_violations"] = agg["n_violations"].astype("int64")
    agg["pass_per_mille"] = (
        (agg["n_checked"] - agg["n_violations"]) * 1000
        // agg["n_checked"].clip(lower=1)).astype("int64")
    return agg.sort_values("rule_name").reset_index(drop=True)


def spearman_qty_price_ds(sf_dir: str, num_partitions: int = 32):
    """Per-returnflag Spearman rank correlation between quantity and
    extended price — the distribution-free association measure (does
    bigger quantity mean bigger price, monotonic only). Ranks are
    AVERAGE ranks (the classical tie handling), which is the only
    deterministic choice here: the synthetic lineitem has duplicate
    (l_orderkey, l_linenumber) pairs, so no row-id tie-break exists and
    row_number ranks would pair arbitrarily between the two sorts.
    Doubled average ranks (2·avg is always integer) keep everything
    exact; ρ = 1 − 6Σd²/(n(n²−1)) with Σd² = sum_d2/4 becomes
    ((4N − 6·sum_d2)·1000) // 4N, TRUNCATING per-mille (the simple
    formula applied to tie-averaged ranks — documented convention, not
    the tie-corrected estimator).

    Scale plan: rank-based stats need each group whole for the two
    sorts — ONE coarse hash partition on l_returnflag
    (``partitioned_group_apply``, the repo's window-op contract), two
    vectorized pandas average-ranks inside, one row per group out. Σd²
    can reach 4n³/3, past int64 at n ≈ 1.9·10⁶ rows/group — the
    accumulation switches to per-chunk int64 dots summed in Python ints
    (chunk size sized so C·(2n)² provably fits int64); the final ×1000
    numerator is Python-int arithmetic on the already-reduced scalars.
    Returns (l_returnflag, n, sum_d2, rho_pm) — sum_d2 is emitted as
    int64 and is part of the oracle face at test scales; ρ_pm is the
    scale-safe output."""
    from .agg import partitioned_group_apply

    cols = ["l_returnflag", "l_quantity", "l_extendedprice"]
    ds = read_table(sf_dir, "lineitem", cols)

    def prep(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "l_returnflag": batch["l_returnflag"],
            "q": np.floor(batch["l_quantity"].to_numpy(np.float64)
                          * 100.0 + 0.5).astype(np.int64),
            "p": np.floor(batch["l_extendedprice"].to_numpy(np.float64)
                          * 100.0 + 0.5).astype(np.int64)})

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for flag, g in df.groupby("l_returnflag", sort=False):
            n = len(g)
            # 2·average-rank is exactly integer (.5 granularity; float64
            # exact to 2^52) — ties get identical ranks, so the pairing
            # between the two sorts is deterministic by construction
            rq2 = (2.0 * g["q"].rank(method="average")).astype(np.int64)
            rp2 = (2.0 * g["p"].rank(method="average")).astype(np.int64)
            d = (rq2 - rp2).to_numpy()
            # |d| ≤ 2n → d² ≤ 4n²; exact_dot_int64 handles every regime
            sum_d2 = exact_dot_int64(d, d, bound=4 * n * n)
            big_n = 4 * n * (n * n - 1)  # Python int — never overflows
            numer = (big_n - 6 * sum_d2) * 1000
            rho_pm = int(_trunc_div(np.array([numer], dtype=object),
                                    np.array([max(big_n, 1)],
                                             dtype=object))[0])
            rows.append((flag, n, sum_d2, rho_pm))
        return pd.DataFrame(rows, columns=["l_returnflag", "n", "sum_d2",
                                           "rho_pm"]).astype(
            {"n": "int64", "sum_d2": "int64", "rho_pm": "int64"})

    prepped = ds.map_batches(prep, batch_format="pandas")
    return partitioned_group_apply(prepped, ["l_returnflag"], finish,
                                   num_partitions)


def join_size_estimate(left_ds, left_key: str, right_ds, right_key: str,
                       num_partitions: int = 32):
    """Exact equi-join output cardinality WITHOUT running the join —
    |A ⋈ B| = Σ_k a_k·b_k over the per-key count histograms, the number a
    cost-based planner wants before picking a join strategy (and the
    skew/explosion pre-flight: a huge Σ says "salt or rethink" before the
    shuffle is paid). "Estimate" in the planner sense; the arithmetic is
    exact.

    Plan: each side pre-aggregates per batch to per-key partial counts
    (the shuffle carries distinct-keys-per-block rows, never facts), both
    land in one coarse key partition via a side-tagged union, the
    partition sums partials per (key, side) and emits ONE
    (Σ a_k·b_k, matched-keys) row; the driver sums O(partitions) rows.
    Per-key products are Python-int summed — a single hot key can pass
    int64 (10⁶ × 10⁶ rows on one key is 10¹²; a few thousand such keys
    overflow) — so each partition ships its sum as an int64-safe
    (hi, lo) = divmod(est, 2⁶²) pair and the driver recombines in
    Python ints. The returned ``est_rows`` column is int64: estimates
    past 2⁶³−1 saturate to int64 max (documented ceiling — at that
    cardinality the answer is "don't run this join" either way).
    Returns one row (n_matched_keys, est_rows)."""

    def local(ds, key, side):
        def cnt(df: pd.DataFrame) -> pd.DataFrame:
            out = df.groupby(key, as_index=False).size() \
                .rename(columns={key: "__key", "size": "__n"})
            out["__side"] = np.full(len(out), side, dtype=np.int64)
            return out.astype({"__key": "int64", "__n": "int64"})
        return ds.map_batches(cnt, batch_format="pandas")

    both = local(left_ds, left_key, 0).union(local(right_ds, right_key, 1))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["__key", "__side"], as_index=False)["__n"].sum()
        a = g[g["__side"] == 0].set_index("__key")["__n"]
        b = g[g["__side"] == 1].set_index("__key")["__n"]
        common = a.index.intersection(b.index)
        est = sum(int(a[k]) * int(b[k]) for k in common)
        hi, lo = divmod(est, 2 ** 62)  # both int64-safe up to est < 2¹²⁵
        return pd.DataFrame({"n_matched_keys": [len(common)],
                             "est_hi": [hi], "est_lo": [lo]}) \
            .astype("int64")

    parts = partitioned_group_apply(both, ["__key"], partial,
                                    num_partitions).to_pandas()
    if "est_hi" not in parts.columns:
        return pd.DataFrame({"n_matched_keys": pd.Series([0], dtype="int64"),
                             "est_rows": pd.Series([0], dtype="int64")})
    est = sum(int(h) * 2 ** 62 + int(l)
              for h, l in zip(parts["est_hi"], parts["est_lo"]))
    out = pd.DataFrame({
        "n_matched_keys": [int(parts["n_matched_keys"].sum())],
        "est_rows": [min(est, 2 ** 63 - 1)]})
    return out.astype("int64")


def orders_lineitem_join_size_ds(sf_dir: str, num_partitions: int = 32):
    """Contract face: the planner's cardinality pre-flight for
    orders ⋈ lineitem on orderkey."""
    left = read_table(sf_dir, "orders", ["o_orderkey"])
    right = read_table(sf_dir, "lineitem", ["l_orderkey"])
    return join_size_estimate(left, "o_orderkey", right, "l_orderkey",
                              num_partitions)


def exact_dot_int64(a: np.ndarray, b: np.ndarray,
                    bound: int) -> int:
    """Exact Σ aᵢ·bᵢ for int64 arrays whose per-element product is ≤
    ``bound`` (caller-proved): one int64 dot while n·bound fits int64,
    else per-chunk dots summed in Python ints; past 2⁶² (where even a
    single int64 product could wrap) the whole sum runs in Python ints.
    The overflow-safe accumulation behind the Spearman and Gini faces."""
    n = len(a)
    if n == 0:
        return 0
    bound = max(int(bound), 1)
    if n * bound <= 2**63 - 1:
        return int(np.dot(a, b))
    if bound >= 2**62:  # a single product may exceed int64 — pure Python
        return sum(int(x) * int(y) for x, y in zip(a, b))
    c = max(1, (2**63 - 1) // bound)  # chunk sum provably ≤ int64 max
    return sum(int(np.dot(a[i:i + c], b[i:i + c]))
               for i in range(0, n, c))


def events_gini_ds(sf_dir: str, num_partitions: int = 32):
    """Exact Gini coefficient of per-user event-count inequality — the
    corpus-health scalar (is activity spread or whale-dominated?) in
    truncating per-mille: G = (2·Σ i·xᵢ − (n+1)·Σx) / (n·Σx) over the
    ascending (count, user) rank. Rank ties carry equal x, so the rank
    order is unique where it matters — fully deterministic.

    Plan: per-user counts are the distributed ``grouped_count``; the
    rank-weighted sum then needs the counts globally ordered — ONE
    constant-group partition over the user-DIM-scale count table, IN A
    WORKER (the same single-window contract as RFM's global ntiles — the
    driver never holds the count table), with the
    Σ i·x accumulation overflow-safe via ``exact_dot_int64`` and the
    final ratio in Python ints. Returns one row
    (n_users, total_events, gini_pm)."""
    from .agg import grouped_count

    from .agg import partitioned_group_apply

    counts = grouped_count(
        read_table(sf_dir, "events", ["user_id"]), ["user_id"], "x",
        num_partitions)

    def score(df: pd.DataFrame) -> pd.DataFrame:
        d = df.sort_values(["x", "user_id"]).reset_index(drop=True)
        x = d["x"].to_numpy(dtype=np.int64)
        n = len(x)
        i = np.arange(1, n + 1, dtype=np.int64)
        six = exact_dot_int64(i, x, bound=int(n) * int(x.max()))
        sx = sum(int(v) for v in x)  # Python-int exact at any scale
        gini_pm = (2 * six - (n + 1) * sx) * 1000 // max(n * sx, 1)
        return pd.DataFrame({
            "n_users": pd.Series([n], dtype="int64"),
            "total_events": pd.Series([sx], dtype="int64"),
            "gini_pm": pd.Series([int(gini_pm)], dtype="int64")})

    tagged = counts.map_batches(
        lambda b: b.assign(__g=np.zeros(len(b), dtype=np.int64)),
        batch_format="pandas")
    out = partitioned_group_apply(tagged, ["__g"], score, 1).to_pandas()
    if "n_users" not in out.columns or not len(out):  # empty events
        return pd.DataFrame({"n_users": pd.Series([0], dtype="int64"),
                             "total_events": pd.Series([0], dtype="int64"),
                             "gini_pm": pd.Series([0], dtype="int64")})
    return out.drop(columns=[c for c in out.columns if c.startswith("__")],
                    errors="ignore").reset_index(drop=True)


def order_size_distribution_ds(sf_dir: str, num_partitions: int = 32):
    """Count-of-counts (degree-distribution shape): how many orders have
    exactly k lineitems — the fill-rate histogram capacity planning reads
    (and the same two-level plan any degree distribution uses). Two
    chained ``grouped_count``s: per-order line counts (per-batch partials,
    one key shuffle), then a card-sized count over the counts. Returns
    (n_lines, n_orders)."""
    from .agg import grouped_count

    li = read_table(sf_dir, "lineitem", ["l_orderkey"])
    per_order = grouped_count(li, ["l_orderkey"], "n_lines",
                              num_partitions)
    dist = grouped_count(
        per_order.map_batches(lambda b: b[["n_lines"]],
                              batch_format="pandas"),
        ["n_lines"], "n_orders", num_partitions)
    return dist


def revenue_concentration_ds(sf_dir: str, k: int = 10,
                             num_partitions: int = 32):
    """CR-k revenue concentration: the share of total order revenue held
    by the top-``k`` customers, in per-mille — the whale-dependence scalar
    beside the Gini (Gini sees the whole curve, CR-k the head).

    Plan: distributed per-customer cent sums (associative partials, one
    key shuffle); the top-k via ``grouped_top_n``'s constant-group
    local-prune (O(blocks·k) shuffle rows); total from the same partial
    pass — a second card-sized reduce, no extra fact scan. Returns one
    row (k, top_cents, total_cents, cr_pm)."""
    from .agg import grouped_top_n, partitioned_group_apply
    from .analytic import _price_cents

    orders = read_table(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        t = pd.DataFrame({"o_custkey": b["o_custkey"].astype("int64"),
                          "cents": _price_cents(b["o_totalprice"])})
        return t.groupby("o_custkey", as_index=False)["cents"].sum() \
            .astype({"cents": "int64"})

    def per_key(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("o_custkey", as_index=False)["cents"].sum()
        return out.astype({"cents": "int64"})

    per_cust = partitioned_group_apply(
        orders.map_batches(partial, batch_format="pandas"),
        ["o_custkey"], per_key, num_partitions).materialize()

    def tag(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["__g"] = np.zeros(len(b), dtype=np.int64)
        return b

    top = grouped_top_n(per_cust.map_batches(tag, batch_format="pandas"),
                        ["__g"], "cents", k, ascending=False,
                        tie_cols=["o_custkey"],
                        num_partitions=num_partitions).to_pandas()
    total = sum(int(r["cents"]) for r in
                per_cust.map_batches(
                    lambda b: pd.DataFrame(
                        {"cents": [int(b["cents"].sum())]}),
                    batch_format="pandas").to_pandas().to_dict("records"))
    top_cents = int(top["cents"].sum()) if "cents" in top.columns else 0
    return pd.DataFrame({
        "k": pd.Series([k], dtype="int64"),
        "top_cents": pd.Series([top_cents], dtype="int64"),
        "total_cents": pd.Series([total], dtype="int64"),
        "cr_pm": pd.Series([top_cents * 1000 // max(total, 1)],
                           dtype="int64")})


def order_reconciliation_ds(sf_dir: str, num_partitions: int = 32):
    """Cross-table reconciliation audit — the header-vs-detail consistency
    check every finance/ETL pipeline runs: each order's header total
    (cents) against the sum of its lineitems' extended prices (cents),
    bucketed into exact-match / header-higher / header-lower, plus orders
    with no lines at all. Counts only — the audit scalar a pipeline gates
    on; all-integer, so both faces agree bit-exact.

    Plan: both sides pre-aggregate per batch to per-order partial cents
    (associative sums), meet in ONE coarse key partition via a
    side-tagged union (the fk-audit shape), and each partition emits one
    4-bucket partial row; the driver sums O(partitions) rows. Returns one
    row (n_orders, n_match, n_header_higher, n_header_lower,
    n_no_lines)."""
    from .analytic import _price_cents

    orders = read_table(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    li = read_table(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice"])

    def o_part(b: pd.DataFrame) -> pd.DataFrame:
        t = pd.DataFrame({"__key": b["o_orderkey"].astype("int64"),
                          "__cents": _price_cents(b["o_totalprice"])})
        out = t.groupby("__key", as_index=False)["__cents"].sum()
        out["__side"] = np.zeros(len(out), dtype=np.int64)
        return out.astype({"__cents": "int64"})

    def l_part(b: pd.DataFrame) -> pd.DataFrame:
        t = pd.DataFrame({"__key": b["l_orderkey"].astype("int64"),
                          "__cents": _price_cents(b["l_extendedprice"])})
        out = t.groupby("__key", as_index=False)["__cents"].sum()
        out["__side"] = np.ones(len(out), dtype=np.int64)
        return out.astype({"__cents": "int64"})

    both = orders.map_batches(o_part, batch_format="pandas") \
        .union(li.map_batches(l_part, batch_format="pandas"))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["__key", "__side"], as_index=False)["__cents"] \
            .sum()
        h = g[g["__side"] == 0].set_index("__key")["__cents"]
        d = g[g["__side"] == 1].set_index("__key")["__cents"]
        m = h.to_frame("header").join(d.to_frame("detail"), how="left")
        no_lines = m["detail"].isna()
        diff = m.loc[~no_lines, "header"] - m.loc[~no_lines, "detail"]
        return pd.DataFrame({
            "n_orders": [len(m)],
            "n_match": [int((diff == 0).sum())],
            "n_header_higher": [int((diff > 0).sum())],
            "n_header_lower": [int((diff < 0).sum())],
            "n_no_lines": [int(no_lines.sum())]}).astype("int64")

    parts = partitioned_group_apply(both, ["__key"], partial,
                                    num_partitions).to_pandas()
    cols = ["n_orders", "n_match", "n_header_higher", "n_header_lower",
            "n_no_lines"]
    if "n_orders" not in parts.columns:
        return pd.DataFrame({c: pd.Series([0], dtype="int64")
                             for c in cols})
    return pd.DataFrame({c: pd.Series([int(parts[c].sum())],
                                      dtype="int64") for c in cols})


def value_pareto_point_ds(sf_dir: str, num_partitions: int = 32):
    """The Pareto point of user value: the smallest head of users (by
    total event value, descending) whose cents cover ≥ 80% of the corpus
    — "how top-heavy is value really" as a head COUNT (the Gini sees the
    whole curve, CR-k a fixed head; this finds the 80% knee). Exact
    integers: the condition is 5·cum ≥ 4·total, no percentages.

    Plan: distributed per-user cent sums, then the cumulative scan needs
    the users globally ordered — ONE constant-group partition IN A WORKER
    (the single-window contract), vectorized sort + cumsum + argmax.
    Returns one row (n_users, users_to_80pct, head_share_pm)."""
    from .agg import grouped_count, partitioned_group_apply
    from .analytic import _price_cents

    ev = read_table(sf_dir, "events", ["user_id", "value"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        t = pd.DataFrame({"user_id": b["user_id"].astype("int64"),
                          "cents": _price_cents(b["value"])})
        return t.groupby("user_id", as_index=False)["cents"].sum() \
            .astype({"cents": "int64"})

    def per_key(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("user_id", as_index=False)["cents"].sum()
        out["__g"] = np.zeros(len(out), dtype=np.int64)
        return out.astype({"cents": "int64"})

    per_user = partitioned_group_apply(
        ev.map_batches(partial, batch_format="pandas"),
        ["user_id"], per_key, num_partitions)

    def knee(df: pd.DataFrame) -> pd.DataFrame:
        d = df.sort_values(["cents", "user_id"],
                           ascending=[False, True]).reset_index(drop=True)
        c = d["cents"].to_numpy(dtype=np.int64)
        n = len(c)
        total = sum(int(v) for v in c)  # Python-int exact at any scale
        cum = 0
        m = n
        for i in range(n):  # O(n) over the already-reduced user dim;
            cum += int(c[i])  # Python ints — cum can pass int64
            if 5 * cum >= 4 * total:
                m = i + 1
                break
        return pd.DataFrame({
            "n_users": pd.Series([n], dtype="int64"),
            "users_to_80pct": pd.Series([m], dtype="int64"),
            "head_share_pm": pd.Series([m * 1000 // max(n, 1)],
                                       dtype="int64")})

    out = partitioned_group_apply(per_user, ["__g"], knee, 1).to_pandas()
    if "n_users" not in out.columns or not len(out):
        return pd.DataFrame({"n_users": pd.Series([0], dtype="int64"),
                             "users_to_80pct": pd.Series([0],
                                                         dtype="int64"),
                             "head_share_pm": pd.Series([0],
                                                        dtype="int64")})
    return out[["n_users", "users_to_80pct", "head_share_pm"]] \
        .reset_index(drop=True)
