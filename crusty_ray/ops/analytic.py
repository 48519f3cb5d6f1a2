"""Analytic (window-function) operators — running totals, lag deltas,
rollup, pivot — expressed Ray-Data-first.

Ray Data has no SQL window functions. The scalable shape mirrors
ops/windows.py: ONE coarse hash-partition shuffle on the PARTITION BY key
(`partitioned_group_apply`), then the whole window computation runs
vectorized (pandas sort + cumsum/shift) over every key in the partition at
once — per-partition overhead, not per-key. Rollup/pivot aggregate the
finest grouping distributed first; the coarser levels / column spread are
derived from that tiny result.

All value columns are integer-typed (price cents, µs deltas) so the DuckDB
window-function oracles hash identically.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .agg import partitioned_group_apply
from .io import read_table


def _price_cents(prices: pd.Series) -> np.ndarray:
    """o_totalprice (2-decimal float) → exact integer cents, the repo-wide
    convention for order-independent bit-exact distributed sums."""
    return np.floor(prices.to_numpy(dtype=np.float64) * 100 + 0.5) \
        .astype(np.int64)


def running_order_totals_ds(sf_dir: str):
    """Per-customer running revenue: `sum(cents) OVER (PARTITION BY
    o_custkey ORDER BY o_orderdate, o_orderkey)` + `row_number()` — the
    cumulative-sum analytic window.

    One shuffle (coarse partitions on o_custkey); inside a partition one
    mergesort over all its customers, then a single vectorized
    groupby-cumsum/cumcount across every customer at once."""
    orders = read_table(sf_dir, "orders",
                        ["o_orderkey", "o_custkey", "o_orderdate",
                         "o_totalprice"])

    def window(df: pd.DataFrame) -> pd.DataFrame:
        g = df.sort_values(["o_custkey", "o_orderdate", "o_orderkey"],
                           kind="mergesort").reset_index(drop=True)
        g["__cents"] = _price_cents(g["o_totalprice"])
        grp = g.groupby("o_custkey", sort=False)
        return pd.DataFrame({
            "o_orderkey": g["o_orderkey"].astype("int64"),
            "o_custkey": g["o_custkey"].astype("int64"),
            "rn": (grp.cumcount() + 1).astype("int64"),
            "run_cents": grp["__cents"].cumsum().astype("int64"),
        })

    return partitioned_group_apply(orders, ["o_custkey"], window)


def lag_event_deltas_ds(sf_dir: str):
    """Per-user inter-event gap: `lag(ts) / lag(event_id) OVER (PARTITION BY
    user_id ORDER BY ts, event_id)`, NULL-as--1 so the output stays integer.

    Same one-shuffle plan; the lag is a vectorized shift over the
    user-ordered partition with a new-user mask — no per-user loop."""
    events = read_table(sf_dir, "events", ["event_id", "user_id", "ts"])

    def window(df: pd.DataFrame) -> pd.DataFrame:
        g = df.sort_values(["user_id", "ts", "event_id"],
                           kind="mergesort").reset_index(drop=True)
        ts = g["ts"].astype("int64").to_numpy()
        uid = g["user_id"].to_numpy()
        eid = g["event_id"].to_numpy()
        first = np.empty(len(g), dtype=bool)
        if len(g):
            first[0] = True
            first[1:] = uid[1:] != uid[:-1]
        prev_eid = np.empty(len(g), dtype=np.int64)
        delta = np.empty(len(g), dtype=np.int64)
        if len(g):
            prev_eid[0] = -1
            delta[0] = -1
            prev_eid[1:] = eid[:-1]
            delta[1:] = ts[1:] - ts[:-1]
        prev_eid[first] = -1
        delta[first] = -1
        return pd.DataFrame({
            "event_id": eid.astype("int64"),
            "user_id": uid.astype("int64"),
            "prev_event_id": prev_eid,
            "delta_us": delta,
        })

    return partitioned_group_apply(events, ["user_id"], window)


def _finest_order_counts(sf_dir: str) -> pd.DataFrame:
    """ONE distributed pass over the orders fact table down to the finest
    (priority, status) level — rollup/cube levels derive from this tiny
    frame by re-summing, never from a second fact scan (the classic
    aggregate-from-partials identity)."""
    from ray.data.aggregate import Count, Sum

    orders = read_table(sf_dir, "orders",
                        ["o_orderpriority", "o_orderstatus", "o_totalprice"])

    def add_cents(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "o_orderpriority": df["o_orderpriority"],
            "o_orderstatus": df["o_orderstatus"],
            "cents": _price_cents(df["o_totalprice"]),
        })

    return orders.map_batches(add_cents, batch_format="pandas") \
        .groupby(["o_orderpriority", "o_orderstatus"]) \
        .aggregate(Count(alias_name="n_orders"),
                   Sum("cents", alias_name="cents")) \
        .to_pandas()  # tiny: |priorities| × |statuses| rows


def _finalize_levels(frames: list[pd.DataFrame]) -> pd.DataFrame:
    out = pd.concat(frames, ignore_index=True)
    out["n_orders"] = out["n_orders"].astype("int64")
    out["cents"] = out["cents"].astype("int64")
    cols = ["o_orderpriority", "o_orderstatus", "n_orders", "cents"]
    return out[cols].sort_values(cols[:2]).reset_index(drop=True)


def _coarser(finest: pd.DataFrame, key: str, other: str) -> pd.DataFrame:
    lvl = finest.groupby(key, as_index=False)[["n_orders", "cents"]].sum()
    lvl[other] = "ALL"
    return lvl


def _grand(finest: pd.DataFrame) -> pd.DataFrame:
    return pd.DataFrame({"o_orderpriority": ["ALL"],
                         "o_orderstatus": ["ALL"],
                         "n_orders": [finest["n_orders"].sum()],
                         "cents": [finest["cents"].sum()]})


def rollup_order_counts_ds(sf_dir: str):
    """GROUP BY ROLLUP(o_orderpriority, o_orderstatus): order count + revenue
    cents at the (priority, status), (priority), and () levels, rolled-up
    columns as the 'ALL' sentinel (so the face stays string-typed, no NULL
    hash ambiguity)."""
    finest = _finest_order_counts(sf_dir)
    return _finalize_levels([
        finest, _coarser(finest, "o_orderpriority", "o_orderstatus"),
        _grand(finest)])


def cube_order_counts_ds(sf_dir: str):
    """GROUP BY CUBE(o_orderpriority, o_orderstatus) — rollup's levels plus
    the (status) margin, all derived from the same single finest pass."""
    finest = _finest_order_counts(sf_dir)
    return _finalize_levels([
        finest, _coarser(finest, "o_orderpriority", "o_orderstatus"),
        _coarser(finest, "o_orderstatus", "o_orderpriority"),
        _grand(finest)])


def pivot_event_dow_ds(sf_dir: str):
    """Pivot: event counts per event_type spread across day-of-week columns
    dow_0..dow_6 (epoch-day convention: 0 = Thursday 1970-01-01, identical
    arithmetic in the SQL oracle — no locale/week-start ambiguity).

    The distributed work is one narrow groupby on (event_type, dow); the
    spread-to-columns happens on the ≤ |types|×7-row result."""
    from ray.data.aggregate import Count

    events = read_table(sf_dir, "events", ["event_type", "ts"])

    def keys(df: pd.DataFrame) -> pd.DataFrame:
        epoch_s = df["ts"].astype("int64") // 1_000_000
        return pd.DataFrame({
            "event_type": df["event_type"],
            "dow": ((epoch_s // 86_400 + 4) % 7).astype("int64"),
        })

    counts = events.map_batches(keys, batch_format="pandas") \
        .groupby(["event_type", "dow"]).aggregate(Count(alias_name="cnt")) \
        .to_pandas()  # tiny: |types| × 7
    wide = counts.pivot_table(index="event_type", columns="dow",
                              values="cnt", fill_value=0, aggfunc="sum")
    out = pd.DataFrame({"event_type": wide.index})
    for d in range(7):
        out[f"dow_{d}"] = (wide[d].to_numpy(dtype="int64")
                           if d in wide.columns
                           else np.zeros(len(wide), dtype="int64"))
    return out.sort_values("event_type").reset_index(drop=True)


def user_event_sequences_ds(sf_dir: str):
    """Per-user ordered behavior sequence: event types joined in (ts,
    event_id) order — the feature string a sequence model or sessionizer
    consumes (`string_agg(event_type, ',' ORDER BY ts, event_id)`).

    One coarse shuffle on user_id; inside a partition a single mergesort +
    one pandas groupby-join builds every user's sequence at once."""
    events = read_table(sf_dir, "events", ["user_id", "ts", "event_id",
                                           "event_type"])

    def seqs(df: pd.DataFrame) -> pd.DataFrame:
        g = df.sort_values(["user_id", "ts", "event_id"],
                           kind="mergesort")
        out = g.groupby("user_id", sort=False).agg(
            seq=("event_type", ",".join), n_events=("event_id", "size"))
        out = out.reset_index()
        return out.astype({"user_id": "int64", "n_events": "int64"})

    return partitioned_group_apply(events, ["user_id"], seqs)


def distinct_users_per_type_ds(sf_dir: str):
    """Exact COUNT(DISTINCT user_id) per event_type — the exact counterpart
    of the HLL sketch (`ops/sketch.py`), via the two-level distinct plan in
    ``ops.agg.grouped_count_distinct``."""
    from .agg import grouped_count_distinct
    events = read_table(sf_dir, "events", ["event_type", "user_id"])
    return grouped_count_distinct(events, ["event_type"], "user_id",
                                  "n_users")


def users_weekday_and_weekend_ds(sf_dir: str):
    """Users active on BOTH weekdays and weekends — the distributed
    INTERSECT-of-two-distincts / `HAVING count(DISTINCT flag) = 2` shape.
    Per-batch local dedup of (user_id, is_weekend) shrinks the shuffle to
    ≤ 2 rows per user per block; one coarse partition then requires both
    flags. Epoch-day dow convention (0 = Thursday 1970-01-01), same
    arithmetic as the oracle."""
    events = read_table(sf_dir, "events", ["user_id", "ts"])

    def flags(df: pd.DataFrame) -> pd.DataFrame:
        epoch_s = df["ts"].astype("int64") // 1_000_000
        dow = (epoch_s // 86_400 + 4) % 7
        return pd.DataFrame({
            "user_id": df["user_id"].astype("int64"),
            "is_weekend": (dow >= 5).astype("int64"),
        }).drop_duplicates()

    def both(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates()
        n = d.groupby("user_id", as_index=False).agg(
            nf=("is_weekend", "nunique"))
        return n.loc[n["nf"] == 2, ["user_id"]].astype("int64")

    return partitioned_group_apply(
        events.map_batches(flags, batch_format="pandas"), ["user_id"], both)


def sql_ntile_buckets(rank0: np.ndarray, n: np.ndarray,
                      k: int) -> np.ndarray:
    """SQL's exact NTILE rule, vectorized: the first (n % k) buckets take
    floor(n/k)+1 rows. ``rank0`` is the 0-based rank within the window,
    ``n`` its window size — the ONE kernel the per-group and the RFM
    global ntiles share."""
    base, extra = n // k, n % k
    cut = extra * (base + 1)  # rows covered by the bigger buckets
    in_big = rank0 < cut
    return (np.where(
        in_big,
        rank0 // np.maximum(base + 1, 1),
        extra + (rank0 - cut) // np.maximum(base, 1),
    ) + 1).astype(np.int64)


def order_price_ntile_ds(sf_dir: str, k: int = 4):
    """`ntile(k) OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice,
    o_orderkey)` — equal-height bucketing per group, SQL's exact ntile rule
    (the first n % k buckets take the extra row). One coarse shuffle on the
    partition key; ranks and buckets are vectorized within the partition."""
    orders = read_table(sf_dir, "orders",
                        ["o_orderkey", "o_orderpriority", "o_totalprice"])

    def ntile(df: pd.DataFrame) -> pd.DataFrame:
        g = df.sort_values(["o_orderpriority", "o_totalprice", "o_orderkey"],
                           kind="mergesort").reset_index(drop=True)
        rank0 = g.groupby("o_orderpriority", sort=False).cumcount() \
            .to_numpy()  # 0-based
        n = g.groupby("o_orderpriority", sort=False)["o_orderkey"] \
            .transform("size").to_numpy()
        bucket = sql_ntile_buckets(rank0, n, k)
        return pd.DataFrame({
            "o_orderkey": g["o_orderkey"].astype("int64"),
            "o_orderpriority": g["o_orderpriority"],
            "bucket": bucket.astype("int64"),
        })

    return partitioned_group_apply(orders, ["o_orderpriority"], ntile)


def _cdc_version_rows(batch: pd.DataFrame) -> pd.DataFrame:
    """The deterministic CDC fixture shared by the upsert-merge and SCD2
    ops: base snapshot (version 0) plus every 7th order re-priced once
    (version 1, +key‰ cents) and every 21st re-priced again (version 2,
    +2·key‰) — emitted in-stream per block, one scan total."""
    k = batch["o_orderkey"].astype("int64").to_numpy()
    cents = _price_cents(batch["o_totalprice"])
    frames = [pd.DataFrame({"o_orderkey": k,
                            "version": np.zeros(len(k), dtype=np.int64),
                            "cents": cents})]
    m1 = k % 7 == 0
    frames.append(pd.DataFrame({
        "o_orderkey": k[m1],
        "version": np.ones(int(m1.sum()), dtype=np.int64),
        "cents": cents[m1] + k[m1] % 1000}))
    m2 = k % 21 == 0
    frames.append(pd.DataFrame({
        "o_orderkey": k[m2],
        "version": np.full(int(m2.sum()), 2, dtype=np.int64),
        "cents": cents[m2] + 2 * (k[m2] % 1000)}))
    return pd.concat(frames, ignore_index=True)


def upsert_orders_latest_ds(sf_dir: str, num_partitions: int = 32):
    """CDC upsert merge (the lakehouse ``MERGE INTO`` / merge-on-read
    resolution): the orders base snapshot plus a deterministic update
    stream — every 7th order re-priced once (version 1, +key‰ cents),
    every 21st re-priced again (version 2, +2·key‰) — compacted to the
    LATEST row per key with its version count, via ``agg.merge_latest``.

    The update stream derives in-stream from the same single base read
    (one ``map_batches`` emits base + update rows per block), so the op
    costs one scan + one pruned shuffle regardless of update fan-in.
    Returns (o_orderkey, final_cents, n_versions)."""
    from .io import read_table
    from .agg import merge_latest

    versions = read_table(sf_dir, "orders",
                          ["o_orderkey", "o_totalprice"]) \
        .map_batches(_cdc_version_rows, batch_format="pandas")
    merged = merge_latest(versions, ["o_orderkey"], "version",
                          num_partitions=num_partitions)

    def tidy(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "o_orderkey": df["o_orderkey"].astype("int64"),
            "final_cents": df["cents"].astype("int64"),
            "n_versions": df["n_versions"].astype("int64")})

    return merged.map_batches(tidy, batch_format="pandas")


def scd2_history(versions, key_col: str, version_col: str,
                 num_partitions: int = 32):
    """Slowly-Changing-Dimension type-2 history build (Kimball SCD2): turn
    a CDC version stream into validity intervals — each row gains
    ``valid_to_version`` (the NEXT version of the same key, the ``LEAD``
    window) and ``is_current`` (1 on the last version; its valid_to is the
    -1 open-interval sentinel, integer so the oracle hashes). The dual of
    ``agg.merge_latest``: merge keeps the latest row, SCD2 keeps them ALL
    with lineage.

    One coarse hash-partition shuffle on the key; inside the partition the
    lead is a vectorized sort + shift over every key at once (no per-key
    groups)."""
    from .agg import partitioned_group_apply

    def lead_in_part(df: pd.DataFrame) -> pd.DataFrame:
        g = df.sort_values([key_col, version_col],
                           kind="mergesort").reset_index(drop=True)
        k = g[key_col].to_numpy(dtype=np.int64)
        v = g[version_col].to_numpy(dtype=np.int64)
        nxt = np.empty(len(g), dtype=np.int64)
        if len(g):
            same = np.empty(len(g), dtype=bool)
            same[:-1] = k[:-1] == k[1:]
            same[-1] = False
            nxt[:-1] = np.where(same[:-1], v[1:], -1)
            nxt[-1] = -1
        g["valid_to_version"] = nxt
        g["is_current"] = (nxt == -1).astype(np.int64)
        return g

    return partitioned_group_apply(versions, [key_col], lead_in_part,
                                   num_partitions)


def scd2_order_history_ds(sf_dir: str, num_partitions: int = 32):
    """Contract face: the shared CDC fixture (``_cdc_version_rows``)
    expanded to its full SCD2 history — (o_orderkey, version, cents,
    valid_to_version, is_current), every price version kept with its
    validity interval."""
    from .io import read_table

    versions = read_table(sf_dir, "orders",
                          ["o_orderkey", "o_totalprice"]) \
        .map_batches(_cdc_version_rows, batch_format="pandas")
    hist = scd2_history(versions, "o_orderkey", "version",
                        num_partitions=num_partitions)

    def tidy(df: pd.DataFrame) -> pd.DataFrame:
        return df[["o_orderkey", "version", "cents",
                   "valid_to_version", "is_current"]].astype("int64")

    return hist.map_batches(tidy, batch_format="pandas")


# --------------------------------------------- incremental view maintenance

def ivm_delta_aggregate(versions, key_col: str, version_col: str,
                        value_col: str, group_fn,
                        num_partitions: int = 32):
    """Incremental view maintenance for a grouped SUM (the delta-based
    materialized-view update every streaming warehouse performs instead of
    recomputing): the maintained aggregate = the BASE (version-0) group
    sums plus each later version's per-key delta (``value − previous
    version's value``), never a rescan of merged state.

    One coarse key partition computes all per-key deltas (vectorized
    sort+shift — the SCD2 plan reused for differencing); base partials and
    delta partials then union into ONE card-sized grouped finish, so
    maintenance work is O(base scan + deltas), and at steady state (base
    aggregate already materialized) O(deltas) only. Counts come from the
    base alone — upserts change values, not key cardinality.

    ``group_fn(frame) -> int64 array``: the grouping key derived from
    ``key_col``. Returns (segment, n_keys, total) — faces rename the
    generic ``total`` to their domain column."""
    from .agg import partitioned_group_apply

    def parts(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key_col, version_col])
        seg = group_fn(df)
        val = df[value_col].to_numpy(np.int64)
        is_base = df[version_col].to_numpy(np.int64) == 0
        prev = np.roll(val, 1)
        keys = df[key_col].to_numpy(np.int64)
        # row 0 has no predecessor — np.roll WRAPS, which would compare a
        # single-key frame's first row against its own last version
        same = np.concatenate([[False], keys[1:] == keys[:-1]]) \
            if len(keys) else np.zeros(0, dtype=bool)
        # base rows contribute their full value and count 1; update rows
        # contribute value − previous version of the SAME key, count 0
        delta = np.where(is_base, val, val - np.where(same, prev, 0))
        out = pd.DataFrame({"segment": seg, "d": delta,
                            "c": is_base.astype(np.int64)})
        return out.groupby("segment", as_index=False).sum().astype("int64")

    partials = partitioned_group_apply(versions, [key_col], parts,
                                       num_partitions)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("segment", as_index=False).sum()
        return pd.DataFrame({"segment": out["segment"].astype("int64"),
                             "n_keys": out["c"].astype("int64"),
                             "total": out["d"].astype("int64")})

    return partitioned_group_apply(partials, ["segment"], finish,
                                   num_partitions)


def ivm_segment_totals_ds(sf_dir: str, num_partitions: int = 32):
    """Maintained per-segment order totals over the shared CDC stream
    (segment = o_orderkey % 10): the IVM face whose oracle RECOMPUTES the
    view from the merged latest rows — maintained ≡ recomputed is the IVM
    correctness contract. Returns (segment, n_keys, total_cents)."""
    from .io import read_table

    versions = read_table(sf_dir, "orders",
                          ["o_orderkey", "o_totalprice"]) \
        .map_batches(_cdc_version_rows, batch_format="pandas")

    def seg(df: pd.DataFrame) -> np.ndarray:
        return df["o_orderkey"].to_numpy(np.int64) % 10

    out = ivm_delta_aggregate(versions, "o_orderkey", "version", "cents",
                              seg, num_partitions)
    return out.map_batches(
        lambda b: b.rename(columns={"total": "total_cents"}),
        batch_format="pandas")


def snapshot_diff(sides, key_col: str, val_col: str,
                  num_partitions: int = 32):
    """Generic distributed snapshot diff — the CDC-feed primitive that
    turns two table snapshots into an I/U/D change stream (what a
    lakehouse emits from two commits). ``sides`` carries BOTH snapshots
    as side-tagged rows (``__side`` 0 = old, 1 = new); the diff is one
    coarse hash partition on the key (every key's two rows co-locate),
    then a vectorized outer merge per partition classifies each key:
    only-old → 'D', only-new → 'I', value changed → 'U'; unchanged keys
    emit nothing. Shuffling both snapshots once is the floor for a diff
    (each side must meet the other); no driver materialization, and the
    output is O(changes), not O(rows).

    Precondition: keys are unique WITHIN each side (a snapshot has one
    row per key by definition) — enforced per partition, because a
    duplicated key would silently cartesian in the outer merge and emit
    inflated change rows. Returns (key, change, old_<val>, new_<val>)
    with -1 sentinels on the missing side (keeps the schema all-BIGINT
    for the bit-exact face)."""

    def diff_in_part(df: pd.DataFrame) -> pd.DataFrame:
        a = df[df["__side"] == 0][[key_col, val_col]] \
            .rename(columns={val_col: f"old_{val_col}"})
        b = df[df["__side"] == 1][[key_col, val_col]] \
            .rename(columns={val_col: f"new_{val_col}"})
        if not a[key_col].is_unique or not b[key_col].is_unique:
            raise ValueError(
                "snapshot_diff: duplicate keys within a side — each "
                "snapshot must carry one row per key")
        m = a.merge(b, on=key_col, how="outer")
        old = m[f"old_{val_col}"]
        new = m[f"new_{val_col}"]
        change = np.where(old.isna(), "I", np.where(new.isna(), "D", "U"))
        m = m.assign(change=change)
        m = m[(old.isna()) | (new.isna()) | (old != new)].copy()
        m[f"old_{val_col}"] = m[f"old_{val_col}"].fillna(-1).astype("int64")
        m[f"new_{val_col}"] = m[f"new_{val_col}"].fillna(-1).astype("int64")
        m[key_col] = m[key_col].astype("int64")
        return m[[key_col, "change", f"old_{val_col}", f"new_{val_col}"]]

    return partitioned_group_apply(sides, [key_col], diff_in_part,
                                   num_partitions)


def snapshot_diff_orders_ds(sf_dir: str, num_partitions: int = 32):
    """Contract face: diff two deterministic snapshots of the orders price
    table. Snapshot OLD = base cents; snapshot NEW = the latest cents from
    the shared CDC stream (the ``_cdc_version_rows`` re-price rule: +2·key‰
    for key%21, else +key‰ for key%7), minus every 13th key (deletes), plus
    a synthetic insert 2·10⁹+key (+500 cents) for every 11th key. Both
    sides derive from ONE base scan (a single map emits the side-tagged
    rows), so the op costs one scan + one key shuffle. Returns
    (o_orderkey, change, old_cents, new_cents)."""
    from .io import read_table

    def sides(batch: pd.DataFrame) -> pd.DataFrame:
        k = batch["o_orderkey"].astype("int64").to_numpy()
        cents = _price_cents(batch["o_totalprice"])
        latest = cents + np.where(k % 21 == 0, 2 * (k % 1000),
                                  np.where(k % 7 == 0, k % 1000, 0))
        frames = [
            pd.DataFrame({"o_orderkey": k, "__side": 0, "cents": cents}),
            pd.DataFrame({"o_orderkey": k[k % 13 != 0], "__side": 1,
                          "cents": latest[k % 13 != 0]}),
        ]
        ins = k % 11 == 0
        frames.append(pd.DataFrame({
            "o_orderkey": 2_000_000_000 + k[ins], "__side": 1,
            "cents": cents[ins] + 500}))
        out = pd.concat(frames, ignore_index=True)
        out["__side"] = out["__side"].astype("int64")
        out["cents"] = out["cents"].astype("int64")
        return out

    tagged = read_table(sf_dir, "orders",
                        ["o_orderkey", "o_totalprice"]) \
        .map_batches(sides, batch_format="pandas")
    return snapshot_diff(tagged, "o_orderkey", "cents", num_partitions)


def price_percent_rank_ds(sf_dir: str, num_partitions: int = 32):
    """Per-priority PERCENT_RANK of each order's price, in floor
    per-mille — the windowed ECDF ((rank−1)·1000 // (n−1), SQL's
    ``percent_rank() OVER (PARTITION BY priority ORDER BY ...)``) used
    for within-stratum score normalization before blending. Ranks are
    ``row_number`` over the total order (cents, o_orderkey), so ties
    rank deterministically and both faces agree bit-exact.

    Scale plan: the repo's window-op contract — ONE coarse hash
    partition on the PARTITION BY key, one vectorized argsort per group
    inside. Output is per-row (the normalized scores feed downstream
    blends); all integer. Returns (o_orderkey, o_orderpriority, cents,
    pct_pm)."""

    def prep(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "o_orderkey": batch["o_orderkey"].astype("int64"),
            "o_orderpriority": batch["o_orderpriority"],
            "cents": _price_cents(batch["o_totalprice"])})

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for pri, g in df.groupby("o_orderpriority", sort=False):
            n = len(g)
            rn = np.empty(n, dtype=np.int64)
            rn[np.lexsort((g["o_orderkey"].to_numpy(),
                           g["cents"].to_numpy()))] = np.arange(n)
            out.append(pd.DataFrame({
                "o_orderkey": g["o_orderkey"].to_numpy(),
                "o_orderpriority": pri,
                "cents": g["cents"].to_numpy(),
                "pct_pm": rn * 1000 // max(n - 1, 1)}))
        return pd.concat(out, ignore_index=True)

    ds = read_table(sf_dir, "orders",
                    ["o_orderkey", "o_orderpriority", "o_totalprice"])
    prepped = ds.map_batches(prep, batch_format="pandas")
    return partitioned_group_apply(prepped, ["o_orderpriority"], finish,
                                   num_partitions)


def rolling_median_user_value_ds(sf_dir: str, window: int = 5,
                                 num_partitions: int = 32):
    """Per-user rolling DISCRETE median of the trailing ``window`` event
    values (cents) — the robust rolling baseline (spike-resistant, unlike
    a rolling mean) behind anomaly gates. Discrete median = the sorted
    window's element at index (w−1)//2 (DuckDB ``quantile_disc(0.5)``'s
    lower-middle convention), so everything stays integer and bit-exact.
    Event order is the repo's total convention (ts, event_id).

    Scale plan: the window-op contract — ONE coarse hash partition on
    user_id, then a fully vectorized in-partition kernel: ``window``
    groupby-shifted value columns stacked to an (n, w) matrix (shifts
    never cross a user boundary), int64-max padding for short prefixes,
    one row-wise ``np.sort``, one gather at the per-row middle index. No
    per-row Python, no per-user loop. Returns (event_id, user_id,
    cents, roll_med_cents)."""

    def prep(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "event_id": batch["event_id"].astype("int64"),
            "user_id": batch["user_id"].astype("int64"),
            "ts": batch["ts"],
            "cents": _price_cents(batch["value"])})

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        from .agg import trailing_shift_matrix
        d = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        n = len(d)
        mat, cnt = trailing_shift_matrix(d, ["user_id"], "cents", window)
        mat.sort(axis=1)
        med = mat[np.arange(n), (cnt - 1) // 2]
        return pd.DataFrame({"event_id": d["event_id"].to_numpy(),
                             "user_id": d["user_id"].to_numpy(),
                             "cents": d["cents"].to_numpy(),
                             "roll_med_cents": med})

    from .io import read_table
    ev = read_table(sf_dir, "events", ["event_id", "user_id", "ts",
                                       "value"])
    prepped = ev.map_batches(prep, batch_format="pandas")
    return partitioned_group_apply(prepped, ["user_id"], finish,
                                   num_partitions)


def customer_rfm_ds(sf_dir: str, num_partitions: int = 32):
    """Classic RFM segmentation: per customer, Recency (last order
    epoch-day), Frequency (order count) and Monetary (total cents), each
    scored 1–5 by GLOBAL ntile over the customer population (SQL's exact
    ntile rule via the shared ``sql_ntile_buckets`` kernel; ascending, so
    5 = most recent / most frequent / highest spend), composed into the
    marketing-standard ``rfm = 100r + 10f + m`` code.

    Scale plan: the per-customer aggregates are distributed (per-batch
    partials on the ORDERS fact, one coarse custkey shuffle — max/count/
    sum are associative); the three global ntiles then run on the
    customer DIM table in one partition (a global rank needs the whole
    population ordered — the same single-window contract as
    ``order_price_ntile``; customer is dim-scale by construction).
    Returns (o_custkey, recency_day, frequency, monetary_cents, r_score,
    f_score, m_score, rfm)."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        day = (b["o_orderdate"].astype("int64") // 1_000_000 // 86_400)
        t = pd.DataFrame({"o_custkey": b["o_custkey"].astype("int64"),
                          "recency_day": day.astype("int64"),
                          "frequency": np.ones(len(b), dtype=np.int64),
                          "monetary_cents": _price_cents(b["o_totalprice"])})
        out = t.groupby("o_custkey", as_index=False).agg(
            recency_day=("recency_day", "max"),
            frequency=("frequency", "sum"),
            monetary_cents=("monetary_cents", "sum"))
        return out

    def per_key(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("o_custkey", as_index=False).agg(
            recency_day=("recency_day", "max"),
            frequency=("frequency", "sum"),
            monetary_cents=("monetary_cents", "sum"))
        out["__g"] = np.zeros(len(out), dtype=np.int64)
        return out

    def score(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop(columns="__g").reset_index(drop=True)
        n = np.full(len(d), len(d), dtype=np.int64)
        k = d["o_custkey"].to_numpy()
        scores = {}
        for name, col in (("r_score", "recency_day"),
                          ("f_score", "frequency"),
                          ("m_score", "monetary_cents")):
            rank0 = np.empty(len(d), dtype=np.int64)
            rank0[np.lexsort((k, d[col].to_numpy()))] = np.arange(len(d))
            scores[name] = sql_ntile_buckets(rank0, n, 5)
        d["r_score"] = scores["r_score"]
        d["f_score"] = scores["f_score"]
        d["m_score"] = scores["m_score"]
        d["rfm"] = (100 * d["r_score"] + 10 * d["f_score"]
                    + d["m_score"]).astype("int64")
        return d

    from .io import read_table
    orders = read_table(sf_dir, "orders",
                        ["o_custkey", "o_orderdate", "o_totalprice"])
    partials = orders.map_batches(partial, batch_format="pandas")
    per_cust = partitioned_group_apply(partials, ["o_custkey"], per_key,
                                       num_partitions)
    return partitioned_group_apply(per_cust, ["__g"], score, 1)


def priority_mix_shift_ds(sf_dir: str, num_partitions: int = 32):
    """Order-priority mix over time: each epoch-month's per-priority order
    share in per-mille — the composition-drift monitor (is '1-URGENT'
    growing?) a pipeline owner trends. Month = epoch-day // 30 (the repo's
    integer-calendar convention: arithmetic months, no locale).

    Plan: one ``grouped_count`` on (month, priority) — per-batch partials,
    card-sized shuffle; shares derive from the tiny result's month totals.
    Returns (month, o_orderpriority, n_orders, share_pm)."""
    from .agg import grouped_count

    orders = read_table(sf_dir, "orders",
                        ["o_orderdate", "o_orderpriority"])

    def keyed(b: pd.DataFrame) -> pd.DataFrame:
        day = b["o_orderdate"].astype("int64") // 86_400_000_000
        return pd.DataFrame({"month": (day // 30).astype("int64"),
                             "o_orderpriority": b["o_orderpriority"]})

    counts = grouped_count(orders.map_batches(keyed, batch_format="pandas"),
                           ["month", "o_orderpriority"], "n_orders",
                           num_partitions).to_pandas()
    if "month" not in counts.columns:
        return pd.DataFrame({
            "month": pd.Series([], dtype="int64"),
            "o_orderpriority": pd.Series([], dtype=object),
            "n_orders": pd.Series([], dtype="int64"),
            "share_pm": pd.Series([], dtype="int64")})
    tot = counts.groupby("month")["n_orders"].transform("sum")
    counts["share_pm"] = (counts["n_orders"] * 1000 // tot).astype("int64")
    return counts.sort_values(["month", "o_orderpriority"]) \
        .reset_index(drop=True)


def price_first_digit_ds(sf_dir: str, num_partitions: int = 32):
    """Benford-style first-digit audit of price cents — the fraud/synthetic
    -data smell test: the leading digit's observed distribution (a natural
    multiplicative process leans log-uniform; flat or spiked distributions
    flag generated or capped values). First digit via STRING head on both
    faces — float log10 is NOT exact at powers of ten, strings are.

    Map-only digit extraction + one card-sized grouped count. Returns
    (digit, n, share_pm)."""
    from .agg import grouped_count

    orders = read_table(sf_dir, "orders", ["o_totalprice"])

    def keyed(b: pd.DataFrame) -> pd.DataFrame:
        cents = _price_cents(b["o_totalprice"])
        first = pd.Series(cents).astype(str).str[0].astype("int64")
        return pd.DataFrame({"digit": first})

    counts = grouped_count(orders.map_batches(keyed, batch_format="pandas"),
                           ["digit"], "n", num_partitions).to_pandas()
    if "digit" not in counts.columns:
        return pd.DataFrame({"digit": pd.Series([], dtype="int64"),
                             "n": pd.Series([], dtype="int64"),
                             "share_pm": pd.Series([], dtype="int64")})
    total = int(counts["n"].sum())
    counts["share_pm"] = (counts["n"] * 1000 // max(total, 1)) \
        .astype("int64")
    return counts.sort_values("digit").reset_index(drop=True)
