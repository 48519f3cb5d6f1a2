"""Crawl-operator analogs over the driver's TPC-H-ish tables.

The driver's correctness gate (CORRECTNESS_r{N}.json) compares Ray pipelines
against DuckDB SQL on ``/root/testdata/sf*``. The crawl engine's own operators
run on the synthetic web, so each one ALSO gets an SQL-expressible analog here
exercising the identical Ray Data plan shape on the shared tables
(FIXTURES.md driver-contract section):

- top-k heavy hitters (A2)            → groupby + per-partition rank
- per-group budget (F5)               → row_number ≤ N inside map_groups
- depth filter (F6)                   → vectorized predicate + agg
- shard assignment (types.rs:51-53)   → md5-hash mod bucketing + counts
- link counts (A1/A4)                 → broadcast join + grouped sum
- queue gauges (A5/A6)                → time-bucket counts
- pricing agg (flagship wide agg)     → multi-aggregate groupby

Float discipline: money sums exit as integer cents via
``floor(sum·100 + 0.5)`` — bit-exact between numpy float64 and DuckDB double,
immune to summation-order ulps (the +0.5 keeps the floor boundary half a cent
away from the true value).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
from ray.data.aggregate import Count, Sum


def _read(sf_dir: str, table: str, columns=None):
    from .io import read_table
    return read_table(sf_dir, table, columns=columns)


# ------------------------------------------------------------- top-k (A2/A3)
def topk_heavy_hitters_ds(sf_dir: str, k: int = 5):
    """Per event_type, top-k users by event count (per-TLD heavy hitters).

    r3 rewrite: ranking via ``grouped_top_n`` (local ≤k-per-group prune in
    every block, then a coarse-partition finish) instead of holding one
    event_type's whole distinct-user count table in a single task."""
    from .agg import grouped_count, grouped_top_n
    ds = _read(sf_dir, "events", ["event_type", "user_id"])
    counts = grouped_count(ds, ["event_type", "user_id"], "cnt")
    return grouped_top_n(counts, ["event_type"], "cnt", k,
                         ascending=False, tie_cols=["user_id"],
                         rank_col="rnk")


# ------------------------------------------------------------- budgets (F4/F5)
def per_group_budget_ds(sf_dir: str, budget: int = 3):
    """First ``budget`` lineitems per order by linenumber (LinkPerPageBudget).

    High-cardinality group key (one per order) → coarse partitions with the
    per-key head() done by pandas inside (ops/agg.py pattern)."""
    from .agg import partitioned_group_apply
    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber"])

    def head_n(df: pd.DataFrame) -> pd.DataFrame:
        g = df.sort_values(["l_orderkey", "l_linenumber"])
        return g.groupby("l_orderkey", as_index=False).head(budget)[
            ["l_orderkey", "l_linenumber"]]

    return partitioned_group_apply(ds, ["l_orderkey"], head_n)


# ------------------------------------------------------------- depth filter (F6)
def depth_filter_ds(sf_dir: str, max_depth: int = 3):
    """Vectorized depth mask + grouped count (PageLevel analog)."""
    ds = _read(sf_dir, "lineitem", ["l_linenumber", "l_returnflag"])
    import pyarrow.compute as pc
    ds = ds.map_batches(
        lambda t: t.filter(pc.less_equal(t["l_linenumber"], max_depth)),
        batch_format="pyarrow")
    return ds.groupby("l_returnflag").aggregate(Count(alias_name="n_rows"))


# ------------------------------------------------------------- sharding
def minute_of(ts: pd.Series) -> np.ndarray:
    """Tumbling minute bucket from a µs timestamp column — the ONE kernel
    the tumbling (event_minute_buckets) and sliding (ops/windows) faces
    share, so their bucket boundaries can never drift apart."""
    return ((ts.astype("int64") // 1_000_000) // 60).to_numpy(dtype="int64")


def md5_shard(values: pd.Series, shard_total: int) -> np.ndarray:
    """First 8 md5 hex digits as int, mod shards — DuckDB-replicable hash."""
    return np.array(
        [int(hashlib.md5(str(v).encode()).hexdigest()[:8], 16) % shard_total
         for v in values], dtype=np.int64)


def shard_assignment_ds(sf_dir: str, shard_total: int = 8):
    """customer → shard histogram (crc32-style partitioning, types.rs:51-53)."""
    ds = _read(sf_dir, "customer", ["c_name"])

    def assign(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"shard": md5_shard(batch["c_name"], shard_total)})

    return ds.map_batches(assign, batch_format="pandas") \
        .groupby("shard").aggregate(Count(alias_name="n_customers"))


# ------------------------------------------------------------- link counts (A1/A4)
def segment_order_counts_ds(sf_dir: str):
    """Orders per market segment — small-side broadcast join (no shuffle join):
    customer dim is ray.put once and read in each batch task."""
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).to_pandas()
    lookup_ref = ray.put(dict(zip(cust["c_custkey"], cust["c_mktsegment"])))

    def tag(batch: pd.DataFrame, _cache={}) -> pd.DataFrame:
        if "m" not in _cache:  # one fetch/deserialize per worker process
            _cache["m"] = ray.get(lookup_ref)
        seg = batch["o_custkey"].map(_cache["m"])
        return pd.DataFrame({"c_mktsegment": seg[seg.notna()]})  # inner-join semantics

    ds = _read(sf_dir, "orders", ["o_custkey"])
    return ds.map_batches(tag, batch_format="pandas") \
        .groupby("c_mktsegment").aggregate(Count(alias_name="n_orders"))


# ------------------------------------------------------------- gauges (A5/A6)
def event_minute_buckets_ds(sf_dir: str):
    """Events per (type, minute bucket) — the queue-gauge/dashboard shape."""
    ds = _read(sf_dir, "events", ["ts", "event_type"])

    def bucket(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"event_type": batch["event_type"],
                             "minute": minute_of(batch["ts"])})

    from .agg import grouped_count
    return grouped_count(ds.map_batches(bucket, batch_format="pandas"),
                         ["event_type", "minute"], "n_events")


# ------------------------------------------------------------- pricing agg
def pricing_summary_ds(sf_dir: str):
    """TPC-H Q1-shaped flagship agg; money as integer cents (see module doc)."""
    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_linestatus", "l_quantity",
                "l_extendedprice", "l_discount"])

    def extend(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        disc = pc.multiply(batch["l_extendedprice"],
                           pc.subtract(pa.scalar(1.0), batch["l_discount"]))
        return batch.append_column("disc_price", disc)

    ds = ds.map_batches(extend, batch_format="pyarrow")
    agg = ds.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("l_quantity", alias_name="sum_qty"),
        Sum("disc_price", alias_name="sum_disc_price"),
        Count(alias_name="count_order"))

    def to_cents(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["sum_qty"] = np.floor(batch["sum_qty"] * 100.0 + 0.5).astype("int64")
        batch["sum_disc_price_cents"] = np.floor(
            batch["sum_disc_price"] * 100.0 + 0.5).astype("int64")
        return batch[["l_returnflag", "l_linestatus", "sum_qty",
                      "sum_disc_price_cents", "count_order"]]

    return agg.map_batches(to_cents, batch_format="pandas")


# ------------------------------------------------------------- priority queue (S2)
def priority_dequeue_ds(sf_dir: str, k: int = 10):
    """Top-k orders per priority class by value — the frontier's weighted
    priority dequeue as a rank query.

    r3 rewrite: the old ``groupby(priority).map_groups`` held a fifth of
    the orders FACT table in one task; ``grouped_top_n`` prunes each block
    to ≤k rows per priority locally, so the shuffle moves ≤ k·classes·blocks
    slim rows and no task sees more."""
    from .agg import grouped_top_n

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority", "o_totalprice"])

    def cents(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["price_cents"] = np.floor(
            batch["o_totalprice"] * 100.0 + 0.5).astype("int64")
        return batch[["o_orderpriority", "o_orderkey", "price_cents"]]

    ranked = grouped_top_n(ds.map_batches(cents, batch_format="pandas"),
                           ["o_orderpriority"], "price_cents", k,
                           ascending=False, tie_cols=["o_orderkey"])
    return ranked.map_batches(
        lambda b: b[["o_orderpriority", "o_orderkey", "price_cents"]],
        batch_format="pandas")


# ------------------------------------------------------------- global sort / union
def global_sort_topn_ds(sf_dir: str, n: int = 20):
    """Global multi-key sort + limit (Dataset.sort is an all-to-all range
    shuffle; the limit prunes to the first blocks). Deterministic tie-break
    chain, integer outputs."""
    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber", "l_quantity"])

    def to_int(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["qty"] = np.floor(batch["l_quantity"] * 100 + 0.5).astype("int64")
        return batch[["qty", "l_orderkey", "l_linenumber"]]

    ds = ds.map_batches(to_int, batch_format="pandas")
    out = ds.sort(["qty", "l_orderkey", "l_linenumber"],
                  descending=[True, False, False]).limit(n)
    df = out.to_pandas()
    df["rnk"] = np.arange(1, len(df) + 1, dtype=np.int64)
    return df


def union_event_classes_ds(sf_dir: str):
    """Two filtered streams unioned then counted — Dataset.union coverage
    (error events tagged 'err' ∪ signup events tagged 'new')."""
    from ray.data.aggregate import Count

    def pick(event_type: str, tag: str):
        def fn(batch: pd.DataFrame) -> pd.DataFrame:
            sub = batch[batch["event_type"] == event_type]
            return pd.DataFrame({"klass": [tag] * len(sub),
                                 "user_id": sub["user_id"].astype("int64")})
        return fn

    # Dataset.union does NOT share a common upstream between branches, so
    # the column-pruned scan runs once per branch — the deliberate trade at
    # fact scale: a second 2-column scan streams, while .materialize()
    # would pin the whole projection in the object store
    ds = _read(sf_dir, "events", ["event_type", "user_id"])
    errors = ds.map_batches(pick("error", "err"), batch_format="pandas")
    signups = ds.map_batches(pick("signup", "new"), batch_format="pandas")
    return errors.union(signups).groupby("klass").aggregate(
        Count(alias_name="n_events"))


# ------------------------------------------------------------- top-n per group
def top_docs_per_source_ds(sf_dir: str, n: int = 3):
    """Top-``n`` documents per (lang, source) by length — the window-function
    ``row_number() OVER (PARTITION BY ... ORDER BY ...) <= n`` operator, on
    the generic ``agg.grouped_top_n`` plan (local per-batch prune, then one
    coarse-partition shuffle; the corpus never shuffles whole). Deterministic
    total order: (n_chars DESC, doc_id ASC)."""
    from .agg import grouped_top_n
    ds = _read(sf_dir, "documents", ["lang", "source", "doc_id", "n_chars"])
    return grouped_top_n(ds, ["lang", "source"], "n_chars", n,
                         ascending=False, tie_cols=["doc_id"])


def props_value_histogram_ds(sf_dir: str):
    """Histogram of the numeric payload field inside the events ``props``
    JSON column — the semi-structured-extraction op. The extract is a
    vectorized pandas regex over the whole batch (not per-row json.loads);
    the groupby key is the small extracted-value domain."""
    from ray.data.aggregate import Count

    ds = _read(sf_dir, "events", ["props"])

    def extract(df: pd.DataFrame) -> pd.DataFrame:
        k = df["props"].str.extract(r"(-?\d+)", expand=False)
        k = k[k.notna()]  # malformed/NULL props: drop, don't crash the task
        return pd.DataFrame({"k": k.astype("int64")})

    return ds.map_batches(extract, batch_format="pandas") \
        .groupby("k").aggregate(Count(alias_name="n"))


def event_dedup_windowed_ds(sf_dir: str, num_partitions: int = 32):
    """Windowed event deduplication — the stream-hygiene pass that drops
    retransmitted / double-fired events: within each (user, event_type,
    minute) window only the FIRST event (earliest ts, event_id tie-break)
    is kept. LEFT-complete verdicts — every event gets kept 0/1 — so the
    face doubles as a duplication-rate report.

    Scale plan: one coarse hash partition on the window key; the
    within-window first-row pick is a vectorized pandas sort +
    ``duplicated()`` inside the partition. Only the slim key/id columns
    shuffle, never props/value payloads.

    Returns (event_id, user_id, event_type, minute, kept).
    """
    from .agg import partitioned_group_apply

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])

    def keyed(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "event_id": batch["event_id"].astype("int64"),
            "user_id": batch["user_id"].astype("int64"),
            "event_type": batch["event_type"].astype(str),
            "minute": minute_of(batch["ts"]),
            "ts": batch["ts"],
        })

    keys = ["user_id", "event_type", "minute"]

    def verdicts(df: pd.DataFrame) -> pd.DataFrame:
        d = df.sort_values(["ts", "event_id"], kind="mergesort")
        kept = (~d.duplicated(keys)).astype("int64")
        out = d[["event_id", "user_id", "event_type", "minute"]].copy()
        out["kept"] = kept
        return out.reset_index(drop=True)

    return partitioned_group_apply(
        ds.map_batches(keyed, batch_format="pandas"),
        keys, verdicts, num_partitions)


def k_anonymity_report_ds(sf_dir: str, k: int = 5, num_partitions: int = 32):
    """k-anonymity release gate — before publishing telemetry aggregates,
    every (event_type, minute) cell must contain at least ``k`` DISTINCT
    users or it re-identifies its members (the standard k-anonymity test
    over the quasi-identifier pair). Cells below k are flagged for
    suppression, the complement of what a privacy-safe dashboard may ship.

    Scale plan: the exact per-cell distinct-user count via the two-level
    ``grouped_count_distinct`` plan (per-batch (cell, user) dedup shrinks
    the shuffle to the distinct pairs each block sees; one coarse
    partition finishes) — only distinct slim pairs move, never event
    payloads.

    Returns (event_type, minute, n_users, releasable).
    """
    from .agg import grouped_count_distinct

    ds = _read(sf_dir, "events", ["ts", "event_type", "user_id"])

    def keyed(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "event_type": batch["event_type"].astype(str),
            "minute": minute_of(batch["ts"]),
            "user_id": batch["user_id"].astype("int64"),
        })

    counts = grouped_count_distinct(
        ds.map_batches(keyed, batch_format="pandas"),
        ["event_type", "minute"], "user_id", "n_users", num_partitions)

    def gate(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.copy()
        out["releasable"] = (out["n_users"] >= k).astype("int64")
        return out

    return counts.map_batches(gate, batch_format="pandas")


def shard_skew_report_ds(sf_dir: str, shard_total: int = 32):
    """Partitioning-skew diagnostic: hash events by user onto
    ``shard_total`` shards (the md5 convention every sharded op here
    uses) and report each shard's load in per-mille of perfect balance
    (1000 = exactly total/shards) — the pre-flight check that decides
    whether a shuffle key needs salting. Per-batch partial counts, one
    card-sized shuffle, driver finish on ``shard_total`` rows. Returns
    (shard, n_rows, load_pm)."""
    from .agg import grouped_count

    ev = _read(sf_dir, "events", ["user_id"])

    def keyed(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "shard": md5_shard(batch["user_id"], shard_total)})

    counts = grouped_count(ev.map_batches(keyed, batch_format="pandas"),
                           ["shard"], "n_rows").to_pandas()
    if "shard" not in counts.columns:
        return pd.DataFrame({"shard": pd.Series([], dtype="int64"),
                             "n_rows": pd.Series([], dtype="int64"),
                             "load_pm": pd.Series([], dtype="int64")})
    total = int(counts["n_rows"].sum())
    counts["load_pm"] = (counts["n_rows"] * 1000 * shard_total
                         // max(total, 1)).astype("int64")
    return counts.sort_values("shard").reset_index(drop=True)


def event_rate_anomalies_ds(sf_dir: str, lookback: int = 5,
                            factor: int = 2, num_partitions: int = 32):
    """Robust rate-spike detection over the per-(type, minute) event
    series: a minute is anomalous when its count exceeds ``factor`` × the
    discrete median of the previous ``lookback`` PRESENT minutes (the
    median makes the baseline spike-resistant — one prior burst can't
    raise it, unlike a mean). All-integer; minutes with < ``lookback``
    history never fire (no baseline yet).

    Plan: the minute counts are the shared ``grouped_count`` pre-agg (the
    fact stream shrinks to the bucket series); ONE partition per
    event_type then runs the same vectorized shift-matrix order-statistic
    kernel as the rolling median (shifts 1..lookback, int64-max padding,
    one row sort + gather). Returns (event_type, minute, n_events, med5)
    for the anomalous minutes only — as a driver pandas frame (anomalies
    are rare by definition, and an all-empty Dataset would drop its
    schema: the repo-wide empty-block hazard)."""
    from .agg import grouped_count, partitioned_group_apply

    ev = _read(sf_dir, "events", ["ts", "event_type"])

    def keyed(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"event_type": batch["event_type"],
                             "minute": minute_of(batch["ts"])})

    counts = grouped_count(ev.map_batches(keyed, batch_format="pandas"),
                           ["event_type", "minute"], "n_events",
                           num_partitions)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        from .agg import trailing_shift_matrix
        d = df.sort_values(["event_type", "minute"], kind="mergesort")
        n = len(d)
        mat, hist = trailing_shift_matrix(d, ["event_type"], "n_events",
                                          lookback, start=1)
        mat.sort(axis=1)
        med = mat[np.arange(n), np.maximum(hist - 1, 0) // 2]
        # rows with hist == 0 gather the int64-max pad: zero them before
        # the multiply so factor * med can't wrap (they never fire anyway)
        med = np.where(hist >= lookback, med, 0)
        fire = (hist >= lookback) & \
            (d["n_events"].to_numpy() > factor * med)
        # typed empty keeps the Dataset schema when no minute fires
        out = pd.DataFrame({
            "event_type": pd.Series(d["event_type"].to_numpy()[fire],
                                    dtype=object),
            "minute": pd.Series(d["minute"].to_numpy()[fire],
                                dtype="int64"),
            "n_events": pd.Series(d["n_events"].to_numpy()[fire],
                                  dtype="int64"),
            "med5": pd.Series(med[fire], dtype="int64")})
        return out

    out = partitioned_group_apply(counts, ["event_type"], finish,
                                  num_partitions).to_pandas()
    if "event_type" not in out.columns:  # every partition was empty
        out = pd.DataFrame({"event_type": pd.Series([], dtype=object),
                            "minute": pd.Series([], dtype="int64"),
                            "n_events": pd.Series([], dtype="int64"),
                            "med5": pd.Series([], dtype="int64")})
    return out.sort_values(["event_type", "minute"]).reset_index(drop=True)


def event_rate_changepoints_ds(sf_dir: str, alarm_mult: int = 5,
                               num_partitions: int = 32):
    """CUSUM upward-shift changepoint detection per event-type rate series
    (Page 1954, zero-reference form) — the sustained-shift monitor beside
    ``event_rate_anomalies``'s single-minute spike detector: per type,
    deviations from the type's integer mean rate accumulate as
    s_t = max(0, s_{t-1} + (c_t − k)), and a minute ALARMS while
    s_t > alarm_mult·k (a persistent rate increase keeps the statistic
    climbing where one spike decays back). The reference value k is the
    CEILING mean ((total + m − 1) // m — CUSUM's standard allowance-above-
    target: a truncated mean under-estimates the rate, so every typical
    minute would contribute positive drift and the statistic would climb
    without any real shift; rounding the reference UP makes typical drift
    non-positive and the alarm specific to genuine sustained shifts).

    All-integer and closed-form: the max(0, ·) recurrence is
    s_t = cum_t − min(0, min_{j≤t} cum_j), turning the sequential scan
    into a vectorized cumsum + running-min (no per-row loop, no stateful
    scan operator — the same trick that makes it two SQL window calls).
    Missing minutes are not in the series (observed-minute CUSUM — both
    engine and oracle agree by construction).

    Plan: the shared minute-bucket ``grouped_count`` pre-agg shrinks the
    fact stream to the bucket series, then ONE coarse partition per
    event_type runs the closed form (the windowed-analytics convention —
    group count = |types|, documented tiny).
    Returns (event_type, minute, n_events, cusum, is_alarm)."""
    from .agg import grouped_count, partitioned_group_apply

    ev = _read(sf_dir, "events", ["ts", "event_type"])

    def keyed(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"event_type": batch["event_type"],
                             "minute": minute_of(batch["ts"])})

    counts = grouped_count(ev.map_batches(keyed, batch_format="pandas"),
                           ["event_type", "minute"], "n_events",
                           num_partitions)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for et, g in df.groupby("event_type"):
            g = g.sort_values("minute")
            cnt = g["n_events"].to_numpy(np.int64)
            k = (int(cnt.sum()) + len(cnt) - 1) // len(cnt)  # ceil mean
            cum = np.cumsum(cnt - k)
            cusum = cum - np.minimum(np.minimum.accumulate(cum), 0)
            frames.append(pd.DataFrame({
                "event_type": pd.Series([et] * len(g), dtype=object),
                "minute": g["minute"].to_numpy(np.int64),
                "n_events": cnt,
                "cusum": cusum.astype(np.int64),
                "is_alarm": (cusum > alarm_mult * k).astype(np.int64)}))
        if not frames:
            return pd.DataFrame({
                "event_type": pd.Series([], dtype=object),
                **{c: pd.Series([], dtype="int64")
                   for c in ("minute", "n_events", "cusum", "is_alarm")}})
        return pd.concat(frames, ignore_index=True)

    return partitioned_group_apply(counts, ["event_type"], finish,
                                   num_partitions)


def event_rate_autocorr_ds(sf_dir: str, num_partitions: int = 32):
    """Lag-1 autocorrelation of each type's per-minute event-rate series —
    the burstiness/seasonality detector (ρ₁ ≈ 0 is Poisson-like traffic,
    high ρ₁ means persistent bursts). Exact integer Pearson as a
    truncating per-mille ratio of algebraic sums over consecutive pairs:
    ρ₁ = (n·Σxy − Σx·Σy)·1000 // (n·Σx² − (Σx)²) with x = counts[:-1],
    y = counts[1:] (the regression-slope form; Python-int finish, so no
    scale overflows it; can be negative → truncating division).

    Plan: the shared minute pre-agg, then the series per type must be
    ordered — ONE partition per event_type (the minute series is
    card-sized at any corpus scale: minutes, not events). Returns
    (event_type, n_pairs, r1_pm)."""
    from .agg import grouped_count, partitioned_group_apply

    ev = _read(sf_dir, "events", ["ts", "event_type"])

    def keyed(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"event_type": batch["event_type"],
                             "minute": minute_of(batch["ts"])})

    counts = grouped_count(ev.map_batches(keyed, batch_format="pandas"),
                           ["event_type", "minute"], "n_events",
                           num_partitions)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        from .stats import _trunc_div
        rows = []
        for et, g in df.groupby("event_type", sort=False):
            c = g.sort_values("minute")["n_events"].to_numpy(np.int64)
            if len(c) < 2:
                continue
            x, y = c[:-1], c[1:]
            n = len(x)
            sx = sum(int(v) for v in x)
            sy = sum(int(v) for v in y)
            sxx = sum(int(v) * int(v) for v in x)
            sxy = sum(int(a) * int(b) for a, b in zip(x, y))
            den = n * sxx - sx * sx
            if den == 0:  # constant series — autocorr undefined → 0
                r1 = 0
            else:
                r1 = int(_trunc_div(
                    np.array([(n * sxy - sx * sy) * 1000], dtype=object),
                    np.array([den], dtype=object))[0])
            rows.append((et, n, r1))
        return pd.DataFrame(rows, columns=["event_type", "n_pairs",
                                           "r1_pm"]).astype(
            {"n_pairs": "int64", "r1_pm": "int64"})

    return partitioned_group_apply(counts, ["event_type"], finish,
                                   num_partitions)


def weekday_hour_heatmap_ds(sf_dir: str, num_partitions: int = 32):
    """The ops-dashboard staple: event counts per (day-of-week,
    hour-of-day) cell — epoch-day arithmetic (0 = Thursday, the
    ``pivot_event_dow`` convention) so both faces agree with no locale.
    One card-sized grouped count. Returns (dow, hour, n_events)."""
    from .agg import grouped_count

    ev = _read(sf_dir, "events", ["ts"])

    def keyed(batch: pd.DataFrame) -> pd.DataFrame:
        epoch_s = batch["ts"].astype("int64") // 1_000_000
        return pd.DataFrame({
            "dow": ((epoch_s // 86_400 + 4) % 7).astype("int64"),
            "hour": ((epoch_s % 86_400) // 3_600).astype("int64")})

    return grouped_count(ev.map_batches(keyed, batch_format="pandas"),
                         ["dow", "hour"], "n_events", num_partitions)
