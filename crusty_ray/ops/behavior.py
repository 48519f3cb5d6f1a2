"""User-behavior analytics over the event stream — cohort retention and
funnel completion, the two classic "sessionize-then-count" shapes a
training-data/product pipeline runs beside the windowed aggregates.

Both ops follow the repo's high-cardinality plan (ops/agg.py): local
per-batch shrink first, ONE coarse hash-partition shuffle on user_id,
vectorized pandas inside the partition, then a tiny global reduce. Nothing
is per-user-task and nothing reaches the driver at row scale.

Time conventions are integer µs / epoch-day arithmetic identical to the
DuckDB oracles (``epoch_us``, day = µs // 86.4e9, week = day // 7), so both
faces are bit-exact SQL-checked.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .agg import partitioned_group_apply
from .io import read_table

_US_PER_DAY = 86_400_000_000


def cohort_retention_ds(sf_dir: str):
    """Weekly cohort retention: users bucketed by the epoch-week of their
    FIRST event; for every (cohort_week, active week) pair, how many of the
    cohort's users were active. The output triangle is the standard
    retention matrix in long form: (cohort_week, week, n_users).

    Plan: per-batch (user_id, week) dedup shrinks the shuffle to distinct
    pairs per block; one partition on user_id computes each user's cohort
    (min week — complete per user by co-partition) and emits its distinct
    (cohort_week, week) rows; a grouped count finishes. Week pairs per user
    are bounded by the time range, so the second shuffle is tiny."""
    from .agg import grouped_count

    events = read_table(sf_dir, "events", ["user_id", "ts"])

    def user_weeks(df: pd.DataFrame) -> pd.DataFrame:
        week = (df["ts"].astype("int64") // _US_PER_DAY // 7).astype("int64")
        return pd.DataFrame({"user_id": df["user_id"].astype("int64"),
                             "week": week}).drop_duplicates()

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates()
        cohort = d.groupby("user_id")["week"].transform("min")
        out = pd.DataFrame({"cohort_week": cohort.astype("int64"),
                            "week": d["week"].astype("int64"),
                            "user_id": d["user_id"].astype("int64")})
        return out.drop_duplicates()

    pairs = partitioned_group_apply(
        events.map_batches(user_weeks, batch_format="pandas"),
        ["user_id"], per_user)
    return grouped_count(pairs, ["cohort_week", "week"], "n_users")


def funnel_counts(ds, steps: list[str], user_col: str = "user_id",
                  type_col: str = "event_type", ts_col: str = "ts",
                  num_partitions: int = 32):
    """Ordered funnel completion: for each prefix of ``steps``, how many
    users performed those event types in strict timestamp order (each step
    strictly after the previous step's EARLIEST qualifying occurrence — the
    standard greedy-funnel semantics, which maximizes completions for
    2-step-lookahead-free matching and is exactly SQL-expressible).

    Per user-partition the match is vectorized per STEP (k groupby-min
    passes over the partition, no per-user loop); partitions emit per-step
    partial counts and a tiny global sum finishes. Returns
    (step:int64 1-based, event_type, n_users)."""

    def shrink(df: pd.DataFrame) -> pd.DataFrame:
        # only rows of funnel types matter; µs ints shuffle, not timestamps
        out = pd.DataFrame({
            user_col: df[user_col].astype("int64"),
            type_col: df[type_col],
            "__us": df[ts_col].astype("int64"),
        })
        return out[out[type_col].isin(steps)]

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        counts = []
        thr = None  # per-user threshold: min ts of the previous step
        for et in steps:
            sub = df.loc[df[type_col] == et, [user_col, "__us"]]
            if thr is not None:
                sub = sub.merge(thr, on=user_col)
                sub = sub[sub["__us"] > sub["__thr"]]
            t = sub.groupby(user_col, as_index=False)["__us"].min() \
                   .rename(columns={"__us": "__thr"})
            counts.append(len(t))
            thr = t
        return pd.DataFrame({
            "step": pd.Series(range(1, len(steps) + 1), dtype="int64"),
            type_col: steps,
            "n_users": pd.Series(counts, dtype="int64")})

    parts = partitioned_group_apply(
        ds.map_batches(shrink, batch_format="pandas"),
        [user_col], per_part, num_partitions)

    def total(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(["step", type_col], as_index=False)["n_users"].sum()
        return out.astype({"step": "int64", "n_users": "int64"})

    # ≤ len(steps) rows per partition — the final reduce is trivially small
    return partitioned_group_apply(parts, ["step"], total, num_partitions)


def funnel_counts_ds(sf_dir: str,
                     steps: tuple = ("view", "click", "purchase")):
    """The view → click → purchase funnel over the events table — the
    SQL-checked face of ``funnel_counts``."""
    events = read_table(sf_dir, "events", ["user_id", "event_type", "ts"])
    return funnel_counts(events, list(steps))


def event_transition_matrix_ds(sf_dir: str, num_partitions: int = 32):
    """First-order Markov transition counts between consecutive event types
    — for every ordered pair (from_type, to_type), how many times a user's
    event of ``from_type`` was immediately followed by one of ``to_type``.
    The maximum-likelihood transition-matrix estimate behind session-model
    features and next-event prediction baselines; the row-normalized version
    is P(next | current).

    Plan: one partition on ``user_id`` co-locates each user's history (the
    per-user ordering cannot be pre-aggregated); inside the partition a
    single vectorized sort by (user, ts, event_id) + groupby-shift pairs
    each event with its successor, and the partition emits O(types²)
    partial cell counts. The driver sums a card-sized matrix. Ordering ties
    on ts are broken by event_id — a total, engine-independent order the
    DuckDB lead() oracle reproduces.
    """
    events = read_table(sf_dir, "events",
                        ["event_id", "user_id", "ts", "event_type"])

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        d = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        nxt = d.groupby("user_id", sort=False)["event_type"].shift(-1)
        keep = nxt.notna().to_numpy()
        cells = pd.DataFrame({
            "from_type": d["event_type"].to_numpy()[keep],
            "to_type": nxt.to_numpy()[keep]})
        out = cells.groupby(["from_type", "to_type"], as_index=False) \
            .size().rename(columns={"size": "n_transitions"})
        return out.astype({"n_transitions": "int64"})

    parts = partitioned_group_apply(events, ["user_id"], per_part,
                                    num_partitions).to_pandas()
    if parts.empty:  # Ray drops the schema when every partition is empty
        parts = pd.DataFrame({
            "from_type": pd.Series([], dtype="object"),
            "to_type": pd.Series([], dtype="object"),
            "n_transitions": pd.Series([], dtype="int64")})
    out = parts.groupby(["from_type", "to_type"], as_index=False) \
        ["n_transitions"].sum()
    out["n_transitions"] = out["n_transitions"].astype("int64")
    return out.sort_values(["from_type", "to_type"]).reset_index(drop=True)


# ------------------------------------------------ freshness-decayed activity
def decayed_user_activity_ds(sf_dir: str, n: int = 50,
                             num_partitions: int = 32):
    """Freshness-decayed per-user activity leaderboard — the training-data
    analog of the crawler's time-decayed top-k domains (reference:
    redis-calc applies a decay factor per TOPK tick, lib.rs:21-31 /
    topk.rs): every event contributes ``2^20 >> min(age_hours, 20)`` where
    age is measured back from the corpus's LAST event, so a user's score
    halves per hour of staleness — in EXACT integer arithmetic (a right
    shift, not a float pow), so the DuckDB face hashes bit-exact.

    Plan: one O(1)-driver global max-minute scan (2-column pruned read),
    then contributions are per-row map-only, per-batch partial sums shrink
    the shuffle to distinct users per block, one coarse partition finishes,
    and the top-n is the ``grouped_top_n`` constant-group local-prune plan
    (O(blocks·n) shuffle rows). Returns (rnk, user_id, decay_score)."""
    from .agg import grouped_top_n, partitioned_group_apply

    def minutes(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "user_id": df["user_id"].astype("int64"),
            "minute": (df["ts"].astype("int64") // 60_000_000)
            .astype("int64")})

    # materialize: the projected (user_id, minute) blocks feed BOTH the
    # max-minute scan and the contribution pass — left lazy, the fact read
    # + map would execute twice end-to-end
    ev = read_table(sf_dir, "events", ["user_id", "ts"]) \
        .map_batches(minutes, batch_format="pandas").materialize()
    max_minute = int(ev.max("minute"))  # O(1) driver scalar

    def contrib(df: pd.DataFrame) -> pd.DataFrame:
        age_h = (max_minute - df["minute"].to_numpy(dtype=np.int64)) // 60
        w = (1 << 20) >> np.minimum(age_h, 20)
        part = pd.DataFrame({"user_id": df["user_id"], "decay_score": w})
        return part.groupby("user_id", as_index=False)["decay_score"] \
            .sum().astype("int64")

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("user_id", as_index=False)["decay_score"].sum() \
            .astype("int64")
        out["__g"] = np.int64(0)
        return out

    scores = partitioned_group_apply(
        ev.map_batches(contrib, batch_format="pandas"),
        ["user_id"], finish, num_partitions)
    top = grouped_top_n(scores, ["__g"], "decay_score", n, ascending=False,
                        tie_cols=["user_id"], rank_col="rnk",
                        num_partitions=num_partitions)

    def tidy(df: pd.DataFrame) -> pd.DataFrame:
        return df[["rnk", "user_id", "decay_score"]].astype("int64")

    return top.map_batches(tidy, batch_format="pandas")


# ------------------------------------------------------ touch attribution
def touch_attribution(ds, user_col: str, order_cols: list[str],
                      id_col: str, type_col: str, touch_type: str,
                      credit_type: str, num_partitions: int = 32):
    """First/last-touch marketing attribution: for every ``credit_type``
    event (e.g. purchase), find the SAME user's first and most recent
    preceding ``touch_type`` event (e.g. click) in (ts, id) order — the
    two classic single-touch credit models, -1 when the user never
    touched before converting. Returns (id, user, first_touch_event_id,
    last_touch_event_id).

    One coarse user partition; inside, BOTH models are vectorized over
    every user at once — last-touch is a forward-fill of touch ids, and
    first-touch forward-fills only each user's FIRST touch (cumsum mask),
    so no per-user loop, no window join."""
    from .agg import partitioned_group_apply

    def attribute(df: pd.DataFrame) -> pd.DataFrame:
        g = df.sort_values([user_col] + order_cols,
                           kind="mergesort").reset_index(drop=True)
        is_touch = (g[type_col] == touch_type).to_numpy()
        ids = g[id_col].to_numpy(dtype=np.int64)
        grp = g[user_col]
        touch_id = pd.Series(np.where(is_touch, ids.astype("float64"),
                                      np.nan))
        # STRICTLY-before semantics: forward-fill the touch ids, then
        # shift one row within the user — row i sees the fill state as of
        # row i-1, so a credit event that is itself a touch (generic
        # touch_type == credit_type calls) never attributes to itself
        last = touch_id.groupby(grp, sort=False).ffill() \
            .groupby(grp, sort=False).shift(1)
        # first touch per user: keep only the FIRST touch row's id, then
        # forward-fill it over the rest of the user's history
        nth_touch = pd.Series(is_touch.astype(np.int64)) \
            .groupby(grp, sort=False).cumsum().to_numpy()
        first_only = pd.Series(np.where(is_touch & (nth_touch == 1),
                                        ids.astype("float64"), np.nan))
        first = first_only.groupby(grp, sort=False).ffill() \
            .groupby(grp, sort=False).shift(1)
        keep = (g[type_col] == credit_type).to_numpy()
        return pd.DataFrame({
            id_col: ids[keep],
            user_col: g[user_col].to_numpy(dtype=np.int64)[keep],
            "first_touch_event_id": np.nan_to_num(
                first.to_numpy()[keep], nan=-1.0).astype(np.int64),
            "last_touch_event_id": np.nan_to_num(
                last.to_numpy()[keep], nan=-1.0).astype(np.int64)})

    return partitioned_group_apply(ds, [user_col], attribute,
                                   num_partitions)


def purchase_attribution_ds(sf_dir: str, num_partitions: int = 32):
    """Contract face: every purchase event attributed to the user's first
    and most recent preceding click (strictly-before in (ts, event_id)
    order — a purchase row is never its own touch since its type differs),
    -1 for never-clicked converters."""
    ev = read_table(sf_dir, "events", ["event_id", "user_id", "ts",
                                       "event_type"])
    return touch_attribution(ev, "user_id", ["ts", "event_id"],
                             "event_id", "event_type",
                             touch_type="click", credit_type="purchase",
                             num_partitions=num_partitions)


def event_trigrams_ds(sf_dir: str, num_partitions: int = 32):
    """Sequential-pattern mining one order up from the transition matrix:
    counts of every CONSECUTIVE event-type triple inside a user's history
    (the 3-gram session motifs behind funnel discovery). Same total event
    order as `event_transition_matrix_ds` (ts, event_id tie-break) so the
    two faces can never disagree on adjacency.

    Plan: one partition on user_id, a vectorized double groupby-shift
    pairs each event with its two successors, O(types³) partial cells per
    partition, card-sized driver sum. Returns (t1, t2, t3, n)."""
    events = read_table(sf_dir, "events",
                        ["event_id", "user_id", "ts", "event_type"])

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        d = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        g = d.groupby("user_id", sort=False)["event_type"]
        n1 = g.shift(-1)
        n2 = g.shift(-2)
        keep = n2.notna().to_numpy()
        cells = pd.DataFrame({"t1": d["event_type"].to_numpy()[keep],
                              "t2": n1.to_numpy()[keep],
                              "t3": n2.to_numpy()[keep]})
        out = cells.groupby(["t1", "t2", "t3"], as_index=False).size() \
            .rename(columns={"size": "n"})
        return out.astype({"n": "int64"})

    parts = partitioned_group_apply(events, ["user_id"], per_part,
                                    num_partitions).to_pandas()
    if parts.empty:  # Ray drops the schema when every partition is empty
        parts = pd.DataFrame({"t1": pd.Series([], dtype="object"),
                              "t2": pd.Series([], dtype="object"),
                              "t3": pd.Series([], dtype="object"),
                              "n": pd.Series([], dtype="int64")})
    out = parts.groupby(["t1", "t2", "t3"], as_index=False)["n"].sum()
    out["n"] = out["n"].astype("int64")
    return out.sort_values(["t1", "t2", "t3"]).reset_index(drop=True)


def cohort_value_ds(sf_dir: str, num_partitions: int = 32):
    """Cohort LTV matrix — retention's revenue twin: customers bucketed by
    the epoch-week of their FIRST order; for every (cohort_week, active
    week) cell, how many of the cohort's customers ordered and their total
    cents. The long-form lifetime-value triangle behind payback analyses.

    Plan mirrors `cohort_retention_ds`: per-batch partial sums to
    (custkey, week, cents) rows, ONE custkey partition computes each
    customer's cohort (min week is complete per customer by co-partition)
    and re-sums per (customer, week), then one card-sized (cohort, week)
    partition counts customers and sums cents. Returns (cohort_week,
    week, n_customers, total_cents)."""
    from .agg import partitioned_group_apply

    orders = read_table(sf_dir, "orders",
                        ["o_custkey", "o_orderdate", "o_totalprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        week = (df["o_orderdate"].astype("int64") // _US_PER_DAY // 7)
        cents = np.floor(df["o_totalprice"].to_numpy(np.float64)
                         * 100.0 + 0.5).astype(np.int64)
        t = pd.DataFrame({"o_custkey": df["o_custkey"].astype("int64"),
                          "week": week.astype("int64"), "cents": cents})
        return t.groupby(["o_custkey", "week"], as_index=False)["cents"] \
            .sum().astype({"cents": "int64"})

    def per_cust(df: pd.DataFrame) -> pd.DataFrame:
        d = df.groupby(["o_custkey", "week"], as_index=False)["cents"].sum()
        cohort = d.groupby("o_custkey")["week"].transform("min")
        return pd.DataFrame({"cohort_week": cohort.astype("int64"),
                             "week": d["week"].astype("int64"),
                             "cents": d["cents"].astype("int64")})

    def per_cell(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(["cohort_week", "week"], as_index=False).agg(
            n_customers=("cents", "size"), total_cents=("cents", "sum"))
        return out.astype({"n_customers": "int64", "total_cents": "int64"})

    pairs = partitioned_group_apply(
        orders.map_batches(partial, batch_format="pandas"),
        ["o_custkey"], per_cust, num_partitions)
    return partitioned_group_apply(pairs, ["cohort_week", "week"],
                                   per_cell, num_partitions)


def order_gap_medians_ds(sf_dir: str, num_partitions: int = 32):
    """Per-customer inter-order cadence: the discrete median and max of
    the day gaps between consecutive orders (ordered by the
    (orderdate, orderkey) total order, so tied dates gap
    deterministically) — the repurchase-cycle feature behind churn
    models. Customers with a single order emit nothing (no gap exists).

    Plan: the window-op contract — ONE custkey partition, vectorized
    groupby-shift for the gaps, then a per-customer sort + middle gather
    for the discrete median (same lower-middle convention as
    ``quantile_disc(0.5)``). Returns (o_custkey, n_orders, med_gap_days,
    max_gap_days)."""
    from .agg import partitioned_group_apply

    orders = read_table(sf_dir, "orders",
                        ["o_custkey", "o_orderkey", "o_orderdate"])

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "o_custkey": df["o_custkey"].astype("int64"),
            "o_orderkey": df["o_orderkey"].astype("int64"),
            "day": (df["o_orderdate"].astype("int64")
                    // _US_PER_DAY).astype("int64")})

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        # reset: .loc[gap.index] below needs unique labels (a concatenated
        # partition frame may carry duplicates)
        d = df.sort_values(["o_custkey", "day", "o_orderkey"],
                           kind="mergesort").reset_index(drop=True)
        g = d.groupby("o_custkey", sort=False)
        gap = (d["day"] - g["day"].shift(1)).dropna()
        gaps = pd.DataFrame({
            "o_custkey": d.loc[gap.index, "o_custkey"].to_numpy(),
            "gap": gap.to_numpy(dtype=np.int64)})
        gaps = gaps.sort_values(["o_custkey", "gap"], kind="mergesort")
        gg = gaps.groupby("o_custkey", sort=False)
        cnt = gg["gap"].transform("size").to_numpy()
        pos = gg.cumcount().to_numpy()
        take = pos == (cnt - 1) // 2  # lower-middle of the sorted gaps
        med = gaps[take]
        mx = gg["gap"].max()
        out = pd.DataFrame({
            "o_custkey": med["o_custkey"].to_numpy(),
            "n_orders": (cnt[take] + 1).astype(np.int64),
            "med_gap_days": med["gap"].to_numpy(),
            "max_gap_days": mx.loc[med["o_custkey"]].to_numpy(
                dtype=np.int64)})
        return out

    prepped = orders.map_batches(prep, batch_format="pandas")
    return partitioned_group_apply(prepped, ["o_custkey"], finish,
                                   num_partitions)


def user_inactivity_report_ds(sf_dir: str, idle_hours: int = 72,
                              num_partitions: int = 32):
    """Churn flags: each user's last activity vs the corpus's newest
    event — idle_hours of silence marks the user churned (the retention
    dashboard's complement: who LEFT). All-integer hour math.

    Plan: per-user last minute is an associative grouped MAX (per-batch
    partials, one coarse shuffle); the global max minute derives from the
    card-sized per-user result, no second fact scan. Returns (user_id,
    last_minute, idle_hours, churned)."""
    from .agg import partitioned_group_apply

    ev = read_table(sf_dir, "events", ["user_id", "ts"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        from .analog import minute_of
        t = pd.DataFrame({
            "user_id": b["user_id"].astype("int64"),
            "last_minute": minute_of(b["ts"])})
        return t.groupby("user_id", as_index=False)["last_minute"].max() \
            .astype({"last_minute": "int64"})

    def per_key(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("user_id", as_index=False)["last_minute"].max() \
            .astype({"last_minute": "int64"})

    per_user = partitioned_group_apply(
        ev.map_batches(partial, batch_format="pandas"),
        ["user_id"], per_key, num_partitions).to_pandas()
    if "user_id" not in per_user.columns:
        return pd.DataFrame({"user_id": pd.Series([], dtype="int64"),
                             "last_minute": pd.Series([], dtype="int64"),
                             "idle_hours": pd.Series([], dtype="int64"),
                             "churned": pd.Series([], dtype="int64")})
    mx = int(per_user["last_minute"].max())
    per_user["idle_hours"] = ((mx - per_user["last_minute"]) // 60) \
        .astype("int64")
    per_user["churned"] = (per_user["idle_hours"] >= idle_hours) \
        .astype("int64")
    return per_user.sort_values("user_id").reset_index(drop=True)


def event_type_user_jaccard_ds(sf_dir: str, num_partitions: int = 32):
    """Audience-overlap matrix: exact Jaccard of the DISTINCT-user sets of
    every event-type pair — the segmentation diagnostic behind funnel
    design (near-1 pairs are the same audience twice; near-0 pairs are
    disjoint populations worth separate treatments).

    Plan (the set-similarity shuffle discipline at user grain): distinct
    (user, type) rows pre-dedup in-batch; ONE user-keyed partition emits
    each user's type-pair memberships (types-per-user is ≤ the type
    cardinality — card-sized); a pair-keyed count + the card-sized
    per-type distinct totals finish ``|∩|`` and ``|A|+|B|−|∩|``. Integer
    per-mille output (floor — the repo threshold convention).

    Returns (type_a, type_b, inter, uni, jaccard_pm) for type_a < type_b
    — bit-exact vs ``oracle_sql()['event_type_user_jaccard']``."""
    from .io import read_table
    from .agg import grouped_count, partitioned_group_apply

    ev = read_table(sf_dir, "events", ["user_id", "event_type"])

    def slim(df: pd.DataFrame) -> pd.DataFrame:
        return df[["user_id", "event_type"]].drop_duplicates()

    ut = ev.map_batches(slim, batch_format="pandas")

    # card-sized per-type distinct-user totals (one tiny aggregate over
    # the shared global-DISTINCT helper — local per-batch dedup shrinks
    # the shuffle to each block's distinct rows)
    from .graph import distinct_rows
    sizes = grouped_count(
        distinct_rows(ut, ["user_id", "event_type"], num_partitions),
        ["event_type"], "n_users", num_partitions).to_pandas()
    size_map = dict(zip(sizes["event_type"], sizes["n_users"].astype(int)))

    def user_pairs(df: pd.DataFrame) -> pd.DataFrame:
        outs_a, outs_b = [], []
        for _, grp in df.groupby("user_id", sort=False):
            ts = np.sort(grp["event_type"].unique())
            if len(ts) < 2:
                continue
            n = len(ts)
            ia, ib = np.triu_indices(n, k=1)
            outs_a.append(ts[ia])
            outs_b.append(ts[ib])
        if not outs_a:
            return pd.DataFrame({"type_a": pd.Series([], dtype=object),
                                 "type_b": pd.Series([], dtype=object)})
        return pd.DataFrame({"type_a": np.concatenate(outs_a),
                             "type_b": np.concatenate(outs_b)})

    pairs = partitioned_group_apply(ut, ["user_id"], user_pairs,
                                    num_partitions)
    inter = grouped_count(pairs, ["type_a", "type_b"], "inter",
                          num_partitions)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        na = df["type_a"].map(size_map).astype("int64")
        nb = df["type_b"].map(size_map).astype("int64")
        uni = na + nb - df["inter"].astype("int64")
        return pd.DataFrame({
            "type_a": df["type_a"], "type_b": df["type_b"],
            "inter": df["inter"].astype("int64"), "uni": uni,
            "jaccard_pm": (1000 * df["inter"].astype("int64")) // uni})

    return inter.map_batches(finish, batch_format="pandas")
