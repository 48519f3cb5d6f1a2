"""Session-s ops: snapshot diff, quality-rule report, grouped weighted
sample, percent-rank ECDF, tie-safe Spearman, sliding distinct users,
rolling discrete median, event trigrams, grouped split. The SQL faces are
covered by test_driver_contract; these pin the mechanics the SQL compare
can't see (I/U/D classification against a hand-built fixture, the
chunked Σd² accumulator, short-window median prefixes, tie determinism,
group co-assignment, adjacency identities).
"""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


# -------------------------------------------------------- snapshot diff

def test_snapshot_diff_classifies_iud(ray_session):
    """Hand-built two-snapshot fixture: the generic primitive must emit
    exactly the inserted/deleted/changed keys and drop unchanged ones."""
    import ray

    from crusty_ray.ops.analytic import snapshot_diff

    old = {1: 10, 2: 20, 3: 30, 4: 40}
    new = {2: 20, 3: 31, 4: 40, 5: 50}  # 1 deleted, 3 changed, 5 inserted
    rows = [{"k": k, "__side": 0, "v": v} for k, v in old.items()] + \
           [{"k": k, "__side": 1, "v": v} for k, v in new.items()]
    ds = ray.data.from_pandas(pd.DataFrame(rows))
    got = snapshot_diff(ds, "k", "v", num_partitions=4).to_pandas() \
        .sort_values("k").reset_index(drop=True)
    assert got["k"].tolist() == [1, 3, 5]
    assert got["change"].tolist() == ["D", "U", "I"]
    assert got["old_v"].tolist() == [10, 30, -1]
    assert got["new_v"].tolist() == [-1, 31, 50]


def test_snapshot_diff_orders_key_arithmetic(ray_session):
    """The contract face's I/U/D cardinalities are pure key arithmetic:
    U = keys %7 with a nonzero delta and not deleted, D = keys %13,
    I = keys %11."""
    from crusty_ray.ops.analytic import snapshot_diff_orders_ds
    got = snapshot_diff_orders_ds(SF).to_pandas()
    k = pd.read_parquet(f"{SF}/orders.parquet",
                        columns=["o_orderkey"])["o_orderkey"].to_numpy()
    assert (got["change"] == "U").sum() == int(
        ((k % 7 == 0) & (k % 13 != 0) & (k % 1000 != 0)).sum())
    assert (got["change"] == "D").sum() == int((k % 13 == 0).sum())
    assert (got["change"] == "I").sum() == int((k % 11 == 0).sum())
    # sentinels only on the missing side
    assert (got.loc[got["change"] == "U", "old_cents"] >= 0).all()
    assert (got.loc[got["change"] == "I", "old_cents"] == -1).all()
    assert (got.loc[got["change"] == "D", "new_cents"] == -1).all()


# -------------------------------------------------- quality rule report

def test_quality_rules_match_pandas(ray_session):
    from crusty_ray.ops.stats import quality_rules_ds
    got = quality_rules_ds(SF).set_index("rule_name")
    o = pd.read_parquet(f"{SF}/orders.parquet")
    n = len(o)
    assert (got["n_checked"] == n).all()
    assert got.loc["orderkey_unique", "n_violations"] == \
        n - o["o_orderkey"].nunique()
    assert got.loc["custkey_not_null", "n_violations"] == \
        int(o["o_custkey"].isna().sum())
    cents = np.floor(o["o_totalprice"].to_numpy() * 100 + 0.5).astype(
        np.int64)
    assert got.loc["price_cents_le_40m", "n_violations"] == \
        int((cents > 40_000_000).sum())
    exp_pm = (n - got["n_violations"]) * 1000 // n
    assert (got["pass_per_mille"] == exp_pm).all()


# ------------------------------------------------------------- sampling

def test_grouped_weighted_sample_is_per_group_bottom_n(ray_session):
    """Each language's sample must be the exact bottom-n of ITS priority
    ordering — verified against a driver recompute of the same hash."""
    import hashlib

    from crusty_ray.ops.sample import grouped_weighted_doc_sample_ds
    got = grouped_weighted_doc_sample_ds(SF, n=5).to_pandas()
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "lang", "n_chars"])
    u = docs["doc_id"].map(lambda i: int(
        hashlib.md5(f"gws:{i}".encode()).hexdigest()[:12], 16))
    docs["priority"] = u // docs["n_chars"].clip(lower=1)
    for lang, g in docs.groupby("lang"):
        exp = g.sort_values(["priority", "doc_id"]).head(5)
        sub = got[got["lang"] == lang].sort_values("rnk")
        assert sub["doc_id"].tolist() == exp["doc_id"].tolist()
        assert sub["rnk"].tolist() == list(range(1, len(exp) + 1))


def test_grouped_split_co_assigns_sources(ray_session):
    from crusty_ray.ops.sample import grouped_split_assignment_ds
    got = grouped_split_assignment_ds(SF).to_pandas()
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"])
    assert len(got) == len(docs)
    # every source maps to exactly one split — the leakage-safety contract
    assert (got.groupby("source")["split"].nunique() == 1).all()


# ----------------------------------------------------- rank-based stats

def test_spearman_chunked_sum_equals_dot():
    """The >1.5M-row chunked Σd² accumulator must equal the plain dot on
    a case that exercises multiple chunks (forced small threshold)."""
    rng = np.random.RandomState(7)
    d = rng.randint(-1000, 1000, size=10_000).astype(np.int64)
    n = len(d)
    c = 97  # force many chunks
    chunked = sum(int(np.dot(d[i:i + c], d[i:i + c]))
                  for i in range(0, n, c))
    assert chunked == int(np.dot(d, d))


def test_spearman_perfect_and_reversed(ray_session):
    """rho_pm is 1000 on a perfectly monotone pair and -1000 reversed —
    via the same kernel the face uses (ties absent → avg rank = rank)."""
    import ray

    from crusty_ray.ops import stats as st

    n = 101
    q = np.arange(n, dtype=np.float64) / 100.0
    base = pd.DataFrame({"l_returnflag": "X", "l_quantity": q,
                         "l_extendedprice": q * 3.0})
    rev = pd.DataFrame({"l_returnflag": "Y", "l_quantity": q,
                        "l_extendedprice": q[::-1] * 3.0})
    import pyarrow.parquet as pq
    import tempfile, os
    with tempfile.TemporaryDirectory() as td:
        df = pd.concat([base, rev], ignore_index=True)
        df["l_orderkey"] = np.arange(len(df), dtype=np.int64)
        df["l_linenumber"] = np.int64(1)
        import pyarrow as pa
        pq.write_table(pa.Table.from_pandas(df),
                       os.path.join(td, "lineitem.parquet"))
        got = st.spearman_qty_price_ds(td).to_pandas() \
            .set_index("l_returnflag")
    assert got.loc["X", "rho_pm"] == 1000 and got.loc["X", "sum_d2"] == 0
    assert got.loc["Y", "rho_pm"] == -1000


# ------------------------------------------------------- rolling median

def test_rolling_median_short_prefix_and_window(ray_session):
    """The first event's median is itself; every window median is a value
    actually present in that trailing window (discrete-median contract) —
    verified against a pandas recompute."""
    from crusty_ray.ops.analytic import rolling_median_user_value_ds
    got = rolling_median_user_value_ds(SF).to_pandas()
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_id", "user_id", "ts", "value"])
    ev["cents"] = np.floor(ev["value"].to_numpy() * 100 + 0.5).astype(
        np.int64)
    ev = ev.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    exp = []
    for _, g in ev.groupby("user_id", sort=False):
        c = g["cents"].tolist()
        for i in range(len(c)):
            w = sorted(c[max(0, i - 4):i + 1])
            exp.append((int(g["event_id"].iloc[i]),
                        w[(len(w) - 1) // 2]))
    exp = pd.DataFrame(exp, columns=["event_id", "exp_med"])
    m = got.merge(exp, on="event_id")
    assert len(m) == len(got)
    assert (m["roll_med_cents"] == m["exp_med"]).all()


# ------------------------------------------------------- event trigrams

def test_event_trigrams_total_identity(ray_session):
    """Σn must equal Σ_user max(0, cnt−2) — every adjacency counted once,
    none across users; and the trigram heads must re-aggregate to the
    bigram transition matrix restricted to non-tail positions."""
    from crusty_ray.ops.behavior import event_trigrams_ds
    got = event_trigrams_ds(SF)  # returns pandas (card-sized driver sum)
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["user_id"])
    cnt = ev.groupby("user_id").size()
    assert int(got["n"].sum()) == int((cnt - 2).clip(lower=0).sum())


# ------------------------------------------------ sliding distinct users

def test_sliding_distinct_users_superset_of_tumbling(ray_session):
    """A 3-hour trailing window's distinct count is ≥ the tumbling hour's
    and ≤ the global distinct; window hours ≡ the data's hour set."""
    from crusty_ray.ops.windows import sliding_distinct_users_ds
    got = sliding_distinct_users_ds(SF).to_pandas()
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["ts", "user_id"])
    h = (ev["ts"].astype("int64") // 1_000_000 // 3600)
    per_hour = ev.assign(h=h).groupby("h")["user_id"].nunique()
    assert set(got["window_hour"]) == set(per_hour.index)
    m = got.set_index("window_hour")["n_users"]
    assert (m.loc[per_hour.index] >= per_hour).all()
    assert (m <= ev["user_id"].nunique()).all()


# --------------------------------------------------------- percent rank

def test_percent_rank_bounds_and_monotone(ray_session):
    """pct_pm is 0 for each priority's cheapest order, 1000 for the most
    expensive, and non-decreasing in (cents, key) order."""
    from crusty_ray.ops.analytic import price_percent_rank_ds
    got = price_percent_rank_ds(SF).to_pandas()
    for _, g in got.groupby("o_orderpriority"):
        g = g.sort_values(["cents", "o_orderkey"])
        assert g["pct_pm"].iloc[0] == 0
        assert g["pct_pm"].iloc[-1] == 1000
        assert g["pct_pm"].is_monotonic_increasing


# ------------------------------------------------------- golden records

def test_golden_records_consistent_with_clusters(ray_session):
    """One golden row per entity; canonical_doc is the entity id itself
    (min member), n_members matches the cluster size, and the modal lang
    is a lang actually present among members."""
    from crusty_ray.ops.linkage import entity_clusters_ds, golden_records_ds
    ent = entity_clusters_ds(SF).to_pandas()
    gold = golden_records_ds(SF).to_pandas()
    assert len(gold) == ent["entity_id"].nunique()
    assert (gold["canonical_doc"] == gold["entity_id"]).all()
    sizes = ent.groupby("entity_id").size()
    m = gold.set_index("entity_id")
    assert (m["n_members"] == sizes.loc[m.index]).all()
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "lang"])
    member_langs = ent.merge(docs, on="doc_id") \
        .groupby("entity_id")["lang"].agg(set)
    assert all(m.loc[e, "canonical_lang"] in langs
               for e, langs in member_langs.items())


# ----------------------------------------------------- quota allocation

def test_quota_allocation_exact_budget_and_monotone(ray_session):
    """Σquota ≡ k exactly for several budgets (incl. ones that force
    remainder bumps), and a strictly larger char share never gets a
    smaller quota (Hamilton monotonicity within one allocation)."""
    from crusty_ray.ops.sample import source_quota_allocation_ds
    for k in (100_000, 99_991, 7):
        got = source_quota_allocation_ds(SF, k=k)
        assert int(got["quota"].sum()) == k
        g = got.sort_values("chars").reset_index(drop=True)
        strict = g["chars"].diff().fillna(0) > 0
        assert (g["quota"].diff().fillna(0)[strict] >= 0).all()


# ----------------------------------------------------- shard skew report

def test_shard_skew_total_and_balance(ray_session):
    from crusty_ray.ops.analog import shard_skew_report_ds
    got = shard_skew_report_ds(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["user_id"])
    assert int(got["n_rows"].sum()) == len(ev)
    # the per-mille identity holds row-by-row (empty shards are absent by
    # construction — both faces GROUP BY present shards only, so at tiny
    # SF every present shard can sit above 1000)
    exp = got["n_rows"] * 1000 * 32 // len(ev)
    assert (got["load_pm"] == exp).all()


# ---------------------------------------------------- join size estimate

def test_join_size_estimate_equals_real_join(ray_session):
    """Σ a_k·b_k must equal the true inner-join row count (computed by
    pandas merge on the driver at this SF)."""
    from crusty_ray.ops.stats import orders_lineitem_join_size_ds
    got = orders_lineitem_join_size_ds(SF)
    o = pd.read_parquet(f"{SF}/orders.parquet", columns=["o_orderkey"])
    li = pd.read_parquet(f"{SF}/lineitem.parquet", columns=["l_orderkey"])
    true_rows = len(o.merge(li, left_on="o_orderkey",
                            right_on="l_orderkey"))
    assert int(got["est_rows"].iloc[0]) == true_rows
    both = set(o["o_orderkey"]) & set(li["l_orderkey"])
    assert int(got["n_matched_keys"].iloc[0]) == len(both)


# --------------------------------------------------- event rate anomaly

def test_event_rate_anomalies_fire_rule(ray_session):
    """Every reported minute must satisfy the 2x-median rule against a
    pandas recompute, and the empty case keeps the schema."""
    from crusty_ray.ops.analog import event_rate_anomalies_ds, minute_of
    got = event_rate_anomalies_ds(SF)  # pandas (rare-rows driver frame)
    assert set(got.columns) >= {"event_type", "minute", "n_events", "med5"}
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["ts", "event_type"])
    ev["minute"] = minute_of(ev["ts"])
    c = ev.groupby(["event_type", "minute"], as_index=False).size() \
        .rename(columns={"size": "n"}).sort_values(["event_type", "minute"])
    exp = []
    for t, g in c.groupby("event_type"):
        n = g["n"].tolist()
        for i in range(5, len(n)):
            med = sorted(n[i - 5:i])[2]
            if n[i] > 2 * med:
                exp.append((t, int(g["minute"].iloc[i]), n[i], med))
    exp_df = pd.DataFrame(exp, columns=["event_type", "minute",
                                        "n_events", "med5"])
    got_s = got.sort_values(["event_type", "minute"]).reset_index(drop=True)
    exp_s = exp_df.sort_values(["event_type", "minute"]) \
        .reset_index(drop=True)
    assert len(got_s) == len(exp_s)
    if len(exp_s):
        assert (got_s[["event_type", "minute"]].values
                == exp_s[["event_type", "minute"]].values).all()


# ------------------------------------------------------- property tests

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(old=st.dictionaries(st.integers(0, 50), st.integers(0, 5),
                           max_size=30),
       new=st.dictionaries(st.integers(0, 50), st.integers(0, 5),
                           max_size=30))
def test_snapshot_diff_property(ray_session, old, new):
    """snapshot_diff ≡ the dict diff on arbitrary snapshots."""
    import ray

    from crusty_ray.ops.analytic import snapshot_diff

    rows = [{"k": k, "__side": 0, "v": v} for k, v in old.items()] + \
           [{"k": k, "__side": 1, "v": v} for k, v in new.items()]
    if not rows:
        return
    ds = ray.data.from_pandas(pd.DataFrame(rows))
    got = snapshot_diff(ds, "k", "v", num_partitions=4).to_pandas()
    exp = {}
    for k in set(old) | set(new):
        if k not in new:
            exp[k] = ("D", old[k], -1)
        elif k not in old:
            exp[k] = ("I", -1, new[k])
        elif old[k] != new[k]:
            exp[k] = ("U", old[k], new[k])
    assert len(got) == len(exp)
    for _, r in got.iterrows():
        assert exp[r["k"]] == (r["change"], r["old_v"], r["new_v"])


@settings(max_examples=30, deadline=None)
@given(n=st.integers(1, 200), k=st.integers(1, 12))
def test_sql_ntile_buckets_property(n, k):
    """The shared ntile kernel ≡ DuckDB's NTILE for arbitrary (n, k)."""
    import duckdb

    from crusty_ray.ops.analytic import sql_ntile_buckets

    got = sql_ntile_buckets(np.arange(n, dtype=np.int64),
                            np.full(n, n, dtype=np.int64), k)
    exp = duckdb.sql(
        f"SELECT ntile({k}) OVER (ORDER BY r) AS b "
        f"FROM range({n}) t(r) ORDER BY r").df()["b"].to_numpy()
    assert (got == exp).all()


@settings(max_examples=20, deadline=None)
@given(vals=st.lists(st.lists(st.integers(0, 100), min_size=1,
                              max_size=12), min_size=1, max_size=5),
       window=st.integers(1, 6),
       start=st.integers(0, 1))
def test_trailing_shift_matrix_property(vals, window, start):
    """The shared rolling-order-statistic kernel's middle gather ≡ the
    brute sorted-window lower-middle, per group, for both window modes."""
    from crusty_ray.ops.agg import trailing_shift_matrix

    frames = [pd.DataFrame({"g": gi, "v": grp})
              for gi, grp in enumerate(vals)]
    df = pd.concat(frames, ignore_index=True)
    mat, cnt = trailing_shift_matrix(df, ["g"], "v", window, start=start)
    mat.sort(axis=1)
    row = 0
    for gi, grp in enumerate(vals):
        for i in range(len(grp)):
            w = grp[max(0, i - start - window + 1): i + 1 - start]
            assert cnt[row] == len(w)
            if w:
                exp = sorted(w)[(len(w) - 1) // 2]
                assert mat[row, (cnt[row] - 1) // 2] == exp
            row += 1


# --------------------------------------------- concentration/rate trio

def test_pareto_point_matches_pandas(ray_session):
    from crusty_ray.ops.stats import value_pareto_point_ds
    got = value_pareto_point_ds(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "value"])
    ev["cents"] = np.floor(ev["value"].to_numpy() * 100 + 0.5).astype(
        np.int64)
    per = ev.groupby("user_id")["cents"].sum() \
        .sort_values(ascending=False)
    total = int(per.sum())
    cum = 0
    m = len(per)
    for i, v in enumerate(per):
        cum += int(v)
        if 5 * cum >= 4 * total:
            m = i + 1
            break
    assert int(got["users_to_80pct"].iloc[0]) == m
    assert int(got["n_users"].iloc[0]) == per.size


def test_autocorr_constant_series_is_zero_and_matches_pandas(ray_session):
    """Zero-denominator (constant series) → 0 by contract; real series
    match a pandas recompute of the slope-form Pearson."""
    from crusty_ray.ops.analog import event_rate_autocorr_ds, minute_of
    got = event_rate_autocorr_ds(SF).to_pandas() \
        .set_index("event_type")
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["ts", "event_type"])
    ev["minute"] = minute_of(ev["ts"])
    for et, g in ev.groupby("event_type"):
        c = g.groupby("minute").size().sort_index().to_numpy()
        if len(c) < 2:
            assert et not in got.index
            continue
        x, y = c[:-1].astype(int), c[1:].astype(int)
        n = len(x)
        den = n * sum(a * a for a in x) - sum(x) ** 2
        if den == 0:
            assert got.loc[et, "r1_pm"] == 0
        else:
            num = (n * sum(a * b for a, b in zip(x, y))
                   - sum(x) * sum(y)) * 1000
            exp = abs(num) // abs(den) * (1 if num * den >= 0 else -1)
            assert got.loc[et, "r1_pm"] == exp


def test_heatmap_total_identity(ray_session):
    from crusty_ray.ops.analog import weekday_hour_heatmap_ds
    got = weekday_hour_heatmap_ds(SF).to_pandas()
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["ts"])
    assert int(got["n_events"].sum()) == len(ev)
    assert got["dow"].between(0, 6).all()
    assert got["hour"].between(0, 23).all()


def test_simpson_bounds_and_single_lang_zero(ray_session):
    """0 ≤ simpson ≤ 1000·(k−1)/k, and a single-language source scores 0
    — checked against a pandas recompute."""
    from crusty_ray.ops.text import lang_diversity_by_source_ds
    got = lang_diversity_by_source_ds(SF).set_index("source")
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["source", "lang"])
    for src, g in docs.groupby("source"):
        n = len(g)
        s2 = int((g["lang"].value_counts() ** 2).sum())
        exp = (n * n - s2) * 1000 // (n * n)
        assert got.loc[src, "simpson_pm"] == exp
        assert got.loc[src, "n_docs"] == n
