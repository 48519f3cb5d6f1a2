"""Scale smoke for the session-s ops — 20x orders (3M rows), 20x events
(2M rows).

Orders leg: key-strided replicas (each replica's keys are unique, so
`orderkey_unique` must stay at zero violations while the date/price rule
violations scale exactly 20x) drive the snapshot diff (expected I/U/D
cardinalities computed exactly from the replicated key array — the diff
is pure key arithmetic), the quality-rule report and the percent-rank
ECDF (every priority's max pct must hit 1000). Events leg: the shared
session-p 20x replicas (more users, same hour range) drive the rolling
median (one output row per event), the sliding distinct-user windows
(same hour set as sf0.1 — replicas add users, not hours) and the
trigram motifs (Σn ≡ Σ_user max(0, cnt−2), checked exactly via DuckDB).

Pass = completes, cardinalities exact, driver maxRSS flat.

Run: PYTHONPATH=/root/repo python probes/session_s_scale_smoke.py
"""

import os
import resource
import time

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import duckdb
import ray

SF = "/root/testdata/sf0.1"
REPLICAS = 20
OUT = f"/tmp/session_s_smoke_x{REPLICAS}"


def build_orders():
    os.makedirs(OUT, exist_ok=True)
    path = f"{OUT}/orders.parquet"
    if os.path.exists(path):
        return
    orders = pq.read_table(f"{SF}/orders.parquet")
    stride = int(pc.max(orders["o_orderkey"]).as_py()) + 1
    frames = []
    for k in range(REPLICAS):
        cols = {}
        for name in orders.column_names:
            col = orders[name]
            if name == "o_orderkey":
                col = pc.add(col, k * stride)
            cols[name] = col
        frames.append(pa.table(cols))
    pq.write_table(pa.concat_tables(frames), path)


def rss_gb():
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def main():
    from probes.session_p_scale_smoke import OUT as FACTS, build_facts
    build_orders()
    build_facts()
    ray.init(address="local", num_cpus=32, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from crusty_ray.ops.analytic import (price_percent_rank_ds,
                                         rolling_median_user_value_ds,
                                         snapshot_diff_orders_ds)
    from crusty_ray.ops.behavior import event_trigrams_ds
    from crusty_ray.ops.stats import quality_rules_ds
    from crusty_ray.ops.windows import sliding_distinct_users_ds

    k = pq.read_table(f"{OUT}/orders.parquet",
                      columns=["o_orderkey"])["o_orderkey"] \
        .to_numpy(zero_copy_only=False)
    n_orders = len(k)
    exp_u = int(((k % 7 == 0) & (k % 13 != 0) & (k % 1000 != 0)).sum())
    exp_d = int((k % 13 == 0).sum())
    exp_i = int((k % 11 == 0).sum())
    n_events = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{FACTS}/events.parquet')"
    ).fetchone()[0]
    exp_tri = duckdb.sql(
        f"SELECT sum(greatest(c - 2, 0)) FROM (SELECT count(*) AS c FROM "
        f"read_parquet('{FACTS}/events.parquet') GROUP BY user_id)"
    ).fetchone()[0]
    sf_hours = duckdb.sql(
        f"SELECT count(DISTINCT CAST(floor(epoch(ts)) AS BIGINT) // 3600) "
        f"FROM read_parquet('{SF}/events.parquet')").fetchone()[0]
    viol_1x = duckdb.sql(
        f"SELECT sum(CASE WHEN o_orderdate >= TIMESTAMP '2001-01-01' "
        f"THEN 1 ELSE 0 END) FROM read_parquet('{SF}/orders.parquet')"
    ).fetchone()[0]

    checks = []

    def run(name, fn, check):
        t0, r0 = time.time(), rss_gb()
        res = fn()
        if hasattr(res, "to_pandas"):
            res = res.to_pandas()
        wall = time.time() - t0
        ok = check(res)
        checks.append(ok)
        print(f"{name}: {wall:.1f}s rows={len(res)} maxRSS={rss_gb():.2f}GB "
              f"(start {r0:.2f}) {'OK' if ok else 'FAIL'}", flush=True)

    run(f"snapshot_diff_orders ({n_orders} orders = 20x)",
        lambda: snapshot_diff_orders_ds(OUT),
        lambda df: (df["change"] == "U").sum() == exp_u
        and (df["change"] == "D").sum() == exp_d
        and (df["change"] == "I").sum() == exp_i)
    run(f"quality_rules_report ({n_orders} orders = 20x)",
        lambda: quality_rules_ds(OUT),
        lambda df: (df["n_checked"] == n_orders).all()
        and int(df.set_index("rule_name").loc["orderkey_unique",
                                              "n_violations"]) == 0
        and int(df.set_index("rule_name").loc["orderdate_before_2001",
                                              "n_violations"])
        == REPLICAS * viol_1x)
    run(f"price_percent_rank ({n_orders} orders = 20x)",
        lambda: price_percent_rank_ds(OUT),
        lambda df: len(df) == n_orders
        and df.groupby("o_orderpriority")["pct_pm"].max().eq(1000).all()
        and df["pct_pm"].between(0, 1000).all())
    run(f"rolling_median_user_value ({n_events} events = 20x)",
        lambda: rolling_median_user_value_ds(FACTS),
        lambda df: len(df) == n_events
        and df["roll_med_cents"].between(df["cents"].min(),
                                         df["cents"].max()).all())
    run(f"sliding_distinct_users ({n_events} events = 20x)",
        lambda: sliding_distinct_users_ds(FACTS),
        lambda df: len(df) == sf_hours and (df["n_users"] >= 1).all())
    run(f"event_trigrams ({n_events} events = 20x)",
        lambda: event_trigrams_ds(FACTS),
        lambda df: int(df["n"].sum()) == int(exp_tri))

    # later waves: churn, Gini, RFM, join-size — exact identities at 20x
    from crusty_ray.ops.analytic import customer_rfm_ds
    from crusty_ray.ops.behavior import user_inactivity_report_ds
    from crusty_ray.ops.stats import events_gini_ds

    n_users = duckdb.sql(
        f"SELECT count(DISTINCT user_id) FROM "
        f"read_parquet('{FACTS}/events.parquet')").fetchone()[0]
    n_cust = duckdb.sql(
        f"SELECT count(DISTINCT o_custkey) FROM "
        f"read_parquet('{OUT}/orders.parquet')").fetchone()[0]
    run(f"user_inactivity_report ({n_users} users = 20x)",
        lambda: user_inactivity_report_ds(FACTS),
        lambda df: len(df) == n_users and (df["idle_hours"] >= 0).all()
        and (df["idle_hours"] == 0).any())
    run(f"events_gini ({n_events} events = 20x)",
        lambda: events_gini_ds(FACTS),
        lambda df: len(df) == 1 and int(df["n_users"][0]) == n_users
        and int(df["total_events"][0]) == n_events
        and 0 <= int(df["gini_pm"][0]) <= 1000)
    run(f"customer_rfm ({n_orders} orders = 20x, {n_cust} customers)",
        lambda: customer_rfm_ds(OUT),
        lambda df: len(df) == n_cust
        and df["r_score"].between(1, 5).all()
        and df["rfm"].between(111, 555).all())

    checks.append(av_leg())

    print("ALL OK" if all(checks) else "FAILURES", flush=True)
    ray.shutdown()


def av_leg():
    """2,000-clip video near-dup sweep (40x the face): 500 bases x 4
    shifted copies -> expected C(4,2) pairs per base at min_shared=4
    minus the D=3 pairs that fall below threshold (Δ=3 -> 12-6... with 6
    sampled even frames and shift 2: Δ=1,2 share >=4, Δ=3 shares 3 <4),
    i.e. per base pairs = (0,1),(1,2),(2,3) Δ=1 ->5; (0,2),(1,3) Δ=2 ->4;
    (0,3) Δ=3 ->3 (dropped) = 5 pairs/base -> 2500 exact."""
    import pyarrow as pa

    from crusty_ray.codecs.av import synth_video_overlapping
    from crusty_ray.ops.multimodal import video_phash_near_dups

    n = 2000
    t0, r0 = time.time(), rss_gb()
    t = pa.table({
        "video_id": pa.array(np.arange(n, dtype=np.int64)),
        "bytes": pa.array([synth_video_overlapping(i, base_mod=500)
                           for i in range(n)], pa.binary())})
    got = video_phash_near_dups(ray.data.from_arrow(t), min_shared=4) \
        .to_pandas()
    ok = len(got) == 500 * 5
    print(f"video_near_dups ({n} clips = ~40x): {time.time()-t0:.1f}s "
          f"pairs={len(got)} maxRSS={rss_gb():.2f}GB (start {r0:.2f}) "
          f"{'OK' if ok else 'FAIL'}", flush=True)
    return ok


if __name__ == "__main__":
    main()
