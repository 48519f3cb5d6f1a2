"""Scale smoke for the session-p ops — 100x documents, 20x events+customer.

Documents leg reuses text_ops_scale_smoke's 500k-doc corpus for the
sorted-neighborhood blocking (expected pairs EXACTLY 2n-3 at window 2 —
the dense-rank invariant at any scale) and the multi-epoch shuffle
manifest (each epoch a dense 0..n-1 permutation). The fact leg replicates
events + customer 20x with a SHARED user-key stride, so the salted join's
per-segment counts scale exactly 20x, and the z-order layout's row total
matches.

Pass = completes, cardinalities exact, driver maxRSS flat (all four ops
ship only slim partials / O(files|segments) tables to the driver).

Run: PYTHONPATH=/root/repo python probes/session_p_scale_smoke.py
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
FACT_REPLICAS = 20
OUT = f"/tmp/session_p_smoke_x{FACT_REPLICAS}"


def build_docs():
    from probes.text_ops_scale_smoke import OUT as DOC_OUT, build
    build()
    return DOC_OUT


def build_facts():
    os.makedirs(OUT, exist_ok=True)
    if os.path.exists(f"{OUT}/customer.parquet"):
        return
    events = pq.read_table(f"{SF}/events.parquet")
    cust = pq.read_table(f"{SF}/customer.parquet")
    # one stride covers BOTH key columns, so each replica joins only itself
    stride = max(int(pc.max(events["user_id"]).as_py()),
                 int(pc.max(cust["c_custkey"]).as_py())) + 1
    eid_off = int(pc.max(events["event_id"]).as_py()) + 1

    def rep(t, offsets):
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

    pq.write_table(rep(events, {"user_id": stride, "event_id": eid_off}),
                   f"{OUT}/events.parquet")
    pq.write_table(rep(cust, {"c_custkey": stride}),
                   f"{OUT}/customer.parquet")


def rss_gb():
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def main():
    doc_dir = build_docs()
    build_facts()
    ray.init(address="local", num_cpus=32, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from crusty_ray.ops.dedup import sorted_neighborhood_pairs_ds
    from crusty_ray.ops.joins import salted_join_segment_stats_ds
    from crusty_ray.ops.pack import (epoch_shuffle_manifest_ds,
                                     zorder_events_layout_ds)

    n_docs = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{doc_dir}/documents.parquet')"
    ).fetchone()[0]
    base = duckdb.sql(f"""
        SELECT c_mktsegment, count(*) n
        FROM read_parquet('{SF}/events.parquet') e
        JOIN read_parquet('{SF}/customer.parquet') c
          ON e.user_id = c.c_custkey
        GROUP BY 1 ORDER BY 1""").df()
    n_events = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{OUT}/events.parquet')"
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

    run(f"sorted_neighborhood_pairs ({n_docs} docs)",
        lambda: sorted_neighborhood_pairs_ds(doc_dir),
        lambda df: len(df) == 2 * n_docs - 3)
    run(f"epoch_shuffle_manifest ({n_docs} docs x 2 epochs)",
        lambda: epoch_shuffle_manifest_ds(doc_dir, n_epochs=2),
        lambda df: len(df) == 2 * n_docs
        and df.groupby("epoch")["shuffle_rank"].max().eq(n_docs - 1).all())
    run(f"salted_join_segment_stats ({FACT_REPLICAS}x events+customer)",
        lambda: salted_join_segment_stats_ds(OUT),
        lambda df: df.sort_values("c_mktsegment")["n_events"].tolist()
        == (base["n"] * FACT_REPLICAS).tolist())
    run(f"zorder_events_layout ({FACT_REPLICAS}x events)",
        lambda: zorder_events_layout_ds(OUT),
        lambda df: int(df["n_rows"].sum()) == n_events)

    from crusty_ray.ops.analytic import upsert_orders_latest_ds
    from crusty_ray.ops.graph import part_triangles_ds
    n_orders = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{SF}/orders.parquet')"
    ).fetchone()[0]
    run("part_triangles (sf0.1 co-purchase graph)",
        lambda: part_triangles_ds(SF),
        lambda df: len(df) > 0 and (df["n_triangles"] > 0).all())
    run("upsert_orders_latest (sf0.1 orders)",
        lambda: upsert_orders_latest_ds(SF),
        lambda df: len(df) == n_orders
        and int(df["n_versions"].max()) == 3)

    print("ALL OK" if all(checks) else "FAILURES", flush=True)
    ray.shutdown()


if __name__ == "__main__":
    main()
