"""Scale smoke for the session-q ops — 100x documents, 20x events+customer.

Documents leg: the shared 500k-doc corpus (text_ops_scale_smoke) drives
Fellegi–Sunter linkage over SNM pairs (pair count EXACTLY 2n-3 — the
dense-rank invariant), weighted priority sampling (exactly n rows out),
and per-doc TF-IDF keywords (≤ 3 rows per doc, ranks 1..3). Fact leg:
the session-p 20x events+customer replicas (shared key stride) drive the
OLS trend + modal event (exactly 20x the sf0.1 user count), decayed
activity (top-50 shape) and purchase attribution (exactly 20x the sf0.1
purchase count); name linkage runs on the 20x customer table (2n-3
pairs). Graph ops stay on sf0.1 (k-core, support-2 link prediction).

Pass = completes, cardinalities exact, driver maxRSS flat (every op
ships only slim partials / top-n / O(segments) tables to the driver).

Run: PYTHONPATH=/root/repo python probes/session_q_scale_smoke.py
"""

import resource
import time

import duckdb
import ray

SF = "/root/testdata/sf0.1"


def rss_gb():
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def main():
    from probes.session_p_scale_smoke import (FACT_REPLICAS, OUT as FACTS,
                                              build_docs, build_facts)
    doc_dir = build_docs()
    build_facts()
    ray.init(address="local", num_cpus=32, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from crusty_ray.ops.behavior import (decayed_user_activity_ds,
                                         purchase_attribution_ds)
    from crusty_ray.ops.graph import kcore_parts_ds, link_prediction_parts_ds
    from crusty_ray.ops.linkage import (name_linkage_ds,
                                        record_linkage_scores_ds)
    from crusty_ray.ops.sample import weighted_doc_sample_ds
    from crusty_ray.ops.stats import user_modal_event_ds, user_value_trend_ds
    from crusty_ray.ops.text import doc_keywords_ds

    n_docs = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{doc_dir}/documents.parquet')"
    ).fetchone()[0]
    n_cust = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{FACTS}/customer.parquet')"
    ).fetchone()[0]
    n_users_sf = duckdb.sql(
        f"SELECT count(DISTINCT user_id) FROM "
        f"read_parquet('{SF}/events.parquet')").fetchone()[0]
    n_purch_sf = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{SF}/events.parquet') "
        f"WHERE event_type = 'purchase'").fetchone()[0]

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

    run(f"record_linkage_scores ({n_docs} docs)",
        lambda: record_linkage_scores_ds(doc_dir),
        lambda df: len(df) == 2 * n_docs - 3
        and set(df["decision"].unique()) <= {"match", "possible",
                                             "non_match"})
    run(f"weighted_doc_sample ({n_docs} docs)",
        lambda: weighted_doc_sample_ds(doc_dir),
        lambda df: len(df) == 100
        and sorted(df["rnk"]) == list(range(1, 101)))
    run(f"doc_keywords ({n_docs} docs)",
        lambda: doc_keywords_ds(doc_dir),
        lambda df: len(df) <= 3 * n_docs and df["rn"].isin([1, 2, 3]).all()
        and (df["weight"] > 0).all())
    run(f"name_linkage ({n_cust} customers = {FACT_REPLICAS}x)",
        lambda: name_linkage_ds(FACTS),
        lambda df: len(df) == 2 * n_cust - 3
        and (df["name_distance"] >= 0).all())
    run(f"user_value_trend ({FACT_REPLICAS}x events)",
        lambda: user_value_trend_ds(FACTS),
        lambda df: len(df) == FACT_REPLICAS * n_users_sf)
    run(f"user_modal_event ({FACT_REPLICAS}x events)",
        lambda: user_modal_event_ds(FACTS),
        lambda df: len(df) == FACT_REPLICAS * n_users_sf)
    run(f"decayed_user_activity ({FACT_REPLICAS}x events)",
        lambda: decayed_user_activity_ds(FACTS),
        lambda df: len(df) == 50
        and df["decay_score"].is_monotonic_decreasing)
    run(f"purchase_attribution ({FACT_REPLICAS}x events)",
        lambda: purchase_attribution_ds(FACTS),
        lambda df: len(df) == FACT_REPLICAS * n_purch_sf)
    run("kcore_parts (sf0.1 co-purchase graph)",
        lambda: kcore_parts_ds(SF),
        lambda df: len(df) > 0 and (df["core_degree"] >= 1).all())
    run("link_prediction_parts (sf0.1 support-2 graph)",
        lambda: link_prediction_parts_ds(SF),
        lambda df: len(df) == 50
        and df["common_neighbors"].is_monotonic_decreasing)

    print("ALL OK" if all(checks) else "FAILURES", flush=True)
    ray.shutdown()


if __name__ == "__main__":
    main()
