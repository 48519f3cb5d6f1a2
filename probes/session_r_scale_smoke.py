"""Scale smoke for the session-r ops — 100x embeddings, 20x events,
500k documents.

Embeddings leg: a deterministic 200k x 64-dim synthetic table (100x the
sf0.1 embedding count) drives the fixed-round k-means — per round only
blocks·k packed partial rows reach the driver, so maxRSS must stay flat
while every vector gets an assignment. Events leg: the session-p 20x
replicas drive the Count-Min estimates (cell table is a fixed 3x64
object at any scale; est >= exact for every one of the 20x user keys).
Documents leg: the shared 500k-doc corpus drives entity resolution
end-to-end (SNM -> FS -> components; exactly one row per doc). Graph
legs stay on sf0.1 (neighbor stats degree-sum identity = 2x edges;
label spread covers every seed).

Pass = completes, cardinalities exact, driver maxRSS flat.

Run: PYTHONPATH=/root/repo python probes/session_r_scale_smoke.py
"""

import os
import resource
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import duckdb
import ray

SF = "/root/testdata/sf0.1"
EMB_N = 200_000
EMB_DIM = 64
EMB_OUT = f"/tmp/session_r_smoke_emb{EMB_N}"


def rss_gb():
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def build_embeddings():
    os.makedirs(EMB_OUT, exist_ok=True)
    path = f"{EMB_OUT}/embeddings.parquet"
    if os.path.exists(path):
        return
    rng = np.random.RandomState(11)
    # 16 planted cluster centers + noise, L2-normalized like the sf tables
    centers = rng.randn(16, EMB_DIM)
    mat = (centers[rng.randint(0, 16, EMB_N)]
           + 0.3 * rng.randn(EMB_N, EMB_DIM)).astype(np.float32)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    t = pa.table({
        "vec_id": pa.array(np.arange(EMB_N, dtype=np.int64)),
        "embedding": pa.array(list(mat), type=pa.list_(pa.float32())),
        "label": pa.array(np.zeros(EMB_N, dtype=np.int32)),
    })
    pq.write_table(t, path)


def main():
    from probes.session_p_scale_smoke import (OUT as FACTS, build_docs,
                                              build_facts)
    doc_dir = build_docs()
    build_facts()
    build_embeddings()
    ray.init(address="local", num_cpus=32, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from crusty_ray.ops.graph import (part_cosupport_edges,
                                      part_label_spread_ds,
                                      part_neighbor_stats_ds)
    from crusty_ray.ops.linkage import entity_clusters_ds
    from crusty_ray.ops.similarity import kmeans_embeddings_ds
    from crusty_ray.ops.sketch import cms_user_counts_ds

    n_docs = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{doc_dir}/documents.parquet')"
    ).fetchone()[0]
    n_events = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{FACTS}/events.parquet')"
    ).fetchone()[0]
    n_edges = part_cosupport_edges(SF).count()
    n_seeds = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{SF}/part.parquet') "
        f"WHERE p_partkey % 5 = 0").fetchone()[0]

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

    run(f"kmeans_embeddings ({EMB_N} x {EMB_DIM} vectors, k=8, 2 rounds)",
        lambda: kmeans_embeddings_ds(EMB_OUT),
        lambda df: len(df) == EMB_N and df["cluster"].between(0, 7).all()
        and (df["d2"] >= 0).all())
    run(f"cms_user_counts ({n_events} events = 20x)",
        lambda: cms_user_counts_ds(FACTS),
        lambda df: (df["cms_est"] >= df["exact_n"]).all()
        and int(df["exact_n"].sum()) == n_events)
    run(f"entity_clusters ({n_docs} docs)",
        lambda: entity_clusters_ds(doc_dir),
        lambda df: len(df) == n_docs and (df["entity_size"] >= 1).all()
        and (df["entity_id"] <= df["doc_id"]).all())
    run(f"part_neighbor_stats (sf0.1 graph, {n_edges} edges)",
        lambda: part_neighbor_stats_ds(SF),
        lambda df: int(df["degree"].sum()) == 2 * n_edges
        and (df["max_nb_cents"] >= df["avg_nb_cents"]).all())
    run(f"part_label_spread (sf0.1 graph, {n_seeds} seeds)",
        lambda: part_label_spread_ds(SF),
        lambda df: (df["assigned_round"] == 0).sum() == n_seeds
        and df["assigned_round"].isin([0, 1, 2]).all())

    print("ALL OK" if all(checks) else "FAILURES", flush=True)
    ray.shutdown()


if __name__ == "__main__":
    main()
