"""Scale smoke for the round-4 continuation faces — 100x embeddings
(50k vectors x 64 dims, key-strided replicas) and 20x documents (10k docs)
driving the quantized ANN twins (IVF / sign-LSH / PQ) and the hybrid
two-stage retrieval.

The check is the strongest available: the SAME DuckDB oracles the driver
contract runs at sf0.01 are re-run over the replicated tables, so every
face must stay bit-exact at 100x — training (Lloyd rounds over 50k
vectors), assignment, probe selection, bucketing and scoring all included.
Pass = bit-exact at every leg, driver maxRSS flat.

Run: PYTHONPATH=/root/repo python probes/session_t_scale_smoke.py
"""

import os
import resource
import time

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import duckdb
import ray

SF = "/root/testdata/sf0.1"
EMB_REPLICAS = 100
DOC_REPLICAS = 20
OUT = f"/tmp/session_t_smoke_x{EMB_REPLICAS}"


def rss_gb():
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def _replicate(table: str, key: str, replicas: int) -> None:
    """Key-strided replication: ids stay unique and the base table's
    smallest ids (the query sets) are preserved verbatim."""
    path = f"{OUT}/{table}.parquet"
    if os.path.exists(path):
        return
    src = pq.read_table(f"/root/testdata/sf0.01/{table}.parquet")
    stride = int(pc.max(src[key]).as_py()) + 1
    frames = []
    for k in range(replicas):
        cols = {n: (pc.add(src[n], k * stride) if n == key else src[n])
                for n in src.column_names}
        frames.append(pa.table(cols))
    pq.write_table(pa.concat_tables(frames), path)


def build():
    os.makedirs(OUT, exist_ok=True)
    # embeddings: sf0.01-sized base (500 rows — the contract fixture) so
    # the 100x table is 50k vectors
    _replicate("embeddings", "vec_id", EMB_REPLICAS)
    _replicate("documents", "doc_id", DOC_REPLICAS)


def main():
    build()
    ray.init(address="local", num_cpus=32, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    import __ray_entry__ as entry

    qs, oracles = entry.queries(), entry.oracle_sql()
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{OUT}/{t}.parquet')")

    for name in ("ann_ivf_quant", "ann_lsh_md5", "ann_pq_quant",
                 "hybrid_retrieval"):
        t0 = time.time()
        got = qs[name](OUT)
        if hasattr(got, "to_pandas"):
            got = got.to_pandas()
        ray_sec = time.time() - t0
        t0 = time.time()
        want = con.execute(oracles[name]).df()
        duck_sec = time.time() - t0
        cols = sorted(got.columns)
        a = got[cols].sort_values(cols).reset_index(drop=True).astype("int64")
        b = want[cols].sort_values(cols).reset_index(drop=True).astype("int64")
        assert a.equals(b), f"{name}: MISMATCH at {EMB_REPLICAS}x\n{a}\n{b}"
        print(f"{name}: {len(a)} rows bit-exact at scale "
              f"(ray {ray_sec:.1f}s, duckdb {duck_sec:.1f}s, "
              f"rss {rss_gb():.2f} GB)", flush=True)

    print(f"driver maxRSS {rss_gb():.2f} GB")
    ray.shutdown()


if __name__ == "__main__":
    main()
