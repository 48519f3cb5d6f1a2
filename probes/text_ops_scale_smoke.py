"""Scale smoke for the session-l heavy text ops — 100x the sf0.1 corpus.

Builds a deterministic 500k-doc / ~58 MB documents table (100 salted
replicas of sf0.1: each replica appends one replica-unique token, so all
original 5-grams become corpus-wide duplicates — the WORST case for the
dup-decision partitions) and runs the heavy new ops end to end, reporting
wall time and driver maxRSS. Pass = completes, row counts scale exactly
100x, and driver RSS stays flat (the ops are shuffle-based; only slim
partials and the O(model) tables ever reach the driver).

Measured (2026-08-19, 32 cpus): exact_substr_removal 156 s / maxRSS
0.29 GB; bigram_surprisal 276 s / maxRSS 0.41 GB — wall ~linear in the
corpus (sf0.1 base ≈ 2-6 s), driver flat.

split_leakage is deliberately NOT in this smoke: its Jaccard-component
stage is pair-quadratic in docs-per-gram, and THIS fixture's 31-token
vocabulary makes nearly every document pair a candidate (5k docs share an
average gram) — an adversarial data regime, not a plan defect; real web
corpora have vocabulary >> doc count per gram, and the hot-gram stop-hash
caps (ops/dedup.py) are the documented escape hatch where they don't.

Run: PYTHONPATH=/root/repo python probes/text_ops_scale_smoke.py
"""

import os
import resource
import time

import pyarrow as pa
import pyarrow.parquet as pq

import duckdb
import ray

SRC = "/root/testdata/sf0.1/documents.parquet"
REPLICAS = 100
# corpus dir keyed on the replica count: editing REPLICAS can't silently
# reuse a stale corpus
OUT = f"/tmp/text_scale_smoke_x{REPLICAS}"


def build():
    os.makedirs(OUT, exist_ok=True)
    dst = f"{OUT}/documents.parquet"
    if os.path.exists(dst):
        return
    t = pq.read_table(SRC)
    n = t.num_rows
    frames = []
    for k in range(REPLICAS):
        ids = pa.compute.add(t["doc_id"], k * n)
        # one replica-unique trailing token: originals' grams now repeat
        # corpus-wide; the tail gram stays unique per replica
        texts = [f"{x} rep{k}tail" for x in t["text"].to_pylist()]
        frames.append(pa.table({
            "doc_id": ids, "text": texts, "lang": t["lang"],
            "source": t["source"], "n_chars": t["n_chars"]}))
    pq.write_table(pa.concat_tables(frames), dst)


def rss_gb():
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def main():
    build()
    ray.init(address="local", num_cpus=32, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    from crusty_ray.ops.text import bigram_surprisal_ds, \
        exact_substr_removal_ds

    n_docs = duckdb.sql(
        f"select count(*) from read_parquet('{OUT}/documents.parquet')"
    ).fetchone()[0]
    print(f"corpus: {n_docs} docs,", round(os.path.getsize(
        f"{OUT}/documents.parquet") / 1e6, 1), "MB parquet,",
        f"driver rss {rss_gb():.2f} GB")

    for name, fn in [("exact_substr_removal", exact_substr_removal_ds),
                     ("bigram_surprisal", bigram_surprisal_ds)]:
        t0 = time.time()
        out = fn(OUT)
        rows = out.count() if hasattr(out, "count") else len(out)
        print(f"{name}: {time.time() - t0:.1f}s, {rows} rows, "
              f"driver maxRSS {rss_gb():.2f} GB")
        assert rows == n_docs, (name, rows, n_docs)
    ray.shutdown()


if __name__ == "__main__":
    main()
