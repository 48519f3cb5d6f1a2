"""Benchmark harness — headline crawl throughput + per-query timings.

Prints ONE JSON line on stdout:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {...per-stage sec...}, "sf": ..., "num_cpus": N,
   "pages_fetched": N, "pages_per_sec": N, ...}

Env: ``GRAFT_SF_DIR`` (default /root/testdata/sf0.1), ``RAY_GRAFT_CPUS``
(default 32). ``--scaling`` reruns the headline crawl in two fresh processes
(num_cpus=8 and 32) on the identical input and reports both throughputs plus
scaling efficiency = (thr_32/thr_8)/4 (BASELINE.md protocol).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time


def _log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def bench_crawl(num_cpus: int) -> dict:
    """Headline: the epochal crawl + image decode over the bench-scale
    synthetic web (identical input at every parallelism level)."""
    import ray
    from crusty_ray.config import test_config
    from crusty_ray.datagen.webgraph import WebConfig
    from crusty_ray.pipelines.crawl import CrawlEngine
    from crusty_ray.pipelines.images import run_image_pipeline

    cfg = test_config()
    cfg.jobs.shard_total = 8
    cfg.jobs.shard_max = 8
    cfg.jobs.dequeue_limit = 4000
    cfg.rules.total_link_budget = 30
    cfg.rules.links_per_task_budget = 10
    cfg.rules.max_level = 7
    cfg.crawl.concurrency = 4
    cfg.engine.fetch_concurrency = max(2, num_cpus - 4)
    cfg.engine.fetch_batch_size = 256
    cfg.engine.checkpoint_every_epochs = 5
    cfg.engine.min_epoch_rows_for_ray = 1024
    cfg.engine.max_epochs = 40
    web_cfg = WebConfig(n_domains=4000, max_pages_per_domain=50, hub_domains=8,
                        images_per_page=1)

    out = tempfile.mkdtemp(prefix="crusty_bench_")
    try:
        from crusty_ray.datagen.webgraph import SyntheticWeb
        seeds = [f"http://{SyntheticWeb(web_cfg).domain_name(i)}/"
                 for i in range(0, 4000, 2)]  # 2000 seeds: wide refresh-crawl frontier
        t0 = time.time()
        eng = CrawlEngine(cfg, web_cfg, f"{out}/crawl", seeds=seeds).run()
        crawl_sec = time.time() - t0
        pages = sum(m["pages_fetched"] for m in eng.job_metrics)
        log_rows = eng.read_crawl_log().num_rows

        t0 = time.time()
        img_summary = run_image_pipeline(f"{out}/crawl/crawl_log",
                                         f"{out}/images", web_cfg, cfg)
        images_sec = time.time() - t0
        return {
            "crawl_sec": round(crawl_sec, 3),
            "images_sec": round(images_sec, 3),
            "pages_fetched": pages,
            "crawl_log_rows": log_rows,
            "epochs": eng.epochs_run,
            "jobs_finished": len(eng.finished_domains),
            "pages_per_sec": round(log_rows / crawl_sec, 1),
            "n_images": img_summary["n_images"],
            "images_per_sec": round(img_summary["n_images"] / max(images_sec, 1e-9), 1),
            "min_lossy_psnr_db": img_summary["min_lossy_psnr_db"],
        }
    finally:
        shutil.rmtree(out, ignore_errors=True)


def bench_queries(sf_dir: str) -> dict:
    """Representative operator timings over the shared testdata tables."""
    import __ray_entry__ as e

    qs = e.queries()
    names = ["pricing_summary", "token_stats", "exact_dedup",
             "minhash_candidates", "ngram_jaccard_pairs", "ann_bruteforce",
             "ann_quantized", "topk_heavy_hitters", "event_minute_buckets",
             "embedding_quant_dedup"]
    out = {}
    for name in names:
        t0 = time.time()
        res = qs[name](sf_dir)
        if hasattr(res, "to_pandas"):
            res = res.to_pandas()  # force execution
        out[name] = round(time.time() - t0, 3)
        _log(f"  {name}: {out[name]}s ({len(res)} rows)")
    return out


def run_full(sf_dir: str, num_cpus: int) -> dict:
    import ray
    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    _log(f"headline crawl (num_cpus={num_cpus})...")
    crawl = bench_crawl(num_cpus)
    _log(f"  crawl: {crawl['crawl_sec']}s, {crawl['pages_per_sec']} pages/s")
    _log("operator queries...")
    queries = bench_queries(sf_dir)
    ray.shutdown()

    total = crawl["crawl_sec"] + crawl["images_sec"] + sum(queries.values())
    return {
        "metric": "crawl+decode+ops wall time",
        "value": round(total, 3),
        "unit": "sec",
        "queries": {"crawl": crawl["crawl_sec"], "images": crawl["images_sec"],
                    **queries},
        "sf": sf_dir.rstrip("/").rsplit("sf", 1)[-1],
        "num_cpus": num_cpus,
        **{k: v for k, v in crawl.items() if k not in ("crawl_sec", "images_sec")},
    }


def run_scaling() -> dict:
    """Two fresh processes, identical input, 8 vs 32 CPUs (BASELINE.md)."""
    results = {}
    for ncpu in (8, 32):
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        _log(f"scaling run num_cpus={ncpu}...")
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)], env=env,
            capture_output=True, text=True, check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)))
        results[ncpu] = json.loads(out.stdout.strip().splitlines()[-1])
    thr8 = results[8]["pages_per_sec"]
    thr32 = results[32]["pages_per_sec"]
    return {
        "metric": "scaling efficiency (pages/sec, 8 vs 32 cpus)",
        "value": round((thr32 / thr8) / 4.0, 3),
        "unit": "efficiency",
        "sec_8": results[8]["queries"]["crawl"],
        "sec_32": results[32]["queries"]["crawl"],
        "pages_per_sec_8": thr8,
        "pages_per_sec_32": thr32,
        "images_per_sec_8": results[8]["images_per_sec"],
        "images_per_sec_32": results[32]["images_per_sec"],
        "scaling_efficiency": round((thr32 / thr8) / 4.0, 3),
    }


def main() -> None:
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_full(sf_dir, num_cpus)))


if __name__ == "__main__":
    main()
