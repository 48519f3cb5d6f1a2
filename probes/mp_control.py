"""No-framework scaling control: the crawl's fetch+discover kernel under
plain multiprocessing, zero Ray, zero data movement.

Measures the SUBSTRATE's own 8→32-way scaling for the identical per-page
work (synthetic page generation + parse + link resolution + discovery
filters). The engine's measured scaling efficiency should be read against
this ceiling: if the control itself returns ~0.5-0.8 on this host (memory
bandwidth + bursty hypervisor steal), no framework can do better.

Usage:  python probes/mp_control.py            # interleaved 8/32, best-of-2
"""

from __future__ import annotations

import json
import os
import sys
import time

N_DOMAINS = 4000
PAGES_PER_DOMAIN = 24


def _chunk_work(args) -> int:
    lo, hi = args
    # late imports: fork-safe, and each worker builds its own stage objects
    from crusty_ray.config import test_config
    from crusty_ray.datagen.webgraph import SyntheticWeb, WebConfig
    from crusty_ray.stages.discover import DiscoverStage
    from crusty_ray.stages.fetch import FetchStage
    import pyarrow as pa

    web_cfg = WebConfig(n_domains=N_DOMAINS, max_pages_per_domain=40,
                        link_lo=30, link_hi=70)
    cfg = test_config()
    fetch = FetchStage(web_cfg, cfg)
    discover = DiscoverStage(web_cfg, cfg)
    web = SyntheticWeb(web_cfg)
    urls, domains = [], []
    for k in range(lo, hi):
        i, j = divmod(k, PAGES_PER_DOMAIN)
        urls.append(web.page_url(i, j % max(1, web.n_pages(i))))
        domains.append(web.domain_name(i))
    n = len(urls)
    batch = pa.table({
        "url": urls, "domain": domains,
        "depth": pa.array([1] * n, pa.int32()),
        "shard": pa.array([0] * n, pa.int32()),
        "epoch": pa.array([0] * n, pa.int32()),
        "seq": pa.array(range(n), pa.int64()),
    })
    out = discover(fetch(batch))
    return out.num_rows


def run_level(nproc: int) -> float:
    import multiprocessing as mp
    os.sched_setaffinity(0, range(nproc))  # children inherit the mask
    total = N_DOMAINS * PAGES_PER_DOMAIN
    step = total // (nproc * 4)            # 4 chunks per proc: balance
    chunks = [(i, min(i + step, total)) for i in range(0, total, step)]
    t0 = time.time()
    with mp.get_context("spawn").Pool(nproc) as pool:
        done = sum(pool.map(_chunk_work, chunks))
    dt = time.time() - t0
    os.sched_setaffinity(0, range(os.cpu_count()))
    return done / dt


def main() -> None:
    best: dict[int, float] = {}
    # CONTROL_PROCS="4,16" reads the substrate ceiling at a different N /
    # 4N pair (default 8/32 — the historic series)
    lo, hi = (int(x) for x in
              os.environ.get("CONTROL_PROCS", "8,32").split(","))
    # CONTROL_ONESHOT=1: one (lo, hi) pass — the quick quiet-window read the
    # bench.py --scaling-protocol driver uses to qualify each window
    levels = (lo, hi) if os.environ.get("CONTROL_ONESHOT") \
        else (lo, hi, lo, hi)
    for nproc in levels:
        thr = run_level(nproc)
        print(f"  control {nproc} procs: {thr:,.0f} pages/s", file=sys.stderr)
        best[nproc] = max(best.get(nproc, 0), thr)
    eff = (best[hi] / best[lo]) / (hi / lo)
    print(json.dumps({
        "metric": "no-framework multiprocessing control (same kernel)",
        f"pages_per_sec_{lo}": round(best[lo], 1),
        f"pages_per_sec_{hi}": round(best[hi], 1),
        "control_efficiency": round(eff, 3),
    }))


if __name__ == "__main__":
    main()
