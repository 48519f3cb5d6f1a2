"""Simulator-oracle fixture tables for the driver correctness gate.

The crawl operators' oracle is the deterministic pure-Python reference
simulator (`sim/simulator.py`) — its semantics are not SQL-expressible, so
the driver's DuckDB compare could never see the engine ≡ simulator equality
the pytest suite proves (`tests/test_crawl_e2e.py`). This module makes that
equality driver-visible: run the simulator once with the exact config the
registered crawl queries use and materialize its expected outputs as parquet
(`expected_crawl_log`, `expected_topk`, `expected_job_metrics`);
``oracle_sql()`` then registers plain ``read_parquet`` / aggregate SQL over
those files, flipping the crawl correctness rows from ``no_oracle`` to fully
hash-checked.

Determinism: the simulator is seed-stable (same cfg + web_cfg → identical
outputs, asserted by ``test_crawl_e2e.py::test_sim_determinism``), so a
fixture from a previous process is reusable; publication is atomic (write to
a temp dir, ``os.rename`` into place) so concurrent builders can't observe a
partial fixture.
"""

from __future__ import annotations

import os
import shutil
import tempfile

import pandas as pd


def ensure_sim_fixture(cfg, web_cfg, max_epochs: int, tag: str) -> str:
    """Return a directory containing the simulator's expected-output parquet
    tables for (cfg, web_cfg, max_epochs); ``tag`` must uniquely encode those
    inputs (it names the cache entry)."""
    root = os.path.join(tempfile.gettempdir(), "crusty_ray_simfix")
    fix = os.path.join(root, tag)
    if os.path.exists(os.path.join(fix, "_COMPLETE")):
        return fix
    from .simulator import CrawlSimulator

    sim = CrawlSimulator(cfg, web_cfg).run(max_epochs)
    os.makedirs(root, exist_ok=True)
    tmp = tempfile.mkdtemp(prefix=f"{tag}.build-", dir=root)
    # image_ids (list<str>) is dropped to mirror the registered crawl_log
    # query, which drops it for the hash compare
    log = pd.DataFrame(sim.crawl_log).drop(columns=["image_ids"])
    log.to_parquet(os.path.join(tmp, "expected_crawl_log.parquet"),
                   index=False)
    pd.DataFrame(sim.topk_rows,
                 columns=["epoch", "tld", "domain", "hits"]).to_parquet(
        os.path.join(tmp, "expected_topk.parquet"), index=False)
    pd.DataFrame(sim.job_metrics).to_parquet(
        os.path.join(tmp, "expected_job_metrics.parquet"), index=False)
    # distinct cross-domain link edges — the SAME derivation as
    # ops/graph.domain_link_edges (re-derive each fetched page's out-links
    # from the deterministic web, keep normalized cross-domain targets),
    # done serially so domain_pagerank's oracle can replay the integer
    # PageRank over them in SQL
    from ..core.urls import transform_domain
    from ..datagen.webgraph import SyntheticWeb
    web = SyntheticWeb(web_cfg)
    edges = set()
    for row in sim.crawl_log:
        rec = web.page_record(row["url"])
        for link in rec["out_links"]:
            host = link.split("/", 3)[2] if "//" in link else ""
            tgt = transform_domain(host)
            if tgt and tgt != row["domain"]:
                edges.add((row["domain"], tgt))
    pd.DataFrame(sorted(edges), columns=["src_domain", "dst_domain"]) \
        .to_parquet(os.path.join(tmp, "expected_domain_edges.parquet"),
                    index=False)
    with open(os.path.join(tmp, "_COMPLETE"), "w") as f:
        f.write("ok")
    try:
        os.rename(tmp, fix)  # atomic publish; loser of a race cleans up
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)
    return fix
