"""Shard scoping: dequeue only [shard_min, shard_max), insert everywhere
(reference conf/default.yaml:35-43, crusty.rs:550-560)."""

from crusty_ray.config import test_config as _tc
from crusty_ray.datagen.webgraph import WebConfig
from crusty_ray.sim.simulator import CrawlSimulator

WEB_CFG = WebConfig(n_domains=60, max_pages_per_domain=15)


def _cfg(lo, hi):
    cfg = _tc()
    cfg.rules.total_link_budget = 20
    cfg.rules.links_per_task_budget = 8
    cfg.rules.max_level = 5
    cfg.jobs.shard_min, cfg.jobs.shard_max = lo, hi
    return cfg


def test_scoped_node_crawls_only_its_shards():
    full = CrawlSimulator(_cfg(0, 4), WEB_CFG).run(20)
    scoped = CrawlSimulator(_cfg(0, 2), WEB_CFG).run(20)

    assert {r["shard"] for r in full.crawl_log} == {0, 1, 2, 3}
    assert {r["shard"] for r in scoped.crawl_log} <= {0, 1}
    assert 0 < len(scoped.crawl_log) < len(full.crawl_log)

    # discovered domains for unscoped shards pile up as pending (another
    # node's work), never dequeued here
    unscoped_pending = sum(g["pending_domains"] for g in scoped.gauges
                           if g["shard"] in (2, 3))
    assert unscoped_pending > 0


def test_engine_matches_simulator_under_scoping(ray_session, tmp_path):
    from crusty_ray.pipelines.crawl import CrawlEngine
    import pandas as pd

    cfg = _cfg(0, 2)
    sim = CrawlSimulator(cfg, WEB_CFG).run(15)
    eng = CrawlEngine(cfg, WEB_CFG, str(tmp_path / "o")).run(15)
    sdf = pd.DataFrame(sim.crawl_log).drop(columns=["image_ids"])
    edf = eng.read_crawl_log().to_pandas().drop(columns=["image_ids"])
    edf = edf.sort_values(["epoch", "seq"]).reset_index(drop=True)
    sdf = sdf.sort_values(["epoch", "seq"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(edf, sdf, check_dtype=False)
    assert eng.finished_domains == sim.finished_domains
