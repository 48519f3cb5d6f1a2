"""Fault injection: a dead frontier actor mid-crawl → resume from the latest
checkpoint reproduces the uninterrupted run exactly (the reference tolerates
lost nodes via redis TTLs + rediscovery, conf/default.yaml:56-61; our stronger
guarantee is exact resume, north_rule)."""

import pandas as pd
import pytest

import ray

from crusty_ray.config import test_config as _tc
from crusty_ray.datagen.webgraph import WebConfig

WEB_CFG = WebConfig(n_domains=50, max_pages_per_domain=14)


def _cfg():
    cfg = _tc()
    cfg.rules.total_link_budget = 20
    cfg.rules.links_per_task_budget = 8
    cfg.rules.max_level = 5
    cfg.engine.max_epochs = 16
    return cfg


def test_actor_death_then_resume(ray_session, tmp_path):
    from crusty_ray.pipelines.crawl import CrawlEngine

    cfg = _cfg()
    full = CrawlEngine(cfg, WEB_CFG, str(tmp_path / "full")).run()

    # crash scenario: run 6 epochs (checkpoint every epoch), then an actor
    # dies; a re-entered run() is refused (continuation is resume())
    eng = CrawlEngine(cfg, WEB_CFG, str(tmp_path / "crash")).run(max_epochs=6)
    ray.kill(eng.actors[1])
    with pytest.raises(Exception):
        eng.run()

    # recovery: fresh engine (fresh actors) restores the checkpointed state
    rec = CrawlEngine.resume(cfg, WEB_CFG, str(tmp_path / "crash")).run()
    assert rec.finished_domains == full.finished_domains
    assert rec.topk_rows == full.topk_rows
    assert rec.seen_filter_bytes() == full.seen_filter_bytes()
    f = full.read_crawl_log().to_pandas().drop(columns=["image_ids"])
    r = rec.read_crawl_log().to_pandas().drop(columns=["image_ids"])
    pd.testing.assert_frame_equal(
        f.sort_values(["epoch", "seq"]).reset_index(drop=True),
        r.sort_values(["epoch", "seq"]).reset_index(drop=True),
        check_dtype=False)


def _assert_matches_full(eng, full):
    assert eng.finished_domains == full.finished_domains
    assert eng.topk_rows == full.topk_rows
    assert eng.seen_filter_bytes() == full.seen_filter_bytes()
    f = full.read_crawl_log().to_pandas().drop(columns=["image_ids"])
    r = eng.read_crawl_log().to_pandas().drop(columns=["image_ids"])
    pd.testing.assert_frame_equal(
        f.sort_values(["epoch", "seq"]).reset_index(drop=True),
        r.sort_values(["epoch", "seq"]).reset_index(drop=True),
        check_dtype=False)


def test_graceful_drain_then_resume(ray_session, tmp_path):
    """request_stop mid-run (the SIGTERM handler's path): the engine drains
    the in-flight epoch, checkpoints, returns; resume completes exactly."""
    import threading
    from crusty_ray.pipelines.crawl import CrawlEngine

    cfg = _cfg()
    full = CrawlEngine(cfg, WEB_CFG, str(tmp_path / "full")).run()

    eng = CrawlEngine(cfg, WEB_CFG, str(tmp_path / "drain"))
    # fire the stop request shortly after the crawl starts — wherever it
    # lands, drain must checkpoint a resumable state
    threading.Timer(0.35, eng.request_stop).start()
    eng.run()
    assert eng._stop_requested
    assert eng.epochs_run < full.epochs_run  # actually stopped early

    rec = CrawlEngine.resume(cfg, WEB_CFG, str(tmp_path / "drain")).run()
    _assert_matches_full(rec, full)


def test_sigterm_handler_drains(ray_session, tmp_path):
    """A real SIGTERM delivered mid-run stops the engine cleanly (no
    exception, checkpoint written) and resume completes exactly."""
    import os
    import signal
    import threading
    from crusty_ray.pipelines.crawl import CrawlEngine

    cfg = _cfg()
    full = CrawlEngine(cfg, WEB_CFG, str(tmp_path / "full2")).run()

    eng = CrawlEngine(cfg, WEB_CFG, str(tmp_path / "sig"))
    prev_handler = signal.getsignal(signal.SIGTERM)
    threading.Timer(0.35, lambda: os.kill(os.getpid(), signal.SIGTERM)).start()
    eng.run()  # handler converts the signal into a drain; no exception
    assert eng.epochs_run < full.epochs_run
    # handler was restored after run()
    assert signal.getsignal(signal.SIGTERM) == prev_handler

    rec = CrawlEngine.resume(cfg, WEB_CFG, str(tmp_path / "sig")).run()
    _assert_matches_full(rec, full)


def test_resume_refuses_resharding(ray_session, tmp_path):
    """Restoring a checkpoint into a different shard_total would misroute
    (or silently drop) hash-partitioned frontier state — resume must
    refuse loudly instead."""
    import dataclasses

    import pytest

    from crusty_ray.config import test_config
    from crusty_ray.pipelines.crawl import CrawlEngine

    cfg = test_config()
    cfg.engine.checkpoint_every_epochs = 1
    cfg.engine.max_epochs = 2
    out = str(tmp_path / "reshard")
    CrawlEngine(cfg, WEB_CFG, out).run(2)

    cfg2 = test_config()
    cfg2.jobs.shard_total = cfg.jobs.shard_total + 1
    cfg2.jobs.shard_max = max(cfg2.jobs.shard_max, cfg2.jobs.shard_total)
    with pytest.raises(ValueError, match="resharding"):
        CrawlEngine.resume(cfg2, WEB_CFG, out)
