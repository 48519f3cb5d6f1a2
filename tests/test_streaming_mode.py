"""Streaming (non-BSP) mode e2e: set-equality with BSP mode.

With non-binding budgets both modes must fetch the identical URL set, finish
the identical domain set, and agree on totals — the streaming-mode
correctness contract (see pipelines/streaming.py docstring). Epoch/seq/depth
assignments may legitimately differ (free-running absorb order).
"""

import pandas as pd

from crusty_ray.config import test_config as _tc
from crusty_ray.datagen.webgraph import WebConfig

WEB_CFG = WebConfig(n_domains=50, max_pages_per_domain=12)


def _cfg(mode: str):
    cfg = _tc()
    # budgets must NOT bind for cross-mode set-equality (module docstring)
    cfg.rules.total_link_budget = 1000
    cfg.rules.links_per_task_budget = 100
    cfg.rules.max_level = 12
    # the permit horizon must ALSO be non-binding: streaming mode lags the
    # frontier by its in-flight window (a permit dequeued before barrier N
    # cannot see N's discoveries), so full coverage takes more permits than
    # BSP epochs — measured 68 permits vs 40 epochs on this web. Both modes
    # stop early at idle, so a high ceiling costs nothing.
    cfg.engine.max_epochs = 200
    cfg.engine.mode = mode
    return cfg


def test_streaming_matches_bsp_sets(ray_session, tmp_path):
    from crusty_ray.pipelines.streaming import make_engine

    bsp = make_engine(_cfg("bsp"), WEB_CFG, str(tmp_path / "bsp")).run()
    stream = make_engine(_cfg("streaming"), WEB_CFG,
                         str(tmp_path / "stream")).run()
    assert type(stream).__name__ == "StreamingCrawlEngine"

    blog = bsp.read_crawl_log().to_pandas()
    slog = stream.read_crawl_log().to_pandas()
    # each (domain, url) fetched at most once — URL dedup is per-JOB
    # (reference F1 semantics), so the same bare-host URL may legitimately
    # be fetched by both the www.X and X jobs in EITHER mode
    assert not slog.duplicated(["domain", "url"]).any()
    # identical (domain, url) multiset — stronger than URL-set equality
    assert (sorted(zip(slog["domain"], slog["url"]))
            == sorted(zip(blog["domain"], blog["url"])))
    # identical finished-domain set and totals
    assert sorted(stream.finished_domains) == sorted(bsp.finished_domains)
    assert (sum(m["pages_fetched"] for m in stream.job_metrics)
            == sum(m["pages_fetched"] for m in bsp.job_metrics))
    # per-domain page sets identical too (stronger than global set equality)
    b_by = blog.groupby("domain")["url"].apply(set)
    s_by = slog.groupby("domain")["url"].apply(set)
    pd.testing.assert_series_equal(b_by, s_by, check_names=False)
    # semantically-equal seen sets: every finished domain is in some shard's
    # cuckoo filter in both modes
    import ray as _ray  # noqa: F401
    for eng in (bsp, stream):
        from crusty_ray.state.cuckoo import CuckooFilter
        filters = [CuckooFilter.from_bytes(b) for b in eng.seen_filter_bytes()]
        for d in eng.finished_domains:
            assert any(d in f for f in filters)


def test_streaming_with_delay_settles(ray_session, tmp_path):
    """delay_epochs>1 parks every domain on some permits → the settle
    branch (zero tasks, empty window, non-idle shards) must keep the clock
    advancing and the crawl completing with BSP-equal sets."""
    from crusty_ray.pipelines.streaming import make_engine

    def delayed(mode):
        cfg = _cfg(mode)
        cfg.crawl.delay_epochs = 2
        cfg.engine.max_epochs = 120
        return cfg

    bsp = make_engine(delayed("bsp"), WEB_CFG, str(tmp_path / "b")).run()
    stream = make_engine(delayed("streaming"), WEB_CFG,
                         str(tmp_path / "s")).run()
    blog = bsp.read_crawl_log().to_pandas()
    slog = stream.read_crawl_log().to_pandas()
    assert (sorted(zip(slog["domain"], slog["url"]))
            == sorted(zip(blog["domain"], blog["url"])))
    assert sorted(stream.finished_domains) == sorted(bsp.finished_domains)


def test_streaming_drain_and_resume(ray_session, tmp_path):
    """request_stop mid-stream: drain the window, checkpoint at the quiesce
    point, and a resumed run completes with the same final sets as BSP."""
    import threading
    from crusty_ray.pipelines.streaming import StreamingCrawlEngine, make_engine

    bsp = make_engine(_cfg("bsp"), WEB_CFG, str(tmp_path / "bspref")).run()

    cfg = _cfg("streaming")
    eng = make_engine(cfg, WEB_CFG, str(tmp_path / "sd"))
    threading.Timer(0.4, eng.request_stop).start()
    eng.run()
    assert eng.epochs_run < bsp.epochs_run or eng._stop_requested

    rec = StreamingCrawlEngine.resume(cfg, WEB_CFG, str(tmp_path / "sd")).run()
    rlog = rec.read_crawl_log().to_pandas()
    blog = bsp.read_crawl_log().to_pandas()
    assert not rlog.duplicated(["domain", "url"]).any()
    assert (sorted(zip(rlog["domain"], rlog["url"]))
            == sorted(zip(blog["domain"], blog["url"])))
    assert sorted(rec.finished_domains) == sorted(bsp.finished_domains)


def test_streaming_overlaps_permits(ray_session, tmp_path):
    """The window must actually overlap: with streaming_window=1 the loop
    degrades to sequential; with the default it must still terminate and
    produce a complete crawl (sanity against deadlock)."""
    from crusty_ray.pipelines.streaming import make_engine

    cfg = _cfg("streaming")
    cfg.engine.streaming_window = 2
    cfg.engine.min_epoch_rows_for_ray = 0  # force Dataset pipelines
    eng = make_engine(cfg, WEB_CFG, str(tmp_path / "s2")).run()
    assert eng.epochs_run > 2
    log = eng.read_crawl_log().to_pandas()
    assert len(log) > 100
    assert not log.duplicated(["domain", "url"]).any()


def test_streaming_writer_failure_transient_replayed(ray_session, tmp_path,
                                                     monkeypatch):
    """r4 VERDICT wrong #1: a permit's ``write_parquet`` failure inside the
    daemon thread must NOT be swallowed. Transient case: the one idempotent
    replay succeeds and the final crawl is bit-identical to BSP — zero
    silently-missing log rows."""
    import ray as _ray
    from crusty_ray.pipelines.streaming import make_engine

    bsp = make_engine(_cfg("bsp"), WEB_CFG, str(tmp_path / "bspref")).run()

    cfg = _cfg("streaming")
    cfg.engine.min_epoch_rows_for_ray = 0  # force Dataset permit pipelines
    orig = _ray.data.Dataset.write_parquet
    state = {"failed": 0}

    def flaky(self, path, *a, **kw):
        if "crawl_log" in str(path) and state["failed"] < 1:
            state["failed"] += 1
            raise OSError("injected transient sink failure")
        return orig(self, path, *a, **kw)

    monkeypatch.setattr(_ray.data.Dataset, "write_parquet", flaky)
    eng = make_engine(cfg, WEB_CFG, str(tmp_path / "flaky")).run()
    assert state["failed"] == 1  # the injection actually fired

    slog = eng.read_crawl_log().to_pandas()
    blog = bsp.read_crawl_log().to_pandas()
    assert not slog.duplicated(["domain", "url"]).any()  # replay didn't dupe
    assert (sorted(zip(slog["domain"], slog["url"]))
            == sorted(zip(blog["domain"], blog["url"])))
    assert sorted(eng.finished_domains) == sorted(bsp.finished_domains)


def test_streaming_writer_failure_persistent_aborts(ray_session, tmp_path,
                                                    monkeypatch):
    """Persistent sink failure: initial attempt and the replay both fail →
    the run must abort LOUDLY at the permit barrier (never apply the permit
    as if its rows were written)."""
    import pytest
    import ray as _ray
    from crusty_ray.pipelines.streaming import make_engine

    cfg = _cfg("streaming")
    cfg.engine.min_epoch_rows_for_ray = 0
    orig = _ray.data.Dataset.write_parquet

    def broken(self, path, *a, **kw):
        if "crawl_log" in str(path):
            raise OSError("injected persistent sink failure")
        return orig(self, path, *a, **kw)

    monkeypatch.setattr(_ray.data.Dataset, "write_parquet", broken)
    eng = make_engine(cfg, WEB_CFG, str(tmp_path / "broken"))
    with pytest.raises(RuntimeError, match="replay also failed"):
        eng.run()


def test_streaming_inline_failure_aborts(ray_session, tmp_path):
    """Inline-path (direct-RPC absorb) failure is not replayable — the run
    must abort loudly telling the operator to resume from checkpoint."""
    import pytest
    from crusty_ray.pipelines.streaming import make_engine

    cfg = _cfg("streaming")  # default min_epoch_rows_for_ray → inline path
    eng = make_engine(cfg, WEB_CFG, str(tmp_path / "inl"))

    def boom(*a, **kw):
        raise OSError("injected inline failure")

    eng.run_inline_tasks = boom
    with pytest.raises(RuntimeError, match="not replayable"):
        eng.run()


def test_streaming_periodic_checkpoint_hard_crash(ray_session, tmp_path):
    """streaming_checkpoint_every_permits > 0: a hard mid-run crash (no
    drain, no final checkpoint — the engine dies between periodic
    checkpoints) must leave a resumable state; the resumed crawl's final
    sets equal BSP's."""
    from crusty_ray.pipelines.streaming import StreamingCrawlEngine, make_engine

    bsp = make_engine(_cfg("bsp"), WEB_CFG, str(tmp_path / "bspref")).run()

    cfg = _cfg("streaming")
    cfg.engine.streaming_checkpoint_every_permits = 4

    class Boom(RuntimeError):
        pass

    eng = make_engine(cfg, WEB_CFG, str(tmp_path / "hc"))
    orig = eng._launch
    calls = {"n": 0}

    def crashing_launch(*a, **kw):
        calls["n"] += 1
        if calls["n"] > 6:  # past the first periodic checkpoint (permit 3)
            raise Boom()    # driver dies: no drain, no final checkpoint
        return orig(*a, **kw)

    eng._launch = crashing_launch
    try:
        eng.run()
    except Boom:
        pass
    assert calls["n"] > 6  # the crash actually fired mid-run

    # the periodic checkpoint (permit 3) is the latest durable state
    with open(tmp_path / "hc" / "checkpoints" / "LATEST") as f:
        assert f.read().strip() == "epoch_000003"

    rec = StreamingCrawlEngine.resume(cfg, WEB_CFG, str(tmp_path / "hc")).run()
    rlog = rec.read_crawl_log().to_pandas()
    blog = bsp.read_crawl_log().to_pandas()
    assert not rlog.duplicated(["domain", "url"]).any()
    assert (sorted(zip(rlog["domain"], rlog["url"]))
            == sorted(zip(blog["domain"], blog["url"])))
    assert sorted(rec.finished_domains) == sorted(bsp.finished_domains)
