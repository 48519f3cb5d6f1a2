"""MetricsSpool + no-driver-accumulator contract (r2 VERDICT #1).

The reference streams all telemetry continuously through bounded buffered
writers (clickhouse_utils.rs:37-121); the engine's analog is per-epoch
parquet partitions with O(buffer) driver memory. These tests pin (a) the
spool's flush/read/drop semantics and (b) that a crawl run leaves no
run-length lists on the driver while telemetry survives, in order, on disk.
"""

import os

from crusty_ray.config import test_config as _test_config
from crusty_ray.datagen.webgraph import WebConfig
from crusty_ray.pipelines.spool import MetricsSpool
from crusty_ray.sim.simulator import CrawlSimulator

WEB_CFG = WebConfig(n_domains=60, max_pages_per_domain=20)


def small_cfg():
    cfg = _test_config()
    cfg.rules.total_link_budget = 30
    cfg.rules.links_per_task_budget = 10
    cfg.rules.max_level = 6
    cfg.engine.max_epochs = 25
    return cfg


class TestSpoolUnit:
    def test_flush_read_order(self, tmp_path):
        sp = MetricsSpool(str(tmp_path), {"a": "dir_a"}, flush_rows=3)
        rows = [{"i": i} for i in range(10)]
        sp.add("a", rows[:4])
        sp.maybe_flush(0)                       # 4 ≥ 3 → flushed
        assert sp.buf["a"] == []
        sp.add("a", rows[4:6])
        sp.maybe_flush(1)                       # 2 < 3 → buffered
        assert len(sp.buf["a"]) == 2
        sp.add("a", rows[6:])
        sp.flush_all(2)
        assert sp.read("a") == rows             # append order preserved
        assert sp.rows_total["a"] == 10
        parts = sorted(os.listdir(tmp_path / "dir_a"))
        assert parts == ["part-e000000-00.parquet", "part-e000002-00.parquet"]

    def test_same_epoch_double_flush_keeps_both(self, tmp_path):
        sp = MetricsSpool(str(tmp_path), {"a": "dir_a"}, flush_rows=2)
        sp.add("a", [{"i": 0}, {"i": 1}])
        sp.maybe_flush(5)
        sp.add("a", [{"i": 2}])
        sp.flush_all(5)                         # same epoch, new file
        assert sp.read("a") == [{"i": 0}, {"i": 1}, {"i": 2}]
        parts = sorted(os.listdir(tmp_path / "dir_a"))
        assert parts == ["part-e000005-00.parquet", "part-e000005-01.parquet"]

    def test_drop_after(self, tmp_path):
        sp = MetricsSpool(str(tmp_path), {"a": "dir_a"})
        for e in range(4):
            sp.add("a", [{"e": e}])
            sp.flush_all(e)
        sp.add("a", [{"e": 99}])                # unflushed tail
        sp.drop_after(1)
        assert sp.read("a") == [{"e": 0}, {"e": 1}]
        assert sp.rows_total["a"] == 2

    def test_drop_after_wide_epoch_numbers(self, tmp_path):
        """Filenames widen past 6 digits at epoch 10^6 ({epoch:06d}); the
        resume-time parse must read the full number, not a fixed slice."""
        sp = MetricsSpool(str(tmp_path), {"a": "dir_a"})
        for e in (999_999, 1_234_567, 2_000_001):
            sp.add("a", [{"e": e}])
            sp.flush_all(e)
        sp.drop_after(1_234_567)
        assert sp.read("a") == [{"e": 999_999}, {"e": 1_234_567}]
        assert sp.rows_total["a"] == 2

    def test_reset(self, tmp_path):
        sp = MetricsSpool(str(tmp_path), {"a": "dir_a"})
        sp.add("a", [{"i": 1}])
        sp.flush_all(0)
        sp.reset()
        assert sp.read("a") == []
        assert not os.path.isdir(tmp_path / "dir_a")


class TestEngineStreamsTelemetry:
    def test_run_leaves_no_driver_lists_and_partitions_on_disk(
            self, ray_session, tmp_path):
        from crusty_ray.pipelines.crawl import CrawlEngine
        cfg = small_cfg()
        cfg.topk.consume_every_epochs = 5
        # tiny buffer: force several mid-run flushes
        eng = CrawlEngine(cfg, WEB_CFG, str(tmp_path / "o"))
        eng.spool.flush_rows = 20
        eng.run()
        sim = CrawlSimulator(cfg, WEB_CFG).run()

        # telemetry equality with the oracle — now via read-back properties
        assert eng.finished_domains == sim.finished_domains
        assert eng.job_metrics == sim.job_metrics
        assert eng.topk_rows == sim.topk_rows

        # partitions exist (several per stream, flushed mid-run) and the
        # driver buffers are drained — no run-length state
        jm_dir = tmp_path / "o" / "metrics_job"
        assert len(os.listdir(jm_dir)) >= 2
        for s in eng.spool.streams:
            assert eng.spool.buf[s] == []
        # the engine exposes telemetry as properties, not stored lists
        assert isinstance(type(eng).job_metrics, property)
        assert isinstance(type(eng).topk_rows, property)

        # summary counters match without rereading telemetry
        import json
        with open(tmp_path / "o" / "summary.json") as f:
            summ = json.load(f)
        assert summ["pages_fetched"] == sum(
            m["pages_fetched"] for m in sim.job_metrics)
        assert summ["jobs_finished"] == len(sim.finished_domains)
        assert summ["topk_rows"] == len(sim.topk_rows)

    def test_resume_with_small_buffers(self, ray_session, tmp_path):
        from crusty_ray.pipelines.crawl import CrawlEngine
        cfg = small_cfg()
        cfg.engine.checkpoint_every_epochs = 3
        cfg.topk.consume_every_epochs = 4
        full = CrawlEngine(cfg, WEB_CFG, str(tmp_path / "full")).run()
        part = CrawlEngine(cfg, WEB_CFG, str(tmp_path / "o"))
        part.spool.flush_rows = 10
        part.run(max_epochs=7)
        rec = CrawlEngine.resume(cfg, WEB_CFG, str(tmp_path / "o"))
        rec.spool.flush_rows = 10
        rec.run()
        assert rec.finished_domains == full.finished_domains
        assert rec.topk_rows == full.topk_rows
        assert rec.job_metrics == full.job_metrics

    def test_fresh_run_clears_stale_crawl_log(self, ray_session, tmp_path):
        """A fresh (non-resume) run over a reused out_dir must not
        double-count: parquet sink filenames are unique per run, so stale
        epoch partitions would otherwise survive alongside the new ones."""
        from crusty_ray.pipelines.crawl import CrawlEngine
        cfg = small_cfg()
        cfg.engine.max_epochs = 6
        out = str(tmp_path / "o")
        first = CrawlEngine(cfg, WEB_CFG, out).run()
        n_first = first.read_crawl_log().num_rows
        second = CrawlEngine(cfg, WEB_CFG, out).run()
        assert second.read_crawl_log().num_rows == n_first  # not 2x
