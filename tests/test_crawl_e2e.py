"""End-to-end conformance: distributed engine ≡ single-threaded simulator.

The BASELINE.md correctness gate: crawl ordering + URL-seen set exact match
under the same seed list + politeness budget, resume ≡ uninterrupted, and the
serialized seen-set filters byte-identical.
"""

import pandas as pd
import pytest

from crusty_ray.config import test_config as _test_config
from crusty_ray.datagen.webgraph import WebConfig
from crusty_ray.sim.simulator import CrawlSimulator

WEB_CFG = WebConfig(n_domains=60, max_pages_per_domain=20)


def small_cfg(**over):
    cfg = _test_config()
    cfg.rules.total_link_budget = 30
    cfg.rules.links_per_task_budget = 10
    cfg.rules.max_level = 6
    cfg.engine.max_epochs = 25
    for k, v in over.items():
        obj = cfg
        *parts, last = k.split(".")
        for p in parts:
            obj = getattr(obj, p)
        setattr(obj, last, v)
    return cfg


@pytest.fixture(scope="module")
def sim_result():
    return CrawlSimulator(small_cfg(), WEB_CFG).run()


def log_df(rows_or_table):
    if hasattr(rows_or_table, "to_pandas"):
        df = rows_or_table.to_pandas()
    else:
        df = pd.DataFrame(rows_or_table)
    df["image_ids"] = df["image_ids"].map(tuple)
    return (df.sort_values(["epoch", "seq"]).reset_index(drop=True)
            .astype({"status_code": "int64", "depth": "int64", "shard": "int64"}))


class TestSimulatorProperties:
    def test_crawl_is_nontrivial(self, sim_result):
        assert len(sim_result.crawl_log) > 300
        assert len(sim_result.finished_domains) > 20
        assert sim_result.epochs_run > 5

    def test_politeness_one_domain_per_addr_key(self):
        """Invariant: never two simultaneously active jobs on one addr_key."""
        cfg = small_cfg()
        sim = CrawlSimulator(cfg, WEB_CFG).seed()
        # instrument: after each epoch every in_processing map is consistent
        msgs_seen = []
        for epoch in range(10):
            tasks = []
            for s in sim.shards:
                tasks.extend(s.take_ready(epoch))
            for s in sim.shards:
                active_keys = [j.addr_key for j in s.jobs.values()]
                assert len(active_keys) == len(set(active_keys)), "politeness violated"
                msgs_seen.append(len(active_keys))
            if not tasks and all(s.idle() for s in sim.shards):
                break
            sim._run_epoch(epoch, tasks)
        assert sum(msgs_seen) > 0

    def test_budgets_respected(self, sim_result):
        cfg = small_cfg()
        by_domain = {}
        for m in sim_result.job_metrics:
            by_domain[m["domain"]] = m
            assert m["pages_scheduled"] <= cfg.rules.total_link_budget
        depth_max = max(r["depth"] for r in sim_result.crawl_log)
        assert depth_max < cfg.rules.max_level

    def test_no_url_fetched_twice_within_job(self, sim_result):
        seen = {}
        for r in sim_result.crawl_log:
            key = (r["domain"], r["url"])
            # a domain may be re-crawled only if it was never finished+seen
            assert key not in seen, f"{key} fetched twice"
            seen[key] = True

    def test_determinism(self):
        a = CrawlSimulator(small_cfg(), WEB_CFG).run()
        b = CrawlSimulator(small_cfg(), WEB_CFG).run()
        assert a.crawl_log == b.crawl_log
        assert a.finished_domains == b.finished_domains
        assert a.topk_rows == b.topk_rows
        assert a.seen_filter_bytes() == b.seen_filter_bytes()


class TestEngineMatchesSimulator:
    def _engine(self, tmp_path, cfg):
        from crusty_ray.pipelines.crawl import CrawlEngine
        return CrawlEngine(cfg, WEB_CFG, str(tmp_path / "out"))

    def test_inline_path_exact_match(self, ray_session, tmp_path, sim_result):
        eng = self._engine(tmp_path, small_cfg()).run()
        edf, sdf = log_df(eng.read_crawl_log()), log_df(sim_result.crawl_log)
        pd.testing.assert_frame_equal(edf, sdf, check_dtype=False)
        assert eng.finished_domains == sim_result.finished_domains
        assert eng.topk_rows == sim_result.topk_rows
        assert eng.job_metrics == sim_result.job_metrics
        assert eng.seen_filter_bytes() == sim_result.seen_filter_bytes()

    def test_ray_dataset_path_exact_match(self, ray_session, tmp_path, sim_result):
        # force every epoch through the distributed Dataset pipeline
        cfg = small_cfg(**{"engine.min_epoch_rows_for_ray": 0,
                           "engine.fetch_batch_size": 16,
                           "engine.fetch_concurrency": 2})
        eng = self._engine(tmp_path, cfg).run()
        edf, sdf = log_df(eng.read_crawl_log()), log_df(sim_result.crawl_log)
        pd.testing.assert_frame_equal(edf, sdf, check_dtype=False)
        assert sorted(eng.finished_domains) == sorted(sim_result.finished_domains)
        assert eng.seen_filter_bytes() == sim_result.seen_filter_bytes()

    def test_multigroup_shards_exact_match(self, ray_session, tmp_path):
        # shard_total > SHARDS_PER_GROUP (8) exercises the grouped
        # absorb/exchange storage layout with MULTIPLE group dirs and
        # cross-group routing — the bench topology (32 shards), previously
        # uncovered by the conformance suite (tests used 4 shards = 1 group)
        cfg = small_cfg(**{"jobs.shard_total": 20, "jobs.shard_max": 20,
                           "engine.min_epoch_rows_for_ray": 0,
                           "engine.fetch_batch_size": 16,
                           "engine.fetch_concurrency": 2})
        sim = CrawlSimulator(cfg, WEB_CFG).run()
        eng = self._engine(tmp_path, cfg).run()
        edf, sdf = log_df(eng.read_crawl_log()), log_df(sim.crawl_log)
        pd.testing.assert_frame_equal(edf, sdf, check_dtype=False)
        assert eng.finished_domains == sim.finished_domains
        assert eng.seen_filter_bytes() == sim.seen_filter_bytes()

    def test_scratch_dir_exact_match(self, ray_session, tmp_path, sim_result):
        # transient exchange on a RAM-backed scratch dir (bench setting) —
        # identical results, and the scratch root is cleaned up afterwards
        import os
        cfg = small_cfg(**{"engine.min_epoch_rows_for_ray": 0,
                           "engine.fetch_batch_size": 16,
                           "engine.scratch_dir": str(tmp_path / "shm")})
        eng = self._engine(tmp_path, cfg).run()
        edf, sdf = log_df(eng.read_crawl_log()), log_df(sim_result.crawl_log)
        pd.testing.assert_frame_equal(edf, sdf, check_dtype=False)
        assert eng.seen_filter_bytes() == sim_result.seen_filter_bytes()
        assert not os.path.exists(eng.scratch)  # cleaned at _write_outputs

    def test_empty_epoch_with_delay_matches_sim(self, ray_session, tmp_path):
        # Regression (ADVICE r1): delay_epochs>1 parks every domain on some
        # epochs → zero ready tasks while shards are NOT idle. The engine used
        # to hit pa.concat_tables([]) (ArrowInvalid) there; it must instead
        # run the barrier like the simulator and stay exact-equal.
        cfg = small_cfg(**{"crawl.delay_epochs": 3, "engine.max_epochs": 60})
        sim = CrawlSimulator(cfg, WEB_CFG).run()
        logged_epochs = {r["epoch"] for r in sim.crawl_log}
        assert len(logged_epochs) < sim.epochs_run  # empty epochs occurred
        eng = self._engine(tmp_path, cfg).run()
        edf, sdf = log_df(eng.read_crawl_log()), log_df(sim.crawl_log)
        pd.testing.assert_frame_equal(edf, sdf, check_dtype=False)
        assert eng.epochs_run == sim.epochs_run
        assert eng.finished_domains == sim.finished_domains
        assert eng.seen_filter_bytes() == sim.seen_filter_bytes()


def test_parallel_seed_resolution_equals_serial(ray_session, tmp_path):
    """>20k seeds resolve via chunked Ray tasks — byte-identical to the
    serial path (pure function, chunked in order)."""
    from crusty_ray.datagen.webgraph import SyntheticWeb
    from crusty_ray.pipelines.crawl import CrawlEngine
    from crusty_ray.sim.simulator import seed_messages

    cfg = small_cfg()
    wc = WebConfig(n_domains=25_000, max_pages_per_domain=4)
    seeds = [f"http://{SyntheticWeb(wc).domain_name(i)}/" for i in range(22_000)]
    eng = CrawlEngine(cfg, wc, str(tmp_path / "o"), seeds=seeds)
    assert eng._resolve_seeds() == seed_messages(seeds, cfg, SyntheticWeb(wc))


class TestAbsorbRetryIdempotent:
    def test_epoch_stage_retry_overwrites(self, tmp_path):
        """A Ray task retry re-executes EpochStage on the same batch; the
        deterministic (epoch, min-seq) file names must make the second
        attempt overwrite, not duplicate (ADVICE r1 #3)."""
        import os
        import pyarrow as pa
        from crusty_ray.pipelines.crawl import EpochStage
        cfg = small_cfg()
        absorb = str(tmp_path / "absorb")
        stage = EpochStage(WEB_CFG, cfg, absorb)
        n = 12
        web_seeds = [f"http://site{i:05d}.com/" for i in range(n)]
        batch = pa.table({
            "url": web_seeds,
            "domain": [u[7:-1] for u in web_seeds],
            "depth": pa.array([0] * n, pa.int32()),
            "shard": pa.array([i % cfg.jobs.shard_total for i in range(n)],
                              pa.int32()),
            "epoch": pa.array([3] * n, pa.int32()),
            "seq": pa.array(range(n), pa.int64()),
        })
        out1 = stage(batch)

        def snapshot():
            got = {}
            for root, _, files in os.walk(absorb):
                for f in files:
                    p = os.path.join(root, f)
                    got[os.path.relpath(p, absorb)] = os.path.getsize(p)
            return got

        files1 = snapshot()
        assert files1, "absorb files written"
        out2 = stage(batch)  # the "retry"
        files2 = snapshot()
        assert files1 == files2  # same names, same sizes — overwritten
        assert out1.equals(out2)  # deterministic log projection
        # total absorbed rows across files == ONE attempt's rows
        import pyarrow.feather as pf
        total = sum(pf.read_table(os.path.join(absorb, rel)).num_rows
                    for rel in files2)
        assert total == n


class TestResume:
    def test_resume_equals_uninterrupted(self, ray_session, tmp_path, sim_result):
        from crusty_ray.pipelines.crawl import CrawlEngine
        cfg = small_cfg()
        # interrupted run: stop after 7 epochs (checkpoint every epoch)
        eng1 = CrawlEngine(cfg, WEB_CFG, str(tmp_path / "o")).run(max_epochs=7)
        assert eng1.epochs_run == 7
        eng2 = CrawlEngine.resume(cfg, WEB_CFG, str(tmp_path / "o")).run()
        edf, sdf = log_df(eng2.read_crawl_log()), log_df(sim_result.crawl_log)
        pd.testing.assert_frame_equal(edf, sdf, check_dtype=False)
        assert eng2.finished_domains == sim_result.finished_domains
        assert eng2.topk_rows == sim_result.topk_rows
        assert eng2.seen_filter_bytes() == sim_result.seen_filter_bytes()


def test_compact_log_at_end(ray_session, tmp_path):
    """engine.compact_log_at_end: the drain rewrites the per-epoch/per-block
    crawl_log small files into ~64 MiB compact files BESIDE the resumable
    epoch layout — same rows, same content (r3 VERDICT consistency sweep)."""
    import duckdb
    from crusty_ray.pipelines.crawl import CrawlEngine

    cfg = small_cfg(**{"engine.compact_log_at_end": True})
    eng = CrawlEngine(cfg, WEB_CFG, str(tmp_path / "out")).run()
    summary = eng.compaction_summary
    assert int(summary["rows"][0]) == eng.read_crawl_log().num_rows
    assert int(summary["out_files"][0]) >= 1
    assert int(summary["in_files"][0]) > int(summary["out_files"][0])
    a = duckdb.sql(f"select epoch, domain, url from read_parquet('{tmp_path}/out/crawl_log/*/*.parquet') order by 1,2,3").df()
    b = duckdb.sql(f"select epoch, domain, url from read_parquet('{tmp_path}/out/crawl_log_compact/*.parquet') order by 1,2,3").df()
    assert a.astype({"epoch": "int64"}).equals(b.astype({"epoch": "int64"}))
