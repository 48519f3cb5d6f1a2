"""ShardState unit tests — the redis-queue semantics truth table.

Mirrors the enqueue/dequeue/finish behavior cited from
``workspace/redis-queue/src/lib.rs`` (SURVEY.md §5.1): enqueue skip-cases
(already-pending / same-domain-in-processing / already-seen), one-domain-per-
addr_key politeness, lock TTL expiry, priority ordering, budget enforcement,
delay cadence, and checkpoint/restore equivalence.
"""

from crusty_ray.config import test_config as _tc
from crusty_ray.state.frontier import DomainMsg, ShardState


def mk(**over):
    cfg = _tc()
    cfg.rules.robots_txt = False
    for k, v in over.items():
        obj = cfg
        *parts, last = k.split(".")
        for p in parts:
            obj = getattr(obj, p)
        setattr(obj, last, v)
    return ShardState(0, cfg)


def msg(domain, addr_key="K1", depth=0, epoch=0, url=None):
    return DomainMsg(domain=domain, addr_key=addr_key, shard=0,
                     url=url, disc_depth=depth, disc_epoch=epoch)


def result_row(domain, url, depth=0, links=(), cands=()):
    return {
        "url": url, "domain": domain, "depth": depth, "shard": 0,
        "sched_links": list(links),
        "cand_domains": [c[0] for c in cands],
        "cand_addr_keys": [c[1] for c in cands],
        "cand_shards": [c[2] for c in cands],
    }


class TestEnqueueSkipCases:
    """redis-queue/src/lib.rs:59-95 — the three skip cases."""

    def test_pending_dedup(self):
        s = mk()
        s.enqueue([msg("a.com"), msg("a.com")])
        s.apply_enqueues(0)
        assert s.stats["enqueued"] == 1
        assert s.stats["skipped_pending"] == 1

    def test_skip_same_domain_in_processing(self):
        s = mk()
        s.enqueue([msg("a.com")])
        s.apply_enqueues(0)
        s.take_ready(0)  # a.com now in-processing on K1
        s.enqueue([msg("a.com")])
        s.apply_enqueues(0)
        assert s.stats["skipped_processing"] == 1

    def test_other_domain_same_addr_key_is_queued_but_not_dequeued(self):
        """Politeness: b.com on the same /24 queues fine but cannot start
        while a.com holds the lock (lib.rs:133-141)."""
        s = mk()
        s.enqueue([msg("a.com")])
        s.apply_enqueues(0)
        assert len(s.take_ready(0)) == 1
        s.enqueue([msg("b.com")])
        s.apply_enqueues(0)
        assert s.stats["enqueued"] == 2
        # a.com's job is active -> K1 locked -> b.com must wait
        tasks = s.take_ready(1)
        assert all(t["domain"] == "a.com" for t in tasks)

    def test_skip_seen_after_finish(self):
        s = mk()
        s.enqueue([msg("a.com")])
        s.apply_enqueues(0)
        s.take_ready(0)
        s.absorb([result_row("a.com", "http://a.com/")])
        s.end_epoch(0)  # queue empty -> finished -> marked seen
        assert s.stats["jobs_finished"] == 1
        s.enqueue([msg("a.com")])
        s.apply_enqueues(1)
        assert s.stats["skipped_seen"] == 1

    def test_finish_releases_lock_for_next_domain(self):
        s = mk()
        s.enqueue([msg("a.com"), msg("b.com")])
        s.apply_enqueues(0)
        assert [t["domain"] for t in s.take_ready(0)] == ["a.com"]
        s.absorb([result_row("a.com", "http://a.com/")])
        s.end_epoch(0)
        assert [t["domain"] for t in s.take_ready(1)] == ["b.com"]


class TestPriority:
    def test_depth_then_epoch_then_name(self):
        s = mk()
        s.enqueue([msg("deep.com", "K1", depth=5),
                   msg("shallow.com", "K2", depth=1),
                   msg("old.com", "K3", depth=1, epoch=0)])
        s.apply_enqueues(1)
        # all three on distinct addr_keys -> all dequeue, but candidate order
        # (and truncation under dequeue_limit) follows priority
        s2 = mk(**{"jobs.dequeue_limit": 1})
        s2.enqueue([msg("deep.com", "K1", depth=5),
                    msg("shallow.com", "K2", depth=1)])
        s2.apply_enqueues(0)
        assert [t["domain"] for t in s2.take_ready(0)] == ["shallow.com"]

    def test_within_addr_key_priority(self):
        s = mk()
        s.enqueue([msg("zz.com", "K1", depth=3), msg("aa.com", "K1", depth=1)])
        s.apply_enqueues(0)
        assert [t["domain"] for t in s.take_ready(0)] == ["aa.com"]


class TestLockTtl:
    def test_stale_lock_expires(self):
        s = mk()
        s.lock_ttl_epochs = 5
        s.enqueue([msg("a.com")])
        s.apply_enqueues(0)
        s.take_ready(0)
        # kill the job without finishing (simulates a lost worker), lock remains
        s.jobs.pop("a.com")
        s.enqueue([msg("b.com")])
        s.apply_enqueues(1)
        assert s.take_ready(1) == []          # K1 still locked
        assert [t["domain"] for t in s.take_ready(7)] == ["b.com"]  # TTL expired


class TestBudgets:
    def test_total_link_budget(self):
        s = mk(**{"rules.total_link_budget": 3, "crawl.concurrency": 10})
        s.enqueue([msg("a.com")])
        s.apply_enqueues(0)
        s.take_ready(0)
        links = [f"http://a.com/p{i}" for i in range(10)]
        s.absorb([result_row("a.com", "http://a.com/", links=links)])
        s.end_epoch(0)
        assert s.jobs["a.com"].pages_scheduled == 3

    def test_per_page_budget(self):
        s = mk(**{"rules.links_per_task_budget": 2, "rules.total_link_budget": 100})
        s.enqueue([msg("a.com")])
        s.apply_enqueues(0)
        s.take_ready(0)
        links = [f"http://a.com/p{i}" for i in range(10)]
        s.absorb([result_row("a.com", "http://a.com/", links=links)])
        s.end_epoch(0)
        assert s.jobs["a.com"].pages_scheduled == 2

    def test_url_seen_dedup_within_job(self):
        s = mk()
        s.enqueue([msg("a.com")])
        s.apply_enqueues(0)
        s.take_ready(0)
        s.absorb([result_row("a.com", "http://a.com/",
                             links=["http://a.com/x", "http://a.com/x",
                                    "http://a.com/"])])  # dup + root
        s.end_epoch(0)
        assert s.jobs["a.com"].pages_scheduled == 1

    def test_delay_cadence(self):
        s = mk(**{"crawl.delay_epochs": 3, "crawl.concurrency": 1})
        s.enqueue([msg("a.com")])
        s.apply_enqueues(0)
        assert len(s.take_ready(0)) == 1
        s.absorb([result_row("a.com", "http://a.com/",
                             links=["http://a.com/x", "http://a.com/y"])])
        s.end_epoch(0)
        assert s.take_ready(1) == []  # delay not yet elapsed
        assert s.take_ready(2) == []
        assert len(s.take_ready(3)) == 1


class TestDiscoveryRouting:
    def test_candidates_route_to_target_shard(self):
        s = mk()
        s.enqueue([msg("a.com")])
        s.apply_enqueues(0)
        s.take_ready(0)
        s.absorb([result_row("a.com", "http://a.com/",
                             cands=[("b.org", "KB", 2), ("c.net", "KC", 0),
                                    ("dead.io", "", -1)])])
        res = s.end_epoch(0)
        assert set(res["outgoing"].keys()) == {2, 0}
        assert res["outgoing"][2]["domain"] == ["b.org"]
        # unresolvable (-1) recorded in job links but never routed (M7 drop)

    def test_ddc_suppresses_repeat_discovery(self):
        s = mk()
        s.enqueue([msg("a.com"), msg("x.com", "K9")])
        s.apply_enqueues(0)
        s.take_ready(0)
        s.absorb([result_row("a.com", "http://a.com/", cands=[("b.org", "KB", 2)]),
                  result_row("x.com", "http://x.com/", cands=[("b.org", "KB", 2)])])
        res = s.end_epoch(0)
        assert len(res["outgoing"][2]["domain"]) == 1  # sent once
        # later epoch, a different job rediscovers b.org -> ddc hit, not re-sent
        s.enqueue([msg("y.com", "K8")])
        s.apply_enqueues(0)
        s.take_ready(1)
        s.absorb([result_row("y.com", "http://y.com/",
                             cands=[("b.org", "KB", 2)])])
        res2 = s.end_epoch(1)
        assert 2 not in res2["outgoing"]
        assert s.stats["ddc_hits"] >= 1


class TestCheckpoint:
    def test_roundtrip_preserves_behavior(self):
        s = mk()
        s.enqueue([msg(f"d{i}.com", f"K{i}") for i in range(20)])
        s.apply_enqueues(0)
        s.take_ready(0)
        snap = s.checkpoint()

        s2 = ShardState(0, s.cfg)
        s2.restore(snap)
        # identical future behavior
        a = s.take_ready(1)
        b = s2.take_ready(1)
        assert a == b
        assert s.gauges(1) == s2.gauges(1)
        assert s.cuckoo.to_bytes() == s2.cuckoo.to_bytes()

    def test_restore_recomputes_jitters(self):
        """Checkpoints written before the jitter fields existed unpickle
        with the dataclass default 0 — restore must recompute them from
        (domain, config) so resumed jobs keep their creation-time timeouts
        and politeness delays."""
        from crusty_ray.core.hashing import hash64
        s = mk(**{"crawl.delay_jitter_epochs": 2,
                  "crawl.job_hard_timeout_jitter_epochs": 3})
        s.enqueue([msg("a.com"), msg("jit2.com", "K2")])
        s.apply_enqueues(0)
        s.take_ready(0)
        snap = s.checkpoint()
        # simulate an old-format checkpoint: jobs pickled without the fields
        import pickle
        jobs = pickle.loads(snap["jobs"])
        for job in jobs.values():
            del job.__dict__["hard_jitter"]
            del job.__dict__["delay_jitter"]
        snap["jobs"] = pickle.dumps(jobs, protocol=4)

        s2 = ShardState(0, s.cfg)
        s2.restore(snap)
        assert any(j.hard_jitter or j.delay_jitter
                   for j in s2.jobs.values()) or all(
            hash64(d, seed=13) % 4 == 0 and hash64(d, seed=11) % 3 == 0
            for d in s2.jobs)
        for d, j in s2.jobs.items():
            assert j.hard_jitter == hash64(d, seed=13) % 4
            assert j.delay_jitter == hash64(d, seed=11) % 3


class TestTimeoutsAndJitter:
    def test_soft_timeout_finishes_job(self):
        s = mk(**{"crawl.job_soft_timeout_epochs": 2})
        s.enqueue([msg("a.com")])
        s.apply_enqueues(0)
        s.take_ready(0)
        # keep the job alive with pending queue but never absorb its tail
        s.absorb([result_row("a.com", "http://a.com/",
                             links=[f"http://a.com/p{i}" for i in range(5)])])
        s.end_epoch(0)
        assert "a.com" in s.jobs
        terms = []
        for e in (1, 2, 3, 4):
            tasks = s.take_ready(e)
            # BSP contract: absorb every emitted task (childless results)
            s.absorb([result_row("a.com", t["url"], depth=t["depth"])
                      for t in tasks])
            terms.extend(m["term_by"] for m in s.end_epoch(e)["job_metrics"])
        assert "a.com" not in s.jobs
        assert "soft_timeout" in terms or "done" in terms

    def test_hard_timeout_kills_queued_job(self):
        s = mk(**{"crawl.job_hard_timeout_epochs": 3,
                  "crawl.delay_epochs": 100})  # delay blocks fetching → queue stuck
        s.enqueue([msg("a.com")])
        s.apply_enqueues(0)
        s.take_ready(0)
        s.absorb([result_row("a.com", "http://a.com/",
                             links=["http://a.com/p1"])])
        s.end_epoch(0)
        metrics = []
        for e in range(1, 6):
            s.take_ready(e)
            metrics.extend(s.end_epoch(e)["job_metrics"])
        assert any(m["term_by"] == "hard_timeout" for m in metrics)
        assert "a.com" not in s.jobs

    def test_delay_jitter_deterministic_and_bounded(self):
        from crusty_ray.core.hashing import hash64
        s = mk(**{"crawl.delay_epochs": 1, "crawl.delay_jitter_epochs": 2,
                  "crawl.concurrency": 1})
        s.enqueue([msg("a.com")])
        s.apply_enqueues(0)
        assert len(s.take_ready(0)) == 1
        s.absorb([result_row("a.com", "http://a.com/",
                             links=["http://a.com/p1"])])
        s.end_epoch(0)
        expect_delay = 1 + hash64("a.com", seed=11) % 3
        fetched_at = None
        for e in range(1, 6):
            if s.take_ready(e):
                fetched_at = e
                break
        assert fetched_at == expect_delay
