"""The epochal BSP crawl engine — Ray Data composition of the crawl semantics.

Replaces the reference's dataflow graph of ~20 tokio tasks + redis + ClickHouse
(``workspace/main/src/crusty.rs:514-592``) with, per epoch:

1. **take_ready** on every frontier shard actor → this epoch's fetch tasks
   (politeness + priority + budgets enforced inside the shard, SURVEY §3.4);
2. a streaming Dataset pipeline
   ``from_arrow(tasks) → map_batches(FetchStage) → map_batches(DiscoverStage)
   → map_batches(RouterStage) → write_parquet(crawl_log/epoch=N)`` —
   zero-copy Arrow batches, actor pools for the stateful stages, single pass
   (the router absorbs results into the owning shard actor and projects the
   crawl-log columns for the sink);
3. the epoch barrier: ``end_epoch`` on every shard (deterministic expansion +
   finishes), driver-mediated cross-shard enqueue messages (small descriptor
   rows only — the reference's interop::Domain JSON), ``apply_enqueues``;
4. top-k decay/add/snapshot, queue gauges, and a full checkpoint every
   ``checkpoint_every_epochs`` (frontier + seen segments + top-k + lineage →
   exact resume, SURVEY §7.4.6).

Epochs below ``engine.min_epoch_rows_for_ray`` rows run inline on the driver
with the *same stage objects* (task-launch overhead would dominate); the Ray
path and inline path are semantically identical and both are conformance-
tested against the simulator oracle.
"""

from __future__ import annotations

import json
import os
import pickle
from typing import Optional

import pyarrow as pa
import pyarrow.parquet as pq

import ray

from ..config import Config
from ..datagen.webgraph import SyntheticWeb, WebConfig
from ..sim.simulator import seed_messages
from ..stages.discover import DiscoverStage
from ..stages.fetch import FetchStage
from ..state.frontier import DomainMsg, ShardState
from .topk import TopKState

LOG_COLUMNS = [
    "epoch", "seq", "url", "domain", "depth", "shard", "status_code",
    "content_type", "read_size_b", "fetch_ms", "redirects", "term_by",
    "n_links", "image_ids",
]


@ray.remote
class FrontierShardActor:
    """Thin Ray wrapper around ShardState — one actor per shard (§7.2)."""

    def __init__(self, shard: int, cfg: Config, web_cfg: WebConfig):
        self.state = ShardState(shard, cfg, web_cfg)

    def enqueue(self, msgs: list[DomainMsg]) -> None:
        self.state.enqueue(msgs)

    def apply_enqueues(self, epoch: int) -> None:
        self.state.apply_enqueues(epoch)

    def take_ready(self, epoch: int) -> list[dict]:
        return self.state.take_ready(epoch)

    def absorb(self, rows: list[dict]) -> int:
        return self.state.absorb(rows)

    def end_epoch(self, epoch: int) -> dict:
        return self.state.end_epoch(epoch)

    def gauges(self, epoch: int) -> dict:
        return self.state.gauges(epoch)

    def idle(self) -> bool:
        return self.state.idle()

    def checkpoint(self) -> dict:
        return self.state.checkpoint()

    def restore(self, snap: dict) -> None:
        self.state.restore(snap)

    def seen_filter_bytes(self) -> bytes:
        return self.state.cuckoo.to_bytes()


class RouterStage:
    """Routes fetch results to their owning shard actor and projects the
    crawl-log columns for the parquet sink. The blocking ``ray.get`` on the
    absorb acks gives the epoch barrier its happens-before edge: when the
    epoch's Dataset finishes, every result row has reached its shard."""

    def __init__(self, handles: list):
        self.handles = handles

    def __call__(self, batch: pa.Table) -> pa.Table:
        shards = batch["shard"].to_pylist()
        rows = batch.to_pylist()
        by_shard: dict[int, list[dict]] = {}
        for s, r in zip(shards, rows):
            by_shard.setdefault(s, []).append(r)
        ray.get([self.handles[s].absorb.remote(rs) for s, rs in by_shard.items()])
        return log_projection(batch)


def log_projection(batch: pa.Table) -> pa.Table:
    n_links = pa.array([len(x) if x is not None else 0
                        for x in batch["links"].to_pylist()], pa.int32())
    batch = batch.append_column("n_links", n_links)
    return batch.select(LOG_COLUMNS)


class CrawlEngine:
    def __init__(self, cfg: Config, web_cfg: WebConfig, out_dir: str,
                 seeds: Optional[list[str]] = None):
        self.cfg = cfg
        self.web_cfg = web_cfg
        self.out_dir = out_dir
        self.web = SyntheticWeb(web_cfg)
        self.seeds = seeds if seeds is not None else self.web.seeds()
        os.makedirs(f"{out_dir}/crawl_log", exist_ok=True)
        os.makedirs(f"{out_dir}/checkpoints", exist_ok=True)

        self.actors = [
            FrontierShardActor.remote(s, cfg, web_cfg)
            for s in range(cfg.jobs.shard_total)
        ]
        self.topk = TopKState(cfg.topk)
        self.job_metrics: list[dict] = []
        self.topk_rows: list[dict] = []
        self.gauges: list[dict] = []
        self.finished_domains: list[str] = []
        self.start_epoch = 0
        self.epochs_run = 0
        # inline-path stage objects (same classes the Ray path instantiates)
        self._fetcher = FetchStage(web_cfg, cfg)
        self._discoverer = DiscoverStage(web_cfg, cfg)

    # ------------------------------------------------------------------ run
    def run(self, max_epochs: Optional[int] = None) -> "CrawlEngine":
        cfg = self.cfg
        max_epochs = max_epochs or cfg.engine.max_epochs
        if self.start_epoch == 0:
            msgs = seed_messages(self.seeds, cfg, self.web)
            by_shard: dict[int, list[DomainMsg]] = {}
            for m in msgs:
                by_shard.setdefault(m.shard, []).append(m)
            ray.get([self.actors[s].enqueue.remote(ms) for s, ms in by_shard.items()])
            ray.get([a.apply_enqueues.remote(0) for a in self.actors])

        # max_epochs is the absolute epoch horizon (resume continues toward the
        # same horizon the uninterrupted run would have had)
        for epoch in range(self.start_epoch, max_epochs):
            task_lists = ray.get([a.take_ready.remote(epoch) for a in self.actors])
            tasks = [t for lst in task_lists for t in lst]
            if not tasks and all(ray.get([a.idle.remote() for a in self.actors])):
                break
            self._run_epoch(epoch, tasks)
            self.epochs_run = epoch + 1
            if (epoch + 1) % cfg.engine.checkpoint_every_epochs == 0:
                self._write_checkpoint(epoch)
        self._write_outputs()
        return self

    def _task_table(self, epoch: int, tasks: list[dict]) -> pa.Table:
        return pa.table({
            "url": [t["url"] for t in tasks],
            "domain": [t["domain"] for t in tasks],
            "depth": pa.array([t["depth"] for t in tasks], pa.int32()),
            "shard": pa.array([t["shard"] for t in tasks], pa.int32()),
            "epoch": pa.array([epoch] * len(tasks), pa.int32()),
            "seq": pa.array(range(len(tasks)), pa.int64()),
        })

    def _run_epoch(self, epoch: int, tasks: list[dict]) -> None:
        cfg = self.cfg
        table = self._task_table(epoch, tasks)
        log_dir = f"{self.out_dir}/crawl_log/epoch={epoch}"

        if len(tasks) < cfg.engine.min_epoch_rows_for_ray:
            # inline fast path: identical stage objects, no task launches
            out = self._fetcher(table)
            out = self._discoverer(out)
            rows = out.to_pylist()
            by_shard: dict[int, list[dict]] = {}
            for r in rows:
                by_shard.setdefault(r["shard"], []).append(r)
            ray.get([self.actors[s].absorb.remote(rs) for s, rs in by_shard.items()])
            os.makedirs(log_dir, exist_ok=True)
            pq.write_table(log_projection(out), f"{log_dir}/part-0.parquet")
        else:
            # split the task table into ~fetch_concurrency blocks: map_batches
            # parallelism is per BLOCK, and a single from_arrow table is one
            # block (measured: 1-block epoch runs serial, 4.7s vs 0.5s)
            nblocks = max(1, min(cfg.engine.fetch_concurrency * 2,
                                 len(tasks) // 64 + 1))
            step = (len(tasks) + nblocks - 1) // nblocks
            chunks = [table.slice(i, step) for i in range(0, len(tasks), step)]
            ds = ray.data.from_arrow(chunks)
            # instance-passed stages = stateless Ray tasks. The classes remain
            # actor-pool-ready (pass the CLASS + concurrency for a deployment
            # whose fetch state — HTTP sessions, robots caches — is expensive);
            # with the synthetic web the state is a pure function and task
            # mode avoids re-spinning an actor pool every epoch.
            ds = ds.map_batches(FetchStage(self.web_cfg, cfg),
                                batch_format="pyarrow",
                                batch_size=cfg.engine.fetch_batch_size)
            ds = ds.map_batches(DiscoverStage(self.web_cfg, cfg),
                                batch_format="pyarrow",
                                batch_size=cfg.engine.fetch_batch_size)
            ds = ds.map_batches(RouterStage(self.actors),
                                batch_format="pyarrow",
                                batch_size=cfg.engine.fetch_batch_size)
            try:  # few large files per epoch partition, not one per block
                ds.write_parquet(log_dir, min_rows_per_file=1 << 20)
            except TypeError:  # older Ray: num_rows_per_file
                ds.write_parquet(log_dir, num_rows_per_file=1 << 20)

        # ---- epoch barrier
        self.topk.advance_epoch()
        results = ray.get([a.end_epoch.remote(epoch) for a in self.actors])
        all_links: list[tuple[str, list[str]]] = []
        outgoing: dict[int, list[DomainMsg]] = {}
        for res in results:  # actor order = shard order (deterministic merge)
            all_links.extend(res["domain_links"])
            self.job_metrics.extend(res["job_metrics"])
            self.finished_domains.extend(m["domain"] for m in res["job_metrics"])
            for tgt, msgs in res["outgoing"].items():
                outgoing.setdefault(tgt, []).extend(msgs)
        self.topk.add_domain_links(all_links)
        if (epoch + 1) % cfg.topk.consume_every_epochs == 0:
            self.topk_rows.extend(self.topk.snapshot(epoch))
        ray.get([self.actors[t].enqueue.remote(ms) for t, ms in outgoing.items()])
        ray.get([a.apply_enqueues.remote(epoch) for a in self.actors])
        self.gauges.extend(ray.get([a.gauges.remote(epoch) for a in self.actors]))

    # ------------------------------------------------------------- checkpoint
    def _write_checkpoint(self, epoch: int) -> None:
        snaps = ray.get([a.checkpoint.remote() for a in self.actors])
        blob = pickle.dumps({
            "epoch": epoch,
            "shards": snaps,
            "topk": self.topk.checkpoint(),
            "job_metrics": self.job_metrics,
            "topk_rows": self.topk_rows,
            "gauges": self.gauges,
            "finished_domains": self.finished_domains,
        }, protocol=4)
        path = f"{self.out_dir}/checkpoints/epoch_{epoch:06d}.pkl"
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(blob)
        os.replace(tmp, path)  # atomic: a torn write never becomes a checkpoint
        with open(f"{self.out_dir}/checkpoints/LATEST.tmp", "w") as f:
            f.write(os.path.basename(path))
        os.replace(f"{self.out_dir}/checkpoints/LATEST.tmp",
                   f"{self.out_dir}/checkpoints/LATEST")

    @classmethod
    def resume(cls, cfg: Config, web_cfg: WebConfig, out_dir: str,
               seeds: Optional[list[str]] = None) -> "CrawlEngine":
        """Exact resume from the latest checkpoint (north_rule requirement)."""
        with open(f"{out_dir}/checkpoints/LATEST") as f:
            name = f.read().strip()
        with open(f"{out_dir}/checkpoints/{name}", "rb") as f:
            snap = pickle.loads(f.read())
        eng = cls(cfg, web_cfg, out_dir, seeds=seeds)
        ray.get([a.restore.remote(s) for a, s in zip(eng.actors, snap["shards"])])
        eng.topk.restore(snap["topk"])
        eng.job_metrics = snap["job_metrics"]
        eng.topk_rows = snap["topk_rows"]
        eng.gauges = snap["gauges"]
        eng.finished_domains = snap["finished_domains"]
        eng.start_epoch = snap["epoch"] + 1
        eng.epochs_run = eng.start_epoch  # summary stays correct if no new epochs run
        # drop crawl-log partitions written after the checkpoint (stale lineage)
        for d in os.listdir(f"{out_dir}/crawl_log"):
            if d.startswith("epoch=") and int(d.split("=")[1]) > snap["epoch"]:
                import shutil
                shutil.rmtree(f"{out_dir}/crawl_log/{d}")
        return eng

    # ------------------------------------------------------------- outputs
    def _write_outputs(self) -> None:
        def write(rows: list[dict], name: str) -> None:
            if rows:
                pq.write_table(pa.Table.from_pylist(rows), f"{self.out_dir}/{name}.parquet")

        write(self.job_metrics, "metrics_job")
        write(self.topk_rows, "domain_topk")
        write(self.gauges, "metrics_queue")
        with open(f"{self.out_dir}/summary.json", "w") as f:
            json.dump({
                "epochs_run": self.epochs_run,
                "pages_fetched": sum(m["pages_fetched"] for m in self.job_metrics),
                "jobs_finished": len(self.finished_domains),
                "topk_rows": len(self.topk_rows),
            }, f, indent=2)

    def read_crawl_log(self) -> pa.Table:
        import pyarrow.dataset as pads
        # epoch/seq live in the files themselves; the epoch=N dirs are just
        # the resumable-partition layout, not hive columns
        ds = pads.dataset(f"{self.out_dir}/crawl_log", format="parquet")
        t = ds.to_table()
        idx = pa.compute.sort_indices(
            t, sort_keys=[("epoch", "ascending"), ("seq", "ascending")])
        return t.take(idx)

    def seen_filter_bytes(self) -> list[bytes]:
        return ray.get([a.seen_filter_bytes.remote() for a in self.actors])
