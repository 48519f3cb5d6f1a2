"""Domain discovery — vectorized filter-map + synthetic DNS resolve + shard.

Per fetched page, the reference's result handler runs ``domain_filter_map``
over every parsed link (``workspace/main/src/crusty.rs:250-274``): host, basic
validity (len ≥ 4, contains '.', != task domain), IANA TLD membership, then
job-state accumulation and LRU dedup, then DNS resolution and sharding
(``crusty.rs:405-432``, ``types.rs:22-55``).

Here the *pure* parts run vectorized in a stateless ``map_batches`` stage:
basic filter + TLD check + synthetic DNS resolve + addr_key/shard. The
*stateful* parts (per-job linked-domain accumulation, node LRU, bloom gate,
pending dedup) stay in the frontier shard actor, which receives the candidate
columns alongside the fetch result row.

At real scale the DNS resolve would be an actor-pool stage with bounded
concurrency (reference resolver pool, conf/default.yaml:258-261); with a
synthetic web it is pure compute. A broadcast bloom snapshot of the seen set
would pre-filter candidates before the shuffle — the authoritative check stays
at the owning shard either way.
"""

from __future__ import annotations

import pyarrow as pa

from ..config import Config
from ..core.sharding import resolve_domain_row
from ..core.tld import DEFAULT_TLD_SET
from ..core.urls import host_of
from ..datagen.webgraph import SyntheticWeb, WebConfig

CANDIDATE_FIELDS = [
    ("cand_domains", pa.list_(pa.string())),
    ("cand_addr_keys", pa.list_(pa.string())),
    ("cand_shards", pa.list_(pa.int32())),
]


class DiscoverStage:
    """Appends candidate-domain columns to fetch-result batches."""

    def __init__(self, web_cfg: WebConfig, cfg: Config):
        self.web = SyntheticWeb(web_cfg)
        self.cfg = cfg
        self.tlds = DEFAULT_TLD_SET
        self._dns_cache: dict[str, object] = {}

    def _resolve(self, domain: str):
        """(addr_key, shard) or None — memoized per actor."""
        if domain in self._dns_cache:
            return self._dns_cache[domain]
        addrs = self.web.dns_addrs(domain)
        got = resolve_domain_row(
            addrs,
            self.cfg.jobs.shard_total,
            self.cfg.jobs.addr_key_v4_mask,
            self.cfg.jobs.addr_key_v6_mask,
            self.cfg.discovery.ipv6_policy,
        )
        out = None if got is None else (got[1], got[2])
        self._dns_cache[domain] = out
        return out

    def candidates_for(self, task_domain: str, links: list[str]) -> tuple[list, list, list]:
        doms: list[str] = []
        keys: list[str] = []
        shards: list[int] = []
        seen_here = set()
        for link in links:
            d = host_of(link)
            # domain_filter_map predicate (crusty.rs:253-262)
            if (not d or len(d) < 4 or "." not in d or d == task_domain
                    or d.rpartition(".")[2].upper() not in self.tlds):
                continue
            if d in seen_here:  # batch-local partial dedup (A1 pattern)
                continue
            seen_here.add(d)
            got = self._resolve(d)
            if got is None:
                doms.append(d)
                keys.append("")
                shards.append(-1)  # unresolvable: recorded for link_domain, never enqueued
            else:
                doms.append(d)
                keys.append(got[0])
                shards.append(got[1])
        return doms, keys, shards

    def __call__(self, batch: pa.Table) -> pa.Table:
        domains = batch["domain"].to_pylist()
        links_col = batch["links"].to_pylist()
        cd, ck, cs = [], [], []
        for task_domain, links in zip(domains, links_col):
            doms, keys, shards = self.candidates_for(task_domain, links or [])
            cd.append(doms)
            ck.append(keys)
            cs.append(shards)
        out = batch
        for (name, typ), vals in zip(CANDIDATE_FIELDS, (cd, ck, cs)):
            out = out.append_column(name, pa.array(vals, type=typ))
        return out
