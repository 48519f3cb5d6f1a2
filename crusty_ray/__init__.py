"""crusty_ray — a Ray-Data-native broad-crawl data engine.

A from-scratch re-expression of the semantics of let4be/crusty (reference at
/root/reference, cited per-module as ``path:line``) on top of
``ray.data.Dataset`` pipelines: ``map_batches`` over zero-copy Arrow batches,
actor pools for stateful stages (frontier / seen-set / politeness), explicit
``groupby(shard)`` shuffles for frontier expansion, and partitioned Parquet
(Lance-shaped tables) for all durable state.

Nothing in here is a port: the reference's tokio-task/channel/redis execution
graph is replaced by an epochal bulk-synchronous crawl loop whose per-record
semantics (filters, budgets, politeness, dedup tiers, top-k) match the
reference's, verified against a single-threaded simulator oracle.
"""

__version__ = "0.1.0"
