"""Dashboard metric aggregations over the crawl's own output tables (A6).

The reference's Grafana panels are SQL over ClickHouse metrics tables
(``infra/grafana/dashboards/crusty.json:1680-1692`` Pages/sec = count of
follow_ok per interval; ``:106-107`` RX = sum(read_size_b)). Ours are the same
aggregations as Ray pipelines over the ``crawl_log`` parquet — runnable on a
live crawl's partial output (each epoch dir is complete once written).
"""

from __future__ import annotations

import pandas as pd

from ..ops.io import read_parquet


def pages_per_epoch_ds(crawl_log_dir: str):
    """Per epoch: fetched pages, follow_ok pages (term_by == ''), RX bytes,
    distinct domains — the Pages/sec + RX dashboard row (integers only)."""
    ds = read_parquet(crawl_log_dir,
                      columns=["epoch", "term_by", "read_size_b", "domain"])

    # partial rows keyed by (epoch, domain): pages/rx combine by sum, and
    # the per-epoch distinct-domain count is EXACT at the combine (every
    # (epoch, domain) partial row reaches the epoch's group) — fixes the r1
    # max-of-partial-nunique approximation
    def agg(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby(["epoch", "domain"]).agg(
            pages=("term_by", "size"),
            follow_ok=("term_by", lambda s: int((s == "").sum())),
            rx_bytes=("read_size_b", "sum"),
        ).reset_index()
        return g.astype({"pages": "int64", "follow_ok": "int64",
                         "rx_bytes": "int64"})

    partial = ds.map_batches(agg, batch_format="pandas")

    def combine(group: pd.DataFrame) -> pd.DataFrame:
        out = group.groupby("epoch").agg(
            pages=("pages", "sum"), follow_ok=("follow_ok", "sum"),
            rx_bytes=("rx_bytes", "sum"),
            domains=("domain", "nunique")).reset_index()
        return out.astype("int64")

    return partial.groupby("epoch").map_groups(combine, batch_format="pandas")


def term_breakdown_ds(crawl_log_dir: str):
    """Counts per termination reason (the reference's per-term metrics_task
    columns, types.rs:170-197)."""
    from ray.data.aggregate import Count
    ds = read_parquet(crawl_log_dir, columns=["term_by"])
    return ds.groupby("term_by").aggregate(Count(alias_name="n_tasks"))


def politeness_report_ds(crawl_log_dir: str):
    """Per-domain politeness self-audit over the crawl's own log — the
    ST3/ST4 contract observable from the output alone: pages fetched,
    distinct fetch epochs, and the MINIMUM gap between a domain's
    consecutive fetch epochs. Under the politeness budget every domain's
    min gap is ≥ ``crawl.delay_epochs`` (+ its deterministic jitter),
    asserted in the driver-contract test; this query is the dashboard
    face (the reference monitors the same contract via its per-job
    ClickHouse timings).

    Scale plan: per-batch (domain, epoch, pages) partials, one coarse
    domain partition; the min-gap finish is a vectorized shifted diff over
    the partition's (domain, epoch)-sorted rows (no per-domain Python
    loop). min_epoch_gap is -1 for single-epoch domains.
    """
    import numpy as np

    from ..ops.agg import partitioned_group_apply

    ds = read_parquet(crawl_log_dir, columns=["epoch", "domain"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby(["domain", "epoch"], as_index=False).size() \
            .rename(columns={"size": "pages"})
        return g.astype({"epoch": "int64", "pages": "int64"})

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        agg = df.groupby(["domain", "epoch"], as_index=False)["pages"].sum()
        agg = agg.sort_values(["domain", "epoch"], kind="mergesort")
        gap = agg["epoch"].diff().where(
            agg["domain"].eq(agg["domain"].shift()))
        agg = agg.assign(gap=gap)
        out = agg.groupby("domain", as_index=False).agg(
            n_pages=("pages", "sum"), n_epochs=("epoch", "size"),
            min_epoch_gap=("gap", "min"))
        out["min_epoch_gap"] = out["min_epoch_gap"].fillna(-1)
        return out.astype({"n_pages": "int64", "n_epochs": "int64",
                           "min_epoch_gap": "int64"})

    return partitioned_group_apply(
        ds.map_batches(partial, batch_format="pandas"), ["domain"], finish)
