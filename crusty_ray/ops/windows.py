"""Windowed aggregates over the events stream (ray_guide streaming pattern).

Ray Data has no event-time windows; streams are an ordered partitioned log:
partition by key, order by ts within the partition, window inside
``map_groups`` with pandas. Every output is integer-typed so the DuckDB window
-function oracles hash identically.

- tumbling window  = ops/analog.event_minute_buckets (GROUP BY time bucket)
- sliding window   = per-key RANGE window over bucket counts (this module)
- session window   = gap-based sessionization via lag/cumsum (this module)
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .agg import grouped_count
from .io import read_table


def _minutes(batch: pd.DataFrame) -> pd.DataFrame:
    epoch_s = batch["ts"].astype("int64") // 1_000_000
    return pd.DataFrame({"event_type": batch["event_type"],
                         "minute": (epoch_s // 60).astype("int64")})


def sliding_window_counts_ds(sf_dir: str, width: int = 5):
    """Per (event_type, minute): events in the trailing ``width``-minute RANGE
    window — `SUM(cnt) OVER (PARTITION BY type ORDER BY minute RANGE width-1
    PRECEDING)`. Counts per bucket first (small), window per key after."""
    ds = read_table(sf_dir, "events", ["ts", "event_type"])
    counts = grouped_count(ds.map_batches(_minutes, batch_format="pandas"),
                           ["event_type", "minute"], "cnt")

    def window(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values("minute").reset_index(drop=True)
        m = g["minute"].to_numpy()
        c = g["cnt"].to_numpy()
        csum = np.concatenate([[0], np.cumsum(c)])
        # trailing RANGE window over minute VALUES (not rows)
        lo = np.searchsorted(m, m - (width - 1), side="left")
        g["window_cnt"] = (csum[np.arange(len(m)) + 1] - csum[lo]).astype("int64")
        return g[["event_type", "minute", "cnt", "window_cnt"]]

    return counts.groupby("event_type").map_groups(window, batch_format="pandas")


def session_windows_ds(sf_dir: str, gap_minutes: int = 30):
    """Gap-based sessions per user: a new session starts when the time since
    the previous event exceeds ``gap_minutes``. Output: one row per session
    with integer bounds (µs) and event count."""
    gap_us = gap_minutes * 60 * 1_000_000
    ds = read_table(sf_dir, "events", ["ts", "user_id", "event_id"])

    def sessions(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["ts", "event_id"]).reset_index(drop=True)
        ts = g["ts"].astype("int64")
        new = (ts.diff().fillna(gap_us + 1) > gap_us).astype("int64")
        g["session_id"] = new.cumsum()
        out = g.groupby("session_id").agg(
            user_id=("user_id", "first"), n_events=("event_id", "size"),
            start_us=("ts", "min"), end_us=("ts", "max")).reset_index()
        out["start_us"] = out["start_us"].astype("int64")
        out["end_us"] = out["end_us"].astype("int64")
        return out[["user_id", "session_id", "n_events", "start_us", "end_us"]]

    return ds.groupby("user_id").map_groups(sessions, batch_format="pandas")
