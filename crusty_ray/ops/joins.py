"""Join operators beyond plain equi-joins (ray_guide join patterns).

- **as-of join**: per event, the latest order of the same customer at or
  before the event's date — sorted merge inside per-key groups (the
  `merge_asof`-class op, with an explicit deterministic tie rule:
  latest (o_orderdate, o_orderkey)).
- **semi / anti join**: broadcast the key set once (`ray.put`), filter inside
  `map_batches` — no shuffle (ray_guide "Semi / anti join").

Both small sides here are dimension-scale; at 100 TB the broadcast side must
stay ≪ worker heap (else flip to the bucketed hash join in ops/dedup.py's
pattern).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray

from .io import read_table


def asof_latest_order_ds(sf_dir: str):
    """event → latest (o_orderdate, o_orderkey) with o_custkey == user_id and
    o_orderdate ≤ the event's date. Events without a match are dropped
    (inner as-of). Output ints only."""
    orders = read_table(sf_dir, "orders",
                        ["o_orderkey", "o_custkey", "o_orderdate"]).to_pandas()
    orders["date_us"] = orders["o_orderdate"].astype("int64")  # timestamp[us] -> µs
    by_cust: dict[int, tuple[np.ndarray, np.ndarray]] = {}
    for ck, g in orders.groupby("o_custkey"):
        g = g.sort_values(["date_us", "o_orderkey"])
        by_cust[int(ck)] = (g["date_us"].to_numpy(), g["o_orderkey"].to_numpy())
    lookup_ref = ray.put(by_cust)

    def asof(batch: pd.DataFrame) -> pd.DataFrame:
        lk = ray.get(lookup_ref)
        ev, okey = [], []
        ts = batch["ts"].astype("int64")
        for eid, uid, t in zip(batch["event_id"], batch["user_id"], ts):
            got = lk.get(int(uid))
            if got is None:
                continue
            dates, keys = got
            i = np.searchsorted(dates, t, side="right") - 1
            if i < 0:
                continue
            # tie rule: among equal latest dates take the max orderkey — the
            # sort above puts it at the last position of the date run
            j = np.searchsorted(dates, dates[i], side="right") - 1
            ev.append(int(eid))
            okey.append(int(keys[j]))
        return pd.DataFrame({"event_id": pd.Series(ev, dtype="int64"),
                             "o_orderkey": pd.Series(okey, dtype="int64")})

    ds = read_table(sf_dir, "events", ["event_id", "user_id", "ts"])
    return ds.map_batches(asof, batch_format="pandas")


def anti_join_customers_ds(sf_dir: str, priority: str = "1-URGENT"):
    """Customers with no order of the given priority — broadcast anti join
    (key set via ray.put; every customer has SOME order in this data)."""
    orders = read_table(sf_dir, "orders",
                        ["o_custkey", "o_orderpriority"]).to_pandas()
    urgent = orders.loc[orders["o_orderpriority"] == priority, "o_custkey"]
    have_ref = ray.put(frozenset(int(x) for x in urgent.unique()))

    def anti(batch: pd.DataFrame) -> pd.DataFrame:
        have = ray.get(have_ref)
        mask = ~batch["c_custkey"].map(lambda k: int(k) in have)
        return batch.loc[mask, ["c_custkey"]].astype({"c_custkey": "int64"})

    ds = read_table(sf_dir, "customer", ["c_custkey"])
    return ds.map_batches(anti, batch_format="pandas")


def semi_join_events_ds(sf_dir: str, segment: str = "BUILDING"):
    """Events whose user is a customer in ``segment`` — broadcast semi join +
    grouped count (integer outputs)."""
    cust = read_table(sf_dir, "customer",
                      ["c_custkey", "c_mktsegment"]).to_pandas()
    keys = frozenset(int(k) for k in
                     cust.loc[cust["c_mktsegment"] == segment, "c_custkey"])
    keys_ref = ray.put(keys)

    def semi(batch: pd.DataFrame) -> pd.DataFrame:
        want = ray.get(keys_ref)
        mask = batch["user_id"].map(lambda k: int(k) in want)
        return batch.loc[mask, ["event_type"]]

    from ray.data.aggregate import Count
    ds = read_table(sf_dir, "events", ["user_id", "event_type"])
    return ds.map_batches(semi, batch_format="pandas") \
        .groupby("event_type").aggregate(Count(alias_name="n_events"))
