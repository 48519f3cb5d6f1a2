"""Scale smoke for the encoded (string-id) BSP connected-components path.

Builds a synthetic near-dup graph of N string ids with chains/stars/isolated
nodes, forces the BSP label-propagation path (driver_threshold=0) through the
distributed dictionary encoding, verifies the labeling against a driver
union-find on the same edges, and prints wall time. The point is that the
string path's extra hops (encode, two endpoint-translation shuffles, decode,
canonical min-id pass) stay O(nodes + edges) with no driver id map.

Usage: PYTHONPATH=/root/repo python probes/components_scale.py [n_nodes]
"""

from __future__ import annotations

import sys
import time


def main(n: int = 100_000) -> None:
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray

    ray.init(address="local", num_cpus=32, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    from crusty_ray.ops.dedup import connected_components

    rng = np.random.default_rng(17)
    ids = [f"doc-{i:08d}" for i in range(n)]
    # ~40% of nodes in components: chains of 2-6 + some stars
    us, vs = [], []
    i = 0
    while i < int(n * 0.4):
        length = int(rng.integers(2, 7))
        for j in range(length - 1):
            us.append(ids[i + j]); vs.append(ids[i + j + 1])
        i += length
    edges = pa.table({"u": us, "v": vs})
    nodes = pa.table({"nid": ids})
    n_blocks = 32

    def split(t):
        step = max(1, t.num_rows // n_blocks)
        return ray.data.from_arrow(
            [t.slice(o, step) for o in range(0, t.num_rows, step)])

    t0 = time.time()
    got = connected_components(split(edges), split(nodes), "nid",
                               num_partitions=32, driver_threshold=0) \
        .to_pandas()
    wall = time.time() - t0

    # driver union-find oracle
    parent: dict = {}
    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r
    for u, v in zip(us, vs):
        ru, rv = find(u), find(v)
        if ru != rv:
            lo, hi = (ru, rv) if ru < rv else (rv, ru)
            parent[hi] = lo
    exp = pd.Series({i: find(i) for i in ids})
    gotmap = got.set_index("nid")["component_id"]
    ok = bool((gotmap.reindex(exp.index) == exp).all()) and len(got) == n
    n_comp = got["component_id"].nunique()
    print({"n_nodes": n, "n_edges": len(us), "n_components": int(n_comp),
           "bsp_encoded_wall_s": round(wall, 2), "matches_union_find": ok})
    ray.shutdown()


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 100_000)
