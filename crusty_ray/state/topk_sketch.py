"""Decayed heavy-hitters sketch — deterministic HeavyKeeper/TOPK re-creation.

The reference keeps per-TLD ``TOPK`` sketches in RedisBloom (``TOPK.RESERVE k
width depth decay`` with k=100, w=25000, d=8, decay=0.92 —
``workspace/redis-calc/src/lib.rs:53-72``, ``conf/default.yaml:172-178``):
depth×width buckets of (fingerprint, counter); on collision the incumbent
counter is decremented with probability ``decay^count`` and evicted at zero.

Ours replaces the coin flip with a deterministic counter-keyed hash draw
(seed-stable, SURVEY §7.4.3 reproducibility), so identical streams give
identical sketches on any node. The exact aggregation in pipelines/topk.py is
preferred whenever distinct keys fit memory; this sketch is the bounded-memory
path for 10^10-scale key spaces, exposed via ``TopKConfig``-shaped params.
"""

from __future__ import annotations

import numpy as np

from ..core.hashing import hash64, hash_family, mix64


class TopKSketch:
    def __init__(self, k: int = 100, width: int = 25_000, depth: int = 8,
                 decay: float = 0.92, seed: int = 0):
        self.k, self.width, self.depth = k, width, depth
        self.decay, self.seed = decay, seed
        self.fps = np.zeros((depth, width), dtype=np.uint64)
        self.counts = np.zeros((depth, width), dtype=np.int64)
        self.heap: dict[str, int] = {}  # current top-k candidates → est count

    def _positions(self, item: str) -> tuple[np.ndarray, np.uint64]:
        base = np.uint64(hash64(item, seed=self.seed))
        idxs = np.array([int(hash_family(np.array([base]), d)[0]) % self.width
                         for d in range(self.depth)], dtype=np.int64)
        return idxs, base

    def _decay_draw(self, item_fp: int, count: int, unit: int) -> bool:
        """Deterministic stand-in for `rand() < decay**count`: a uniform draw
        keyed by (fp, count, unit, seed)."""
        h = int(mix64(np.uint64((item_fp ^ (count << 20) ^ (unit << 44)
                                 ^ self.seed) & 0xFFFFFFFFFFFFFFFF)))
        return (h % 1_000_000) / 1_000_000.0 < self.decay ** count

    def add(self, item: str, incr: int = 1) -> None:
        idxs, fp = self._positions(item)
        est = 0
        for d in range(self.depth):
            i = idxs[d]
            if self.fps[d, i] == fp:
                self.counts[d, i] += incr
                est = max(est, int(self.counts[d, i]))
            elif self.counts[d, i] == 0:
                self.fps[d, i] = fp
                self.counts[d, i] = incr
                est = max(est, incr)
            else:
                # HeavyKeeper eviction: decay the incumbent per unit
                for unit in range(incr):
                    c = int(self.counts[d, i])
                    if self._decay_draw(int(fp), c, unit):
                        self.counts[d, i] = c - 1
                        if self.counts[d, i] <= 0:
                            self.fps[d, i] = fp
                            self.counts[d, i] = 1
                            est = max(est, 1)
                            break
        if est:
            self.heap[item] = max(self.heap.get(item, 0), est)
            if len(self.heap) > self.k * 4:  # bound candidate set
                # keep exactly the top 2k by (count desc, item) — a strict
                # `> cutoff` filter would drop ALL entries tied at the
                # cutoff (e.g. the flat everything-is-1 early stream) and
                # could empty the candidate set entirely
                keep = sorted(self.heap.items(),
                              key=lambda t: (-t[1], t[0]))[: self.k * 2]
                self.heap = dict(keep)

    def query(self, item: str) -> int:
        idxs, fp = self._positions(item)
        best = 0
        for d in range(self.depth):
            if self.fps[d, idxs[d]] == fp:
                best = max(best, int(self.counts[d, idxs[d]]))
        return best

    def topk(self) -> list[tuple[str, int]]:
        """(item, est_count) — TOPK.LIST + TOPK.COUNT equivalent."""
        fresh = [(m, self.query(m)) for m in self.heap]
        fresh = [(m, c) for m, c in fresh if c > 0]
        fresh.sort(key=lambda t: (-t[1], t[0]))
        return fresh[: self.k]

    # -- checkpointing ------------------------------------------------------
    def to_state(self) -> dict:
        return {"k": self.k, "width": self.width, "depth": self.depth,
                "decay": self.decay, "seed": self.seed,
                "fps": self.fps.copy(), "counts": self.counts.copy(),
                "heap": dict(self.heap)}

    @classmethod
    def from_state(cls, d: dict) -> "TopKSketch":
        sk = cls(d["k"], d["width"], d["depth"], d["decay"], d["seed"])
        sk.fps, sk.counts, sk.heap = d["fps"], d["counts"], dict(d["heap"])
        return sk
