"""Scaling Bloom filter — the ``in-history`` dedup tier.

Mirrors RedisBloom's scaling filter as the reference configures it
(``BF.INSERT CAPACITY cap ERROR err EXPANSION 2``,
``workspace/redis-queue/src/lib.rs:187-194``; knobs at
``conf/default.yaml:69-75``): fixed initial capacity, target false-positive
rate, and geometric segment growth once a segment fills.

All hashing is seed-stable (``core.hashing``) so false-positive *patterns* are
reproducible across runs and cluster sizes (SURVEY.md §7.4.3). Fully
serializable for per-epoch checkpoint segments.
"""

from __future__ import annotations

import math
import pickle
from typing import Sequence

import numpy as np

from ..core.hashing import hash64_batch, hash_family


class _Segment:
    __slots__ = ("bits", "nbits", "k", "count", "capacity")

    def __init__(self, capacity: int, error_rate: float):
        nbits = max(64, int(-capacity * math.log(error_rate) / (math.log(2) ** 2)))
        nbits = 1 << (nbits - 1).bit_length()  # power of two → mask instead of mod
        self.nbits = nbits
        self.k = max(1, round(nbits / capacity * math.log(2)))
        self.bits = np.zeros(nbits // 64, dtype=np.uint64)
        self.count = 0
        self.capacity = capacity

    def _positions(self, base: np.ndarray) -> np.ndarray:
        # (k, n) bit positions from k derived hash families
        mask = np.uint64(self.nbits - 1)
        return np.stack([hash_family(base, i) & mask for i in range(self.k)])

    def add(self, base: np.ndarray) -> None:
        pos = self._positions(base).ravel()
        np.bitwise_or.at(self.bits, pos >> np.uint64(6),
                         np.uint64(1) << (pos & np.uint64(63)))
        self.count += len(base)

    def contains(self, base: np.ndarray) -> np.ndarray:
        pos = self._positions(base)
        word = self.bits[(pos >> np.uint64(6))]
        hit = (word >> (pos & np.uint64(63))) & np.uint64(1)
        return hit.all(axis=0).astype(bool)


class ScalingBloom:
    # RedisBloom's tightening ratio: scaling segment i is built at
    # error_rate · TIGHTENING^i, so the compound false-positive rate of the
    # OR over all segments stays bounded at error_rate / (1 - TIGHTENING)
    # = 2 · error_rate regardless of how many times the filter scales
    # (without it the compound rate grows linearly with segment count).
    TIGHTENING = 0.5

    def __init__(self, capacity: int = 1 << 20, error_rate: float = 0.001,
                 expansion: int = 2, seed: int = 0):
        self.capacity = capacity
        self.error_rate = error_rate
        self.expansion = expansion
        self.seed = seed
        self.segments: list[_Segment] = [_Segment(capacity, error_rate)]

    def _base(self, items: Sequence[str]) -> np.ndarray:
        return hash64_batch(items, seed=self.seed)

    def add_batch(self, items: Sequence[str]) -> None:
        """Insert, splitting across segments at capacity boundaries — one
        oversized batch must not overfill a segment past the capacity its
        bit count was sized for (that would blow the segment's FPP budget,
        not just waste space)."""
        items = list(items)
        i = 0
        while i < len(items):
            seg = self.segments[-1]
            room = seg.capacity - seg.count
            if room <= 0:
                seg = _Segment(
                    seg.capacity * self.expansion,
                    self.error_rate * self.TIGHTENING ** len(self.segments))
                self.segments.append(seg)
                continue
            chunk = items[i:i + room]
            seg.add(self._base(chunk))
            i += len(chunk)

    def contains_batch(self, items: Sequence[str]) -> np.ndarray:
        if not len(items):
            return np.zeros(0, dtype=bool)
        base = self._base(items)
        out = np.zeros(len(items), dtype=bool)
        for seg in self.segments:
            out |= seg.contains(base)
        return out

    def __contains__(self, item: str) -> bool:
        return bool(self.contains_batch([item])[0])

    # -- checkpointing ------------------------------------------------------
    def to_bytes(self) -> bytes:
        return pickle.dumps(
            {"capacity": self.capacity, "error_rate": self.error_rate,
             "expansion": self.expansion, "seed": self.seed,
             "segments": [(s.capacity, s.count, s.k, s.nbits, s.bits) for s in self.segments]},
            protocol=4)

    @classmethod
    def from_bytes(cls, blob: bytes) -> "ScalingBloom":
        d = pickle.loads(blob)
        f = cls(d["capacity"], d["error_rate"], d["expansion"], d["seed"])
        f.segments = []
        for cap, count, k, nbits, bits in d["segments"]:
            seg = _Segment.__new__(_Segment)
            seg.capacity, seg.count, seg.k, seg.nbits, seg.bits = cap, count, k, nbits, bits
            f.segments.append(seg)
        return f
