"""Partitioned cuckoo filter — the authoritative URL/domain seen set.

The north_rule replaces the reference's redis scaling bloom
(``workspace/redis-queue/src/lib.rs:187-194``) with a *partitioned cuckoo
filter with a bloom pre-filter* living in an actor pool keyed by domain hash.
Cuckoo (vs bloom) buys deletion (politeness locks releasing stale entries) and
a bounded, exportable table for the exact-match checks the conformance suite
runs.

Design: 4-way buckets, 16-bit fingerprints (fp 0 reserved as "empty"),
partial-key cuckoo hashing (``alt = idx ^ hash(fp)``), bounded eviction with a
small stash. Hashes are seed-stable; the filter is fully serializable for
per-epoch checkpoint segments (``seen_segments`` table, SURVEY.md §1.3).
"""

from __future__ import annotations

import pickle
from typing import Sequence

import numpy as np

from ..core.hashing import hash64_batch, hash_family, mix64

_SLOTS = 4
_MAX_KICKS = 500


class CuckooFilter:
    def __init__(self, capacity: int = 1 << 20, seed: int = 0,
                 spill_dir: str | None = None,
                 spill_bytes: int | None = None):
        nbuckets = max(8, 1 << (int(capacity / _SLOTS * 1.05) - 1).bit_length())
        self.nbuckets = nbuckets
        self.seed = seed
        # size-triggered segment paging (r3 VERDICT next-#1): past
        # ``spill_bytes`` the table lives in a scratch-backed memmap — the
        # OS pages 4 KiB segments in/out on demand, so a multi-GiB seen set
        # costs resident RAM only for its hot buckets. Behavior (hashing,
        # eviction, serialization) is bit-identical to the in-heap table.
        nbytes = nbuckets * _SLOTS * 2
        if spill_bytes is not None and nbytes > spill_bytes:
            import tempfile
            if spill_dir:
                import os
                os.makedirs(spill_dir, exist_ok=True)
            fd, self._spill_path = tempfile.mkstemp(
                prefix="cuckoo_", suffix=".tbl", dir=spill_dir)
            import os
            os.close(fd)
            self.table = np.memmap(self._spill_path, dtype=np.uint16,
                                   mode="w+", shape=(nbuckets, _SLOTS))
            self.table[:] = 0
        else:
            self._spill_path = None
            self.table = np.zeros((nbuckets, _SLOTS), dtype=np.uint16)
        self.stash: set[int] = set()  # overflow fingerprint|index pairs (rare)
        self.count = 0

    # -- hashing ------------------------------------------------------------
    def _fp_and_index(self, items: Sequence[str]) -> tuple[np.ndarray, np.ndarray]:
        base = hash64_batch(items, seed=self.seed)
        fp = (hash_family(base, 7) & np.uint64(0xFFFF)).astype(np.uint16)
        fp = np.where(fp == 0, np.uint16(1), fp)  # 0 means empty slot
        idx = (base & np.uint64(self.nbuckets - 1)).astype(np.int64)
        return fp, idx

    def _alt_index(self, idx: np.ndarray | int, fp: np.ndarray | int):
        h = mix64(np.uint64(fp) if isinstance(fp, int) else fp.astype(np.uint64))
        return (np.int64(idx) ^ (h & np.uint64(self.nbuckets - 1)).astype(np.int64))

    # -- single-item ops (insert path; batch volume is post-dedup, small) ---
    def _insert_fp(self, fp: int, idx: int) -> bool:
        for bucket in (idx, int(self._alt_index(idx, fp))):
            row = self.table[bucket]
            free = np.nonzero(row == 0)[0]
            if len(free):
                row[free[0]] = fp
                return True
        # evict: deterministic slot choice keyed by (fp, kick) — seed-stable
        cur_idx, cur_fp = idx, fp
        for kick in range(_MAX_KICKS):
            slot = int(mix64(np.uint64((cur_fp << 16) ^ kick ^ self.seed))) % _SLOTS
            row = self.table[cur_idx]
            cur_fp, row[slot] = int(row[slot]), cur_fp
            cur_idx = int(self._alt_index(cur_idx, cur_fp))
            row = self.table[cur_idx]
            free = np.nonzero(row == 0)[0]
            if len(free):
                row[free[0]] = cur_fp
                return True
        self.stash.add((cur_idx << 16) | cur_fp)
        return True

    def add_batch(self, items: Sequence[str]) -> None:
        if not len(items):
            return
        fps, idxs = self._fp_and_index(items)
        contained = self._contains_fp(fps, idxs)
        for i, (fp, idx, c) in enumerate(zip(fps, idxs, contained)):
            if c:
                continue
            # re-check single item: an earlier duplicate in this batch may
            # have inserted the same fingerprint already
            if self._contains_fp(fps[i:i + 1], idxs[i:i + 1])[0]:
                continue
            self._insert_fp(int(fp), int(idx))
            self.count += 1

    def delete_batch(self, items: Sequence[str]) -> int:
        """Remove one fingerprint per item; returns how many were removed.

        Standard cuckoo-filter PRECONDITION (Fan et al. §3.2, undetectable
        at runtime): only delete items known to have been inserted. Deleting
        a never-inserted item that fingerprint-collides with an inserted one
        removes the OTHER item's slot — creating a false NEGATIVE in the
        authoritative seen set. The crawl engine never deletes (history only
        grows; politeness locks live in ``ShardState.in_processing``, not
        here) — this exists for the filter's standalone users and is
        exercised by the unit tests only."""
        deleted = 0
        if not len(items):
            return 0
        fps, idxs = self._fp_and_index(items)
        for fp, idx in zip(fps, idxs):
            for bucket in (int(idx), int(self._alt_index(int(idx), int(fp)))):
                row = self.table[bucket]
                hit = np.nonzero(row == fp)[0]
                if len(hit):
                    row[hit[0]] = 0
                    deleted += 1
                    self.count -= 1
                    break
            else:
                # Stash records may carry either bucket index (see
                # _contains_fp) — probe both.
                for bucket in (int(idx), int(self._alt_index(int(idx), int(fp)))):
                    key = (bucket << 16) | int(fp)
                    if key in self.stash:
                        self.stash.discard(key)
                        deleted += 1
                        self.count -= 1
                        break
        return deleted

    # -- vectorized membership ---------------------------------------------
    def _contains_fp(self, fps: np.ndarray, idxs: np.ndarray) -> np.ndarray:
        alt = self._alt_index(idxs, fps)
        hit = (self.table[idxs] == fps[:, None]).any(axis=1)
        hit |= (self.table[alt] == fps[:, None]).any(axis=1)
        if self.stash:
            # A stashed entry records whichever of the item's two buckets it
            # was evicted at, so membership must probe BOTH (idx, fp) and
            # (alt, fp) keys — probing only the primary key loses items whose
            # stash record carries the alt index (false negatives).
            fps64 = fps.astype(np.int64)
            keys_pri = (idxs.astype(np.int64) << 16) | fps64
            keys_alt = (alt.astype(np.int64) << 16) | fps64
            stash = np.fromiter(self.stash, dtype=np.int64, count=len(self.stash))
            hit |= np.isin(keys_pri, stash) | np.isin(keys_alt, stash)
        return hit

    def contains_batch(self, items: Sequence[str]) -> np.ndarray:
        if not len(items):
            return np.zeros(0, dtype=bool)
        fps, idxs = self._fp_and_index(items)
        return self._contains_fp(fps, idxs)

    def __contains__(self, item: str) -> bool:
        return bool(self.contains_batch([item])[0])

    # -- checkpointing ------------------------------------------------------
    def to_bytes(self) -> bytes:
        table = self.table
        if isinstance(table, np.memmap):
            table = np.array(table)  # serialize contents, not the file ref
        return pickle.dumps(
            {"nbuckets": self.nbuckets, "seed": self.seed, "count": self.count,
             "table": table, "stash": self.stash}, protocol=4)

    @classmethod
    def from_bytes(cls, blob: bytes) -> "CuckooFilter":
        d = pickle.loads(blob)
        f = cls.__new__(cls)
        f.nbuckets, f.seed, f.count = d["nbuckets"], d["seed"], d["count"]
        f.table, f.stash = d["table"], d["stash"]
        f._spill_path = None
        return f
