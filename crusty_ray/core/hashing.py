"""Seed-stable hashing for membership structures and sketches.

Approximate-structure reproducibility (SURVEY.md §7.4.3) requires every hash to
be a fixed, process-independent function — never Python's randomized ``hash``.
Hot-path hashes are built from ``zlib.crc32`` (C speed) pairs; quality-critical
fingerprints use blake2b.
"""

from __future__ import annotations

import hashlib
import zlib
from typing import Sequence

import numpy as np

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def hash64(s: str | bytes, seed: int = 0) -> int:
    """Stable 64-bit hash of a string: two salted crc32 halves, mixed."""
    b = s.encode("utf-8") if isinstance(s, str) else s
    lo = zlib.crc32(b, seed & 0xFFFFFFFF)
    hi = zlib.crc32(b, (seed ^ 0x5BD1E995) & 0xFFFFFFFF)
    return ((hi << 32) | lo) & 0xFFFFFFFFFFFFFFFF


def hash64_batch(items: Sequence[str], seed: int = 0) -> np.ndarray:
    """Vectorized-ish stable 64-bit hashes (crc32 is C-speed per item)."""
    s1 = seed & 0xFFFFFFFF
    s2 = (seed ^ 0x5BD1E995) & 0xFFFFFFFF
    n = len(items)
    out = np.empty(n, dtype=np.uint64)
    crc = zlib.crc32
    for i, it in enumerate(items):
        b = it.encode("utf-8")
        out[i] = (crc(b, s2) << 32) | crc(b, s1)
    return out


def mix64(x: np.ndarray | int) -> np.ndarray | int:
    """splitmix64 finalizer — derive independent hash families from one base
    hash: ``mix64(h + k * GOLDEN)`` is family k."""
    x = np.uint64(x) if isinstance(x, int) else x.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        x = x ^ (x >> np.uint64(31))
    return x


def hash_family(base: np.ndarray, k: int) -> np.ndarray:
    """k-th independent 64-bit hash derived from base hashes (shape-preserving)."""
    with np.errstate(over="ignore"):
        return mix64(base + np.uint64(k) * _GOLDEN)


def fingerprint64(s: str | bytes) -> int:
    """High-quality stable 64-bit fingerprint (blake2b-8)."""
    b = s.encode("utf-8") if isinstance(s, str) else s
    return int.from_bytes(hashlib.blake2b(b, digest_size=8).digest(), "big")


def stable_rng(*keys) -> np.random.Generator:
    """Deterministic numpy Generator keyed by arbitrary (str|int) keys —
    the datagen's only randomness source."""
    h = hashlib.blake2b(digest_size=16)
    for k in keys:
        h.update(str(k).encode("utf-8"))
        h.update(b"\x1f")
    return np.random.Generator(np.random.PCG64(int.from_bytes(h.digest(), "big")))


def md5_int(values, hex_chars: int = 15) -> np.ndarray:
    """SQL-parity integer md5: first ``hex_chars`` md5 hex digits of
    ``str(int(v))`` as int64 — the exact DuckDB expression
    ``('0x' || substr(md5(CAST(v AS VARCHAR)), 1, n))::BIGINT``. The
    default 15 chars = 60 uniform bits, BIGINT-safe. ONE definition for
    every oracled face that ranks or buckets by this family (KMV, PPS);
    widening it in one face but not its oracle would silently break the
    bit-exact contract, so both sides must quote this helper."""
    import hashlib
    md5 = hashlib.md5
    return np.array([int(md5(str(int(v)).encode()).hexdigest()[:hex_chars],
                         16) for v in values], dtype=np.int64)


def sip64(items) -> np.ndarray:
    """Full-64-bit vectorized string hash: pandas' keyed siphash
    (``hash_pandas_object`` — process-independent, C-speed) finalized
    with ``mix64``. Use this wherever 64-bit collision odds are part of
    a correctness argument (injective-by-construction ids, exact-verify
    gram sets): ``hash64_batch``'s two-crc32 word collapses to an
    effective 32-bit hash for equal-length strings (crc32 is affine in
    the seed — a low-word collision between same-length strings implies
    a full collision), so its birthday bound is ~2^16 same-length items,
    not 2^32. hash64_batch remains the right kernel for seeded filter
    families (bloom/cuckoo tolerate false positives by contract) and
    quality-only signatures."""
    import pandas as _pd
    h = _pd.util.hash_pandas_object(
        _pd.Series(list(items), dtype=object), index=False).to_numpy()
    return mix64(h)
