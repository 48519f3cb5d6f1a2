"""Distributed cardinality sketch — HyperLogLog approximate COUNT(DISTINCT).

At 100 TB an exact distinct is a full shuffle of every key; the HLL answer
is one streaming pass with O(2^p) state:

- **partial pass** (`map_batches`): each batch folds its values into a
  2^p-register sketch, vectorized (siphash via
  ``pandas.util.hash_pandas_object`` — process-independent — finalized with
  splitmix64), and emits ONE row carrying the register array as bytes.
- **tree reduce**: a second ``map_batches`` with a large ``batch_size``
  elementwise-maxes ~hundreds of partials per task, so the driver merges a
  handful of 2^p-byte rows, never O(blocks) of them.
- register max is associative/commutative → the estimate is independent of
  block layout (asserted in tests).

Estimator: Flajolet et al. 2007 bias-corrected harmonic mean with the
standard small-range linear-counting correction. σ ≈ 1.04/√(2^p):
p=14 → ~0.8 % typical error.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..core.hashing import mix64


def _partial_registers(values: pd.Series, p: int) -> np.ndarray:
    """Fold a value array into a fresh 2^p uint8 register sketch."""
    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
    if not len(values):
        return regs
    h = mix64(pd.util.hash_pandas_object(values, index=False).to_numpy())
    idx = (h & np.uint64(m - 1)).astype(np.int64)
    w = h >> np.uint64(p)  # (64-p)-bit suffix, < 2^50 for p ≥ 14
    # rho = leading zeros of the (64-p)-bit word + 1 = (64-p) - bitlen + 1
    bitlen = np.zeros(len(w), dtype=np.int64)
    nz = w != 0
    # exact for w < 2^53: frexp exponent IS the bit length
    bitlen[nz] = np.frexp(w[nz].astype(np.float64))[1]
    rho = ((64 - p) - bitlen + 1).astype(np.uint8)
    np.maximum.at(regs, idx, rho)
    return regs


def _estimate(regs: np.ndarray) -> float:
    m = float(len(regs))
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(np.float64(2.0) ** -regs.astype(np.float64))
    if est <= 2.5 * m:
        zeros = int(np.count_nonzero(regs == 0))
        if zeros:
            est = m * np.log(m / zeros)  # linear counting
    return float(est)


def approx_distinct(ds, col: str, p: int = 14,
                    merge_batch: int = 256) -> pd.DataFrame:
    """≈ COUNT(DISTINCT col). Returns DataFrame(estimate:int64, p:int64)."""
    if not 11 <= p <= 18:
        # lower bound: the frexp bit-length trick is exact only while the
        # (64-p)-bit suffix stays below 2^53 (p ≥ 11); upper bound keeps the
        # register array a sane size
        raise ValueError(f"p must be in [11, 18], got {p}")
    m = 1 << p

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"regs": [_partial_registers(df[col], p).tobytes()]})

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        acc = np.zeros(m, dtype=np.uint8)
        for b in df["regs"]:
            np.maximum(acc, np.frombuffer(b, dtype=np.uint8), out=acc)
        return pd.DataFrame({"regs": [acc.tobytes()]})

    # batch_size=None → one partial per BLOCK (not per default 1024-row
    # batch): at 10^6 blocks that is 10^6 × 2^p-byte rows into the tree
    # merge instead of 64× more
    partials = ds.map_batches(partial, batch_format="pandas",
                              batch_size=None) \
        .map_batches(merge, batch_format="pandas", batch_size=merge_batch) \
        .to_pandas()  # ≤ blocks/merge_batch rows of 2^p bytes each
    acc = np.zeros(m, dtype=np.uint8)
    if "regs" in partials.columns:  # empty input yields no partial rows
        for b in partials["regs"]:
            np.maximum(acc, np.frombuffer(b, dtype=np.uint8), out=acc)
    est = _estimate(acc) if acc.any() else 0.0
    return pd.DataFrame({"estimate": [int(round(est))],
                         "p": [p]}).astype("int64")


def approx_distinct_users_ds(sf_dir: str):
    """HLL distinct users over the events stream — the sketch face (rows-only
    in the driver contract; the pytest oracle bounds error vs exact)."""
    from .io import read_table
    ds = read_table(sf_dir, "events", ["user_id"])
    return approx_distinct(ds, "user_id")


# --------------------------------------------- Count-Min (point frequencies)

def _cms_buckets(values: pd.Series, r: int, width: int) -> np.ndarray:
    """Row-``r`` bucket ids: ``analog.md5_shard`` over the ``cms{r}:``-
    prefixed key — ONE hashing kernel for the build and probe sides (an
    independent copy on either side would silently break est ≥ exact)."""
    from .analog import md5_shard
    return md5_shard(f"cms{r}:" + values.astype(str), width)

def count_min_cells(ds, col: str, depth: int = 3, width: int = 64):
    """Count-Min sketch table (Cormode & Muthukrishnan 2005) over ``col``:
    ``depth`` md5-hash rows × ``width`` buckets of exact int64 counts. The
    whole sketch is depth·width cells regardless of input size — the
    fixed-memory point-frequency state a streaming stage carries.

    Deterministic by construction (md5 row hashes, integer sums), so the
    CELLS and every point estimate are bit-exact across engines — the rare
    sketch whose oracle is full SQL, not an error bound. One streaming
    partial pass (each batch emits ≤ depth·width rows), one tiny grouped
    finish. Returns a Dataset (row, bucket, cnt)."""
    from .agg import partitioned_group_apply

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        s = df[col].astype(str)
        rows, buckets = [], []
        for r in range(depth):
            b = _cms_buckets(s, r, width)
            rows.append(np.full(len(b), r, dtype=np.int64))
            buckets.append(b)
        out = pd.DataFrame({"row": np.concatenate(rows),
                            "bucket": np.concatenate(buckets)})
        return out.groupby(["row", "bucket"], as_index=False) \
            .size().rename(columns={"size": "cnt"}).astype("int64")

    def reduce_cells(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(["row", "bucket"], as_index=False)["cnt"].sum()
        return out.astype("int64")

    return partitioned_group_apply(ds.map_batches(partial,
                                                  batch_format="pandas"),
                                   ["row", "bucket"], reduce_cells)


def cms_user_counts_ds(sf_dir: str, depth: int = 3, width: int = 64):
    """CMS point estimates for every distinct user of the events stream,
    beside the exact count — (user_id, exact_n, cms_est). The sketch
    guarantee est ≥ exact is pinned in pytest; the SQL oracle reproduces
    both columns bit-exact (md5 row hashes are engine-independent).

    Scale plan: the depth·width cell table is a FIXED-size object (1.5 KB
    here) — broadcast once via ``ray.put``, point-estimated inside one
    vectorized pass over the per-user exact counts (themselves one grouped
    shuffle). Nothing driver-side grows with the corpus."""
    import ray

    from .agg import grouped_count
    from .io import read_table

    ds = read_table(sf_dir, "events", ["user_id"])
    cells = count_min_cells(ds, "user_id", depth, width).to_pandas()
    table = np.zeros((depth, width), dtype=np.int64)
    if "cnt" in cells.columns:  # empty input yields no cell rows (and a
        # schema-less frame), exactly like approx_distinct's partials
        table[cells["row"], cells["bucket"]] = cells["cnt"]
    tref = ray.put(table)

    exact = grouped_count(ds, ["user_id"], "exact_n")

    def estimate(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty or "user_id" not in df.columns:
            return pd.DataFrame({c: pd.Series([], dtype="int64")
                                 for c in ["user_id", "exact_n", "cms_est"]})
        t = ray.get(tref)
        s = df["user_id"].astype(str)
        est = np.full(len(df), np.iinfo(np.int64).max, dtype=np.int64)
        for r in range(depth):
            est = np.minimum(est, t[r, _cms_buckets(s, r, width)])
        return pd.DataFrame({"user_id": df["user_id"].astype("int64"),
                             "exact_n": df["exact_n"].astype("int64"),
                             "cms_est": est})

    return exact.map_batches(estimate, batch_format="pandas")


# ------------------------------------------- HLL md5 register oracle face

def _bitlen64(w: np.ndarray) -> np.ndarray:
    """Exact vectorized bit length of uint64 values (binary-search shifts —
    float tricks are inexact past 2^53, and the md5 suffixes here are
    58-bit)."""
    res = np.zeros(len(w), dtype=np.int64)
    cur = w.copy()
    for s in (32, 16, 8, 4, 2, 1):
        big = cur >= (np.uint64(1) << np.uint64(s))
        res[big] += s
        cur[big] >>= np.uint64(s)
    res += (cur > 0).astype(np.int64)
    return res


def hll_registers_md5_ds(sf_dir: str, p: int = 6):
    """SQL-parity HLL REGISTER face: the per-bucket max-ρ register table of
    an HLL sketch over distinct users, under the md5 hash family — every
    step (hash, bucket, suffix, leading-zero rank) an exact DuckDB
    expression, so the sketch STATE is bit-exact-oracled even though the
    float estimator itself cannot be (``approx_distinct_users`` stays
    rows-only with its pytest error-bound oracle; this face proves the
    distributed register fold those estimates are made of).

    hash = first 8 md5 bytes of CAST(user_id AS VARCHAR); bucket = h % 2^p;
    w = h // 2^p; ρ = (64−p) − bit_length(w) + 1 (w=0 → 64−p+1,
    bit_length via DuckDB's unpadded ``bin()``). Registers fold per batch
    (max is associative/commutative — block-layout independent), the driver
    reduces ≤ blocks × 2^p slim partial rows. Returns (bucket, max_rho)
    for non-empty buckets."""
    import hashlib

    from .io import read_table

    m = 1 << p
    ds = read_table(sf_dir, "events", ["user_id"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"bucket": pd.Series([], dtype="int64"),
                              "max_rho": pd.Series([], dtype="int64")})
        if not len(df):
            return empty
        uniq = df["user_id"].astype("int64").unique()
        hv = np.array([int(hashlib.md5(str(int(u)).encode()).hexdigest()[:16],
                           16) for u in uniq], dtype=np.uint64)
        idx = (hv & np.uint64(m - 1)).astype(np.int64)
        w = hv >> np.uint64(p)
        rho = np.where(w == 0, 64 - p + 1,
                       (64 - p) - _bitlen64(w) + 1).astype(np.int64)
        out = pd.DataFrame({"bucket": idx, "max_rho": rho}) \
            .groupby("bucket", as_index=False).max()
        return out.astype("int64")

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    if "bucket" not in parts.columns:
        return pd.DataFrame({"bucket": pd.Series([], dtype="int64"),
                             "max_rho": pd.Series([], dtype="int64")})
    out = parts.groupby("bucket", as_index=False).max() \
        .sort_values("bucket").reset_index(drop=True)
    return out.astype("int64")


# ------------------- integer fixed-point HLL estimate (md5 register face)

def hll_alpha_ppm(m: int) -> int:
    """The HLL bias constant alpha_m in parts-per-million — an INTEGER
    frozen at definition time, shared verbatim by the engine and the SQL
    oracle (the single-source-of-truth convention of _LANG_PROFILES)."""
    return round(0.7213 / (1.0 + 1.079 / m) * 10 ** 6)


def hll_ln_table_e6(m: int) -> list[int]:
    """round(ln(m/k)·10^6) for k = 0..m (index 0 unused) — the linear-
    counting branch's log, precomputed to integers so neither engine
    evaluates a float log at query time."""
    import math
    return [0] + [round(math.log(m / k) * 10 ** 6) for k in range(1, m + 1)]


def approx_distinct_users_md5_ds(sf_dir: str, p: int = 6) -> pd.DataFrame:
    """≈ COUNT(DISTINCT user_id) — the PRODUCTION HLL plan under the md5
    register face, with the ESTIMATOR itself in integer fixed point so the
    whole pipeline (hash → register fold → estimate) is bit-exact-oracled
    in SQL (r4 VERDICT next #6; the float-native estimator keeps the
    ``approx_distinct_users_float`` name, rows-only with its pytest
    error-bound oracle).

    Fixed-point algebra (SCALE = 64-p+1, the max possible rho):
      S_num  = Σ_buckets 2^(SCALE - rho)   (empty registers: rho=0)
      est_e6 = alpha_ppm · m² · 2^SCALE // S_num          (raw estimate ·10^6)
      if est_e6 ≤ 2.5·m·10^6 and zeros > 0:
          est_e6 = m · ln_table_e6[zeros]                 (linear counting)
    Every step is exact integer arithmetic (HUGEINT in DuckDB, Python ints
    here); est_e6 stays inside int64 for any realistic cardinality
    (overflows only past ~9·10^12 distinct at p=6 — far beyond the sketch's
    useful range at that precision).

    Returns one row: (estimate_e6, p, zeros)."""
    m = 1 << p
    scale = 64 - p + 1
    regs = hll_registers_md5_ds(sf_dir, p)
    s_num = sum(1 << (scale - int(r)) for r in regs["max_rho"])
    zeros = m - len(regs)
    s_num += zeros << scale
    est_e6 = (hll_alpha_ppm(m) * m * m * (1 << scale)) // s_num
    if est_e6 <= (5 * m * 10 ** 6) // 2 and zeros:
        est_e6 = m * hll_ln_table_e6(m)[zeros]
    return pd.DataFrame({"estimate_e6": [est_e6], "p": [p],
                         "zeros": [zeros]}).astype("int64")


# ------------------------------------- KMV bottom-k distinct (md5 face)

KMV_BITS = 60  # 15 md5 hex chars: BIGINT-safe in DuckDB, uniform on [0, 2^60)


def kmv_distinct_by_type_ds(sf_dir: str, k: int = 64) -> pd.DataFrame:
    """≈ COUNT(DISTINCT user_id) per event_type via the KMV (k-minimum-
    values) bottom-k sketch (Bar-Yossef et al. 2002; Beyer et al. SIGMOD'07)
    — the third cardinality sketch family next to HLL
    (``approx_distinct_users``) and exact distinct, and the one whose whole
    state AND estimator are trivially integer: keep the ``k`` smallest
    distinct 60-bit hashes per group; the k-th smallest value ``kth``
    estimates density, so ``estimate = (k-1)·2^60 // kth`` (unbiased
    (k-1)/U_(k) form), exact when fewer than ``k`` distinct hashes exist.

    Scale plan (100 TB): a block's partial is ≤ groups×k slim int64 rows —
    bottom-k of a union is bottom-k of the per-block bottom-k's
    (associative/commutative, block-layout independent, same contract as
    the HLL register fold); a tree ``map_batches`` merge collapses ~256
    partials per task and the driver folds the final card-sized frame
    (n_groups × k rows). Unlike HLL, KMV sketches also intersect
    (|A∩B| via the Jaccard of the union sketch) — that is why engines keep
    both families.

    Hash face: first 15 md5 hex chars of CAST(user_id AS VARCHAR) — every
    step an exact DuckDB expression, so the full pipeline (hash → bottom-k
    → integer estimate) is bit-exact-oracled
    (``oracle_sql()['kmv_distinct_by_type']``).

    Returns one row per event_type: (event_type, n_kept, kth_hash,
    estimate), sorted by event_type."""
    from .io import read_table

    ds = read_table(sf_dir, "events", ["event_type", "user_id"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"event_type": pd.Series([], dtype=object),
                              "hv": pd.Series([], dtype="int64")})
        if not len(df):
            return empty
        from ..core.hashing import md5_int
        uniq = df[["event_type", "user_id"]].drop_duplicates()
        hv = md5_int(uniq["user_id"].astype("int64"))
        out = pd.DataFrame({"event_type": uniq["event_type"].to_numpy(),
                            "hv": hv}).drop_duplicates()
        out = out.sort_values(["event_type", "hv"]) \
            .groupby("event_type", as_index=False).head(k)
        return out.reset_index(drop=True)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df
        out = df.drop_duplicates().sort_values(["event_type", "hv"]) \
            .groupby("event_type", as_index=False).head(k)
        return out.reset_index(drop=True)

    # one partial per BLOCK, then a ~256-way tree merge (the HLL pattern)
    parts = ds.map_batches(partial, batch_format="pandas", batch_size=None) \
        .map_batches(merge, batch_format="pandas", batch_size=256 * k) \
        .to_pandas()
    if "event_type" not in parts.columns or not len(parts):
        return pd.DataFrame({"event_type": pd.Series([], dtype=object),
                             "n_kept": pd.Series([], dtype="int64"),
                             "kth_hash": pd.Series([], dtype="int64"),
                             "estimate": pd.Series([], dtype="int64")})
    kept = merge(parts)
    rows = []
    for et, g in kept.groupby("event_type", sort=True):
        n_kept = len(g)
        kth = int(g["hv"].max())  # k-th smallest kept = max of the kept set
        if n_kept < k:
            est = n_kept  # sketch never filled: the kept set IS the universe
        else:
            est = ((k - 1) << KMV_BITS) // max(kth, 1)
        rows.append((et, n_kept, kth, est))
    out = pd.DataFrame(rows, columns=["event_type", "n_kept", "kth_hash",
                                      "estimate"])
    return out.astype({"n_kept": "int64", "kth_hash": "int64",
                       "estimate": "int64"})
