"""Property tests (serial, no Ray) for the continuation-session math:
PPJoin filter completeness, PPS HUGEINT ranking parity, KMV estimator
parity. These pin the DESIGN; the engine↔oracle equality tests pin the
implementations to the same math."""

import duckdb
import numpy as np
import pandas as pd
from hypothesis import given, settings, strategies as st


# ---------------------------------------------------------------- PPJoin

def _prefix_candidates(docs: dict[int, frozenset], t_pm: int) -> set:
    """Serial mirror of prefix_jaccard_pairs_ds's candidate stage:
    df-rarest-first canonical order, prefix s − ceil(t·s) + 1, bucket
    pairing, SSJoin size filter + PPJoin positional filter, unioned
    across shared prefix grams."""
    df: dict = {}
    for gs in docs.values():
        for g in gs:
            df[g] = df.get(g, 0) + 1
    order = {g: i for i, g in enumerate(sorted(df, key=lambda g: (df[g], g)))}
    pref: dict[int, list] = {}
    for d, gs in docs.items():
        s = len(gs)
        if not s:
            continue
        ranked = sorted(gs, key=lambda g: order[g])
        plen = s - ((t_pm * s + 999) // 1000) + 1
        pref[d] = ranked[:plen]
    cands = set()
    buckets: dict = {}
    for d, toks in pref.items():
        for pos, g in enumerate(toks, start=1):
            buckets.setdefault(g, []).append((d, pos))
    for g, members in buckets.items():
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                (da, pa), (db, pb) = members[i], members[j]
                if da > db:
                    (da, pa), (db, pb) = (db, pb), (da, pa)
                sa, sb = len(docs[da]), len(docs[db])
                if t_pm * max(sa, sb) > 1000 * min(sa, sb):
                    continue
                ub = min(sa - pa, sb - pb) + 1
                need = -(-(t_pm * (sa + sb)) // (1000 + t_pm))
                if ub < need:
                    continue
                cands.add((da, db))
    return cands


@st.composite
def _corpus(draw):
    n_docs = draw(st.integers(3, 10))
    vocab = draw(st.integers(4, 20))
    docs = {}
    for d in range(n_docs):
        size = draw(st.integers(1, min(vocab, 12)))
        docs[d] = frozenset(draw(st.permutations(range(vocab)))[:size])
    return docs


@settings(max_examples=200, deadline=None)
@given(_corpus(), st.sampled_from([300, 500, 600, 800]))
def test_ppjoin_filters_never_prune_true_pairs(docs, t_pm):
    """Completeness: every pair with Jaccard ≥ t survives the prefix +
    size + positional filters — for ANY corpus and threshold. This is
    the guarantee that distinguishes the SSJoin path from LSH."""
    cands = _prefix_candidates(docs, t_pm)
    ids = sorted(docs)
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a, b = docs[ids[i]], docs[ids[j]]
            if not a or not b:
                continue
            inter = len(a & b)
            uni = len(a | b)
            if 1000 * inter >= t_pm * uni:  # true pair (J ≥ t exactly)
                assert (ids[i], ids[j]) in cands, (
                    f"true pair {(ids[i], ids[j])} pruned "
                    f"(inter={inter}, uni={uni}, t={t_pm})")


# ------------------------------------------------------------------- PPS

@settings(max_examples=50, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 10 ** 10),
                          st.integers(1, (1 << 60) - 1)),
                min_size=1, max_size=40, unique=True))
def test_pps_bigint_ranking_matches_duckdb_hugeint(rows):
    """Python-bignum priority ranking == DuckDB HUGEINT ranking for
    arbitrary (weight, hash) pairs — the 128-bit parity the engine
    relies on instead of materializing q."""
    df = pd.DataFrame(rows, columns=["w", "h"])
    df["key"] = np.arange(len(df), dtype=np.int64)
    py = sorted(range(len(df)),
                key=lambda i: (-((int(df["w"][i]) << 60) // int(df["h"][i])),
                               int(df["key"][i])))
    con = duckdb.connect()
    con.register("t", df)
    sql = con.sql("""
        SELECT key FROM t
        ORDER BY CAST(w AS HUGEINT) * CAST(1::BIGINT << 60 AS HUGEINT)
                 // h DESC, key""").df()["key"].tolist()
    assert [int(df["key"][i]) for i in py] == sql


# ------------------------------------------------------------------- KMV

@settings(max_examples=50, deadline=None)
@given(st.sets(st.integers(1, (1 << 60) - 1), min_size=1, max_size=300),
       st.sampled_from([8, 64]))
def test_kmv_estimator_matches_duckdb(hashes, k):
    """The integer (k−1)·2^60 // U_(k) estimator (with the exact
    small-range branch) agrees between Python bignums and the oracle's
    HUGEINT expression for arbitrary hash sets."""
    hv = sorted(hashes)
    kept = hv[:k]
    if len(kept) < k:
        py = len(kept)
    else:
        py = ((k - 1) << 60) // max(kept[-1], 1)
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"hv": pd.Series(hv, dtype="int64")}))
    sql = con.sql(f"""
        WITH r AS (
          SELECT hv, row_number() OVER (ORDER BY hv) AS rn,
                 count(*) OVER () AS n_u
          FROM t)
        SELECT CAST(CASE WHEN n_u < {k} THEN n_u
                    ELSE CAST({k - 1} AS HUGEINT)
                         * CAST(1::BIGINT << 60 AS HUGEINT)
                         // greatest(hv, 1) END AS BIGINT)
        FROM r WHERE rn = LEAST(n_u, {k})""").fetchone()[0]
    assert py == sql
