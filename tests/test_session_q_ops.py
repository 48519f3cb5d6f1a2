"""Session-q ops: SCD2 history, Fellegi–Sunter linkage scoring, weighted
priority sampling, decayed activity, common-neighbors link prediction. The
SQL faces are covered by test_driver_contract; these pin the mechanics the
SQL compare can't see (cross-block version assembly, decision-branch
coverage, repartition stability, both adjacency-filter plans, the degree
cap).
"""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


# ------------------------------------------------------------------- SCD2

def test_scd2_cross_block_versions(ray_session):
    """Versions of one key arriving in DIFFERENT input blocks must still
    chain into one interval sequence."""
    import ray
    from crusty_ray.ops.analytic import scd2_history
    b1 = pd.DataFrame({"o_orderkey": [1, 2], "version": [0, 0],
                       "cents": [100, 200]})
    b2 = pd.DataFrame({"o_orderkey": [1, 1], "version": [2, 1],
                       "cents": [120, 110]})
    ds = ray.data.from_pandas([b1, b2])
    got = scd2_history(ds, "o_orderkey", "version", num_partitions=4).to_pandas() \
        .sort_values(["o_orderkey", "version"]).reset_index(drop=True)
    exp = pd.DataFrame({
        "o_orderkey": [1, 1, 1, 2],
        "version": [0, 1, 2, 0],
        "cents": [100, 110, 120, 200],
        "valid_to_version": [1, 2, -1, -1],
        "is_current": [0, 0, 1, 1]})
    pd.testing.assert_frame_equal(got.astype("int64"), exp.astype("int64"))


def test_scd2_current_rows_equal_upsert(ray_session):
    """The SCD2 face's is_current slice must be exactly the upsert-merge
    face's latest rows (same fixture, dual outputs)."""
    from crusty_ray.ops.analytic import (scd2_order_history_ds,
                                         upsert_orders_latest_ds)
    hist = scd2_order_history_ds(SF).to_pandas()
    cur = hist[hist["is_current"] == 1][["o_orderkey", "cents"]] \
        .sort_values("o_orderkey").reset_index(drop=True)
    ups = upsert_orders_latest_ds(SF).to_pandas() \
        [["o_orderkey", "final_cents"]].rename(
            columns={"final_cents": "cents"}) \
        .sort_values("o_orderkey").reset_index(drop=True)
    pd.testing.assert_frame_equal(cur.astype("int64"), ups.astype("int64"))
    # every non-current row's valid_to is a real later version of its key
    stale = hist[hist["is_current"] == 0]
    assert (stale["valid_to_version"] > stale["version"]).all()


# ---------------------------------------------------------------- linkage

def test_fs_score_pairs_branch_coverage(ray_session):
    """Planted pairs hitting every decision branch, checked against the
    weight constants directly."""
    import ray
    from crusty_ray.ops.linkage import fs_score_pairs
    records = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5, 6],
        "lang": ["en", "en", "en", "de", "fr", "en"],
        "source": ["web", "web", "wiki", "web", "wiki", "web"]})
    pairs = pd.DataFrame({
        "doc_a": [1, 1, 1, 4],
        "doc_b": [2, 3, 4, 5],
        "char_gap": [0, 2, 9, 9]})
    got = fs_score_pairs(
        ray.data.from_pandas(pairs), ray.data.from_pandas(records),
        "doc_id", num_partitions=4).to_pandas() \
        .sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    # (1,2): agree+agree+gap0 = 22+18+15 = 55 match
    # (1,3): agree+dis+near  = 22-12+6  = 16 possible
    # (1,4): dis+agree+far   = -8+18-4  =  6 non_match
    # (4,5): dis+dis+far     = -8-12-4  = -24 non_match
    assert got["fs_score"].tolist() == [55, 16, 6, -24]
    assert got["decision"].tolist() == ["match", "possible", "non_match",
                                        "non_match"]


def test_record_linkage_scores_consistent_with_snm(ray_session):
    """Every SNM candidate pair is scored exactly once; decisions respect
    the thresholds."""
    from crusty_ray.ops.dedup import sorted_neighborhood_pairs_ds
    from crusty_ray.ops.linkage import (T_MATCH, T_POSSIBLE,
                                        record_linkage_scores_ds)
    pairs = sorted_neighborhood_pairs_ds(SF).to_pandas()
    scored = record_linkage_scores_ds(SF).to_pandas()
    assert len(scored) == len(pairs)
    assert set(map(tuple, scored[["doc_a", "doc_b"]].to_numpy())) \
        == set(map(tuple, pairs[["doc_a", "doc_b"]].to_numpy()))
    m = scored["decision"] == "match"
    p = scored["decision"] == "possible"
    n = scored["decision"] == "non_match"
    assert (scored.loc[m, "fs_score"] >= T_MATCH).all()
    assert (scored.loc[p, "fs_score"] >= T_POSSIBLE).all() \
        and (scored.loc[p, "fs_score"] < T_MATCH).all()
    assert (scored.loc[n, "fs_score"] < T_POSSIBLE).all()


# ------------------------------------------------------- weighted sampling

def test_weighted_sample_repartition_stable(ray_session):
    """The sample is a pure row function + global bottom-n: 1-block and
    8-block layouts of the same table must agree exactly."""
    import ray
    from crusty_ray.ops.sample import weighted_priority_sample
    df = pd.DataFrame({"id": np.arange(1000, dtype=np.int64),
                       "w": (np.arange(1000, dtype=np.int64) % 17) + 1})
    one = weighted_priority_sample(
        ray.data.from_pandas(df), "id", "w", 40,
        num_partitions=4).to_pandas() \
        .sort_values("rnk").reset_index(drop=True)
    eight = weighted_priority_sample(
        ray.data.from_pandas(df).repartition(8), "id", "w", 40,
        num_partitions=4) \
        .to_pandas().sort_values("rnk").reset_index(drop=True)
    pd.testing.assert_frame_equal(one, eight[one.columns])
    assert len(one) == 40 and one["rnk"].tolist() == list(range(1, 41))


def test_weighted_sample_prefers_heavy_rows(ray_session):
    """Priority u//w: rows a million times heavier should dominate the
    sample (100 heavy + 900 light, n=50 → all 50 heavy)."""
    import ray
    from crusty_ray.ops.sample import weighted_priority_sample
    df = pd.DataFrame({"id": np.arange(1000, dtype=np.int64)})
    df["w"] = np.where(df["id"] < 100, 1_000_000_000_000, 1)
    got = weighted_priority_sample(
        ray.data.from_pandas(df), "id", "w", 50,
        num_partitions=4).to_pandas()
    assert (got["id"] < 100).all()


# --------------------------------------------------------- decayed activity

def test_decayed_activity_matches_pandas(ray_session):
    """Exact integer recompute of the whole leaderboard from the raw
    table (shift decay, max-minute anchor, tie order)."""
    import pyarrow.parquet as pq
    from crusty_ray.ops.behavior import decayed_user_activity_ds
    got = decayed_user_activity_ds(SF, n=25, num_partitions=4).to_pandas() \
        .sort_values("rnk").reset_index(drop=True)
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["user_id", "ts"]).to_pandas()
    minute = ev["ts"].astype("int64") // 60_000_000
    age_h = (minute.max() - minute) // 60
    w = (1 << 20) >> np.minimum(age_h.to_numpy(dtype=np.int64), 20)
    sc = pd.DataFrame({"user_id": ev["user_id"], "decay_score": w}) \
        .groupby("user_id", as_index=False).sum() \
        .sort_values(["decay_score", "user_id"], ascending=[False, True]) \
        .head(25).reset_index(drop=True)
    sc["rnk"] = np.arange(1, len(sc) + 1)
    pd.testing.assert_frame_equal(
        got[["rnk", "user_id", "decay_score"]].astype("int64"),
        sc[["rnk", "user_id", "decay_score"]].astype("int64"))


# ------------------------------------------------- common-neighbor pairs

def _cn(ray_session_edges, **kw):
    import ray
    from crusty_ray.ops.graph import common_neighbor_pairs
    ds = ray.data.from_pandas(ray_session_edges.astype("int64"))
    kw.setdefault("num_partitions", 4)
    out = common_neighbor_pairs(ds, **kw).to_pandas()
    if out.empty:  # Ray to_pandas() drops columns on empty datasets
        return pd.DataFrame({c: pd.Series([], dtype="int64")
                             for c in ("u", "v", "common_neighbors")})
    return out.sort_values(["u", "v"]).reset_index(drop=True) \
        .astype("int64")


def test_common_neighbors_path_star_triangle(ray_session):
    # path 1-2-3: (1,3) share {2}; triangle adds edge (1,3) → no candidates
    path = pd.DataFrame({"a": [1, 2], "b": [2, 3]})
    got = _cn(path)
    exp = pd.DataFrame({"u": [1], "v": [3], "common_neighbors": [1]})
    pd.testing.assert_frame_equal(got, exp.astype("int64"))
    tri = pd.DataFrame({"a": [1, 1, 2], "b": [2, 3, 3]})
    assert len(_cn(tri)) == 0
    # star center 0 with leaves 1..4: every leaf pair shares exactly {0}
    star = pd.DataFrame({"a": [0] * 4, "b": [1, 2, 3, 4]})
    got = _cn(star)
    assert len(got) == 6 and (got["common_neighbors"] == 1).all()


def test_common_neighbors_join_path_equals_broadcast(ray_session):
    """broadcast searchsorted filter vs the left-join marker plan."""
    rng = np.random.RandomState(11)
    a = rng.randint(0, 40, size=300)
    b = rng.randint(0, 40, size=300)
    e = pd.DataFrame({"a": np.minimum(a, b), "b": np.maximum(a, b)})
    e = e[e["a"] < e["b"]].drop_duplicates()
    bc = _cn(e)
    jn = _cn(e, broadcast_edges=0)
    pd.testing.assert_frame_equal(bc, jn)
    assert len(bc) > 0


def test_common_neighbors_degree_cap(ray_session):
    """A capped hub center emits no wedges: star pairs vanish, path pairs
    through low-degree centers survive."""
    # hub 0 -> leaves 1..5, plus path 10-11-12
    e = pd.DataFrame({"a": [0, 0, 0, 0, 0, 10, 11],
                      "b": [1, 2, 3, 4, 5, 11, 12]})
    got = _cn(e, max_center_degree=3)
    exp = pd.DataFrame({"u": [10], "v": [12], "common_neighbors": [1]})
    pd.testing.assert_frame_equal(got, exp.astype("int64"))


# -------------------------------------------------------- association rules

def test_association_rules_planted(ray_session):
    """Three baskets share (10,20), one has (10,30): min_support=3 keeps
    only (10,20), both directions, with exact integer confidence/lift."""
    import ray
    from crusty_ray.ops.basket import association_rules
    rows = [(1, 10), (1, 20), (2, 10), (2, 20), (3, 10), (3, 20),
            (4, 10), (4, 30)]
    df = pd.DataFrame(rows, columns=["o", "p"]).astype("int64")
    got = association_rules(ray.data.from_pandas(df), "o", "p",
                            min_support=3, num_partitions=4).to_pandas() \
        .sort_values(["antecedent", "consequent"]).reset_index(drop=True)
    # supp(10)=4, supp(20)=3, supp(10,20)=3, N=4
    exp = pd.DataFrame({
        "antecedent": [10, 20], "consequent": [20, 10],
        "pair_support": [3, 3], "ant_support": [4, 3],
        "confidence_pm": [1000 * 3 // 4, 1000 * 3 // 3],
        "lift_pm": [1000 * 4 * 3 // (4 * 3), 1000 * 4 * 3 // (3 * 4)]})
    pd.testing.assert_frame_equal(got.astype("int64"), exp.astype("int64"))


def test_association_rules_dup_lines_count_once(ray_session):
    """Duplicate (basket, item) lines (multi-quantity order lines) must
    not inflate support: distinct-per-basket semantics."""
    import ray
    from crusty_ray.ops.basket import association_rules
    rows = [(1, 10), (1, 10), (1, 20), (2, 10), (2, 20), (2, 20)]
    df = pd.DataFrame(rows, columns=["o", "p"]).astype("int64")
    got = association_rules(ray.data.from_pandas(df), "o", "p",
                            min_support=2, num_partitions=4).to_pandas()
    assert (got["pair_support"] == 2).all() and len(got) == 2


# ------------------------------------------------------------- levenshtein

def _lev_ref(a: str, b: str) -> int:
    prev = list(range(len(a) + 1))
    for j, cb in enumerate(b, 1):
        cur = [j]
        for i, ca in enumerate(a, 1):
            cur.append(min(prev[i] + 1, cur[i - 1] + 1,
                           prev[i - 1] + (ca != cb)))
        prev = cur
    return prev[len(a)]


def test_levenshtein_batch_vs_reference():
    from crusty_ray.ops.linkage import levenshtein_batch
    rng = np.random.RandomState(7)
    alpha = "abcdef#0123"
    strs = ["".join(alpha[i] for i in rng.randint(0, len(alpha),
                                                  size=rng.randint(0, 14)))
            for _ in range(120)]
    sa, sb = strs[:60], strs[60:]
    got = levenshtein_batch(sa, sb)
    exp = np.array([_lev_ref(a, b) for a, b in zip(sa, sb)])
    assert (got == exp).all()


def test_name_linkage_distances_exact(ray_session):
    from crusty_ray.ops.linkage import name_linkage_ds
    import pyarrow.parquet as pq
    got = name_linkage_ds(SF, num_partitions=4).to_pandas()
    cust = pq.read_table(f"{SF}/customer.parquet",
                         columns=["c_custkey", "c_name"]).to_pandas()
    names = dict(zip(cust["c_custkey"], cust["c_name"]))
    assert len(got) > 0
    sample = got.head(50)
    for _, r in sample.iterrows():
        assert r["name_distance"] == _lev_ref(names[r["cust_a"]],
                                              names[r["cust_b"]])


# -------------------------------------------------------------- attribution

def test_touch_attribution_planted(ray_session):
    import ray
    from crusty_ray.ops.behavior import touch_attribution
    ev = pd.DataFrame({
        "event_id": [1, 2, 3, 4, 5, 6, 7],
        "user_id":  [9, 9, 9, 9, 9, 8, 8],
        "ts":       [10, 20, 30, 40, 50, 10, 20],
        "event_type": ["click", "view", "purchase", "click", "purchase",
                       "purchase", "click"]})
    got = touch_attribution(ray.data.from_pandas(ev), "user_id",
                            ["ts", "event_id"], "event_id", "event_type",
                            "click", "purchase", num_partitions=4) \
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    # user 9: purchase@3 -> first=1 last=1; purchase@5 -> first=1 last=4
    # user 8: purchase@6 precedes its click -> -1/-1
    exp = pd.DataFrame({
        "event_id": [3, 5, 6], "user_id": [9, 9, 8],
        "first_touch_event_id": [1, 1, -1],
        "last_touch_event_id": [1, 4, -1]})
    pd.testing.assert_frame_equal(got.astype("int64"), exp.astype("int64"))


# ----------------------------------------------------- neighborhood jaccard

def test_neighborhood_jaccard_consistent(ray_session):
    """jaccard_pm must equal 1000·cn // (deg_u + deg_v − cn) recomputed
    from the raw co-purchase graph."""
    import pyarrow.parquet as pq
    from crusty_ray.ops.graph import neighborhood_jaccard_parts_ds
    got = neighborhood_jaccard_parts_ds(SF, n=30, num_partitions=4) \
        .to_pandas()
    assert len(got) > 0
    li = pq.read_table(f"{SF}/lineitem.parquet",
                       columns=["l_orderkey", "l_partkey"]).to_pandas()
    li = li.drop_duplicates()
    m = li.merge(li, on="l_orderkey")
    e = m[m["l_partkey_x"] < m["l_partkey_y"]] \
        .groupby(["l_partkey_x", "l_partkey_y"], as_index=False).size()
    e = e[e["size"] >= 2][["l_partkey_x", "l_partkey_y"]]
    deg = pd.concat([e["l_partkey_x"], e["l_partkey_y"]]) \
        .value_counts().to_dict()
    for _, r in got.head(30).iterrows():
        du, dv = deg[r["part_u"]], deg[r["part_v"]]
        cn = r["common_neighbors"]
        assert r["jaccard_pm"] == 1000 * cn // (du + dv - cn)


def test_touch_attribution_same_type_strictly_before(ray_session):
    """touch_type == credit_type: a click credits to the PREVIOUS click,
    never to itself (the strictly-before contract)."""
    import ray
    from crusty_ray.ops.behavior import touch_attribution
    ev = pd.DataFrame({
        "event_id": [1, 2, 3],
        "user_id":  [9, 9, 9],
        "ts":       [10, 20, 30],
        "event_type": ["click", "click", "click"]})
    got = touch_attribution(ray.data.from_pandas(ev), "user_id",
                            ["ts", "event_id"], "event_id", "event_type",
                            "click", "click", num_partitions=4) \
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    exp = pd.DataFrame({
        "event_id": [1, 2, 3], "user_id": [9, 9, 9],
        "first_touch_event_id": [-1, 1, 1],
        "last_touch_event_id": [-1, 1, 2]})
    pd.testing.assert_frame_equal(got.astype("int64"), exp.astype("int64"))


def test_snm_pairs_rejects_unshifted_negative_metric(ray_session):
    import pytest
    import ray
    from crusty_ray.ops.dedup import snm_pairs
    df = pd.DataFrame({"id": [1, 2, 3], "m": [-5, 0, 5]}).astype("int64")
    with pytest.raises(Exception) as ei:
        snm_pairs(ray.data.from_pandas(df), "id", "m",
                  num_partitions=4).to_pandas()
    assert "snm_pairs key out of range" in str(ei.value)
    ok = snm_pairs(ray.data.from_pandas(df), "id", "m", metric_offset=5,
                   num_partitions=4).to_pandas()
    assert len(ok) == 3  # window 2 over 3 ranked rows


# ------------------------------------------------------------ wave-3 ops

def test_trunc_div_matches_duckdb():
    import duckdb
    from crusty_ray.ops.stats import _trunc_div
    nums = np.array([-7, 7, -7, 6, 0, -1], dtype=np.int64)
    dens = np.array([2, -2, -2, 3, 5, 4], dtype=np.int64)
    got = _trunc_div(nums, dens)
    exp = [duckdb.sql(f"SELECT {a} // {b}").fetchone()[0]
           for a, b in zip(nums, dens)]
    assert got.tolist() == exp


def test_user_value_trend_matches_pandas(ray_session):
    import pyarrow.parquet as pq
    from crusty_ray.ops.stats import user_value_trend_ds
    got = user_value_trend_ds(SF, num_partitions=4).to_pandas() \
        .sort_values("user_id").reset_index(drop=True)
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["user_id", "ts", "value"]).to_pandas()
    minute = ev["ts"].astype("int64") // 60_000_000
    x = (minute - minute.min()).to_numpy(dtype=np.int64)
    y = np.floor(ev["value"].to_numpy() * 1000 + 0.5).astype(np.int64)
    ref = pd.DataFrame({"user_id": ev["user_id"], "x": x, "y": y,
                        "xy": x * y, "xx": x * x, "n": 1}) \
        .groupby("user_id", as_index=False).sum()
    n = ref["n"].to_numpy(dtype=np.int64)
    sx, sy = ref["x"].to_numpy(np.int64), ref["y"].to_numpy(np.int64)
    sxy, sxx = ref["xy"].to_numpy(np.int64), ref["xx"].to_numpy(np.int64)
    den = n * sxx - sx * sx
    num = 1000 * (n * sxy - sx * sy)
    q = np.abs(num) // np.maximum(np.abs(den), 1)
    slope = np.where(np.sign(num) * np.sign(den) < 0, -q, q)
    exp = pd.DataFrame({
        "user_id": ref["user_id"].astype("int64"), "n_events": n,
        "slope_pm": np.where((n >= 2) & (den > 0), slope, 0)
        .astype(np.int64)}).sort_values("user_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got.astype("int64"), exp.astype("int64"))
    assert (got["slope_pm"] < 0).any()  # negative slopes actually occur


def test_user_modal_event_matches_pandas(ray_session):
    import pyarrow.parquet as pq
    from crusty_ray.ops.stats import user_modal_event_ds
    got = user_modal_event_ds(SF, num_partitions=4).to_pandas() \
        .sort_values("user_id").reset_index(drop=True)
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["user_id", "event_type"]).to_pandas()
    c = ev.groupby(["user_id", "event_type"], as_index=False).size()
    c = c.sort_values(["user_id", "size", "event_type"],
                      ascending=[True, False, True])
    exp = c.groupby("user_id", as_index=False).head(1).rename(
        columns={"event_type": "modal_type", "size": "n_occurrences"}) \
        .sort_values("user_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got, exp[["user_id", "modal_type", "n_occurrences"]]
        .astype({"user_id": "int64", "n_occurrences": "int64"}))


def test_segment_revenue_share_sums(ray_session):
    from crusty_ray.ops.stats import segment_revenue_share_ds
    got = segment_revenue_share_ds(SF, num_partitions=4)
    assert len(got) == 5
    # floor shares sum to ≤ 1000 and within 5 per-mille of it
    assert 995 <= got["share_pm"].sum() <= 1000
    assert (1000 * got["seg_cents"] // got["seg_cents"].sum()
            == got["share_pm"]).all()


def test_doc_keywords_matches_pandas(ray_session):
    import pyarrow.parquet as pq
    from crusty_ray.ops.text import doc_keywords_ds
    got = doc_keywords_ds(SF, num_partitions=4).to_pandas() \
        .sort_values(["doc_id", "rn"]).reset_index(drop=True)
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    n_docs = len(docs)
    dfc: dict = {}
    for t in docs["text"].fillna(""):
        for w in set(x for x in t.split(" ") if x):
            dfc[w] = dfc.get(w, 0) + 1
    rows = []
    for d, t in zip(docs["doc_id"], docs["text"].fillna("")):
        tf: dict = {}
        for w in t.split(" "):
            if w:
                tf[w] = tf.get(w, 0) + 1
        scored = []
        for w, c in tf.items():
            ib = (n_docs // dfc[w]).bit_length() - 1
            if ib > 0:
                scored.append((c * ib, w))
        scored.sort(key=lambda x: (-x[0], x[1]))
        for rn, (wt, w) in enumerate(scored[:3], 1):
            rows.append((d, rn, w, wt))
    exp = pd.DataFrame(rows, columns=["doc_id", "rn", "token", "weight"]) \
        .sort_values(["doc_id", "rn"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got, exp.astype({"doc_id": "int64", "rn": "int64",
                         "weight": "int64"}))


# ---------------------------------------------------------- random walks

def test_random_walks_structure(ray_session):
    """Every hop follows a real edge, every start walks the full length,
    and the hash-driven choice is reproducible run-to-run."""
    import ray
    from crusty_ray.ops.graph import random_walks
    e = pd.DataFrame({"a": [1, 1, 2, 3], "b": [2, 3, 3, 4]}).astype("int64")
    ds = ray.data.from_pandas(e).materialize()
    w1 = random_walks(ds, length=3, num_partitions=4).to_pandas() \
        .sort_values(["start", "step"]).reset_index(drop=True)
    w2 = random_walks(ds, length=3, num_partitions=4).to_pandas() \
        .sort_values(["start", "step"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(w1, w2)          # deterministic
    wj = random_walks(ds, length=3, num_partitions=4,
                      broadcast_edges=0).to_pandas() \
        .sort_values(["start", "step"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(w1, wj)          # both plans identical
    assert len(w1) == 4 * 4                        # 4 nodes × steps 0..3
    adj = set(map(tuple, e.to_numpy())) | set(map(tuple,
                                                  e[["b", "a"]].to_numpy()))
    for s, g in w1.groupby("start"):
        g = g.sort_values("step")
        assert g["step"].tolist() == [0, 1, 2, 3]
        assert g.iloc[0]["node"] == s
        path = g["node"].tolist()
        for u, v in zip(path, path[1:]):
            assert (u, v) in adj


def test_langid_eval_identity(ray_session):
    """tp/fp/fn must re-derive from the confusion matrix and F1 from the
    per-mille integers exactly."""
    from crusty_ray.ops.text import lang_confusion_ds, langid_eval_ds
    cm = lang_confusion_ds(SF)
    ev = langid_eval_ds(SF)
    assert int(ev["tp"].sum()) == int(
        cm.loc[cm["lang"] == cm["lang_pred"], "n_docs"].sum())
    assert (ev["tp"].sum() + ev["fn"].sum()) == cm["n_docs"].sum()
    assert (ev["tp"].sum() + ev["fp"].sum()) == cm["n_docs"].sum()
    p, r = ev["precision_pm"], ev["recall_pm"]
    assert (ev["f1_pm"] == 2 * p * r // (p + r).clip(lower=1)).all()


def test_skipgram_pairs_matches_bruteforce(ray_session):
    """Pairs recomputed from the walk corpus itself: symmetric, within
    window, counts aggregated across walks."""
    import ray
    from crusty_ray.ops.graph import random_walks, skipgram_pairs
    e = pd.DataFrame({"a": [1, 1, 2, 3], "b": [2, 3, 3, 4]}).astype("int64")
    walks = random_walks(ray.data.from_pandas(e).materialize(),
                         length=3, num_partitions=4).materialize()
    got = skipgram_pairs(walks, window=2, num_partitions=4).to_pandas() \
        .sort_values(["center", "context"]).reset_index(drop=True)
    w = walks.to_pandas()
    ref: dict = {}
    for _, g in w.groupby("start"):
        g = g.sort_values("step")
        nodes = g["node"].tolist()
        for i, u in enumerate(nodes):
            for j, v in enumerate(nodes):
                if i != j and abs(i - j) <= 2:
                    ref[(u, v)] = ref.get((u, v), 0) + 1
    exp = pd.DataFrame([(c, x, n) for (c, x), n in sorted(ref.items())],
                       columns=["center", "context", "n_pairs"])
    pd.testing.assert_frame_equal(got.astype("int64"), exp.astype("int64"))


def test_skipgram_pairs_empty_corpus(ray_session):
    """Empty walk corpus must return a TYPED empty (center, context,
    n_pairs) — zero map_groups groups would otherwise drop the schema."""
    import ray
    from crusty_ray.ops.graph import random_walks, skipgram_pairs
    e = pd.DataFrame({"a": pd.Series([], dtype="int64"),
                      "b": pd.Series([], dtype="int64")})
    walks = random_walks(ray.data.from_pandas(e).materialize(),
                         length=3, num_partitions=4)
    got = skipgram_pairs(walks, window=2, num_partitions=4)
    assert got.schema().names == ["center", "context", "n_pairs"]
    assert got.count() == 0
