"""Round-5 continuation ops: KMV bottom-k distinct, prefix-filter SSJoin,
exact kNN graph."""

import duckdb
import inspect
import numpy as np
import pandas as pd

import __ray_entry__ as entry
from crusty_ray.ops import dedup, sketch, similarity

SF = "/root/testdata/sf0.001"


def _oracle_on(view_dir: str, sql: str, tables=("events",)) -> pd.DataFrame:
    con = duckdb.connect()
    for t in tables:
        con.execute(f"CREATE VIEW {t} AS SELECT * "
                    f"FROM read_parquet('{view_dir}/{t}.parquet')")
    return con.execute(sql).df()


# ----------------------------------------------------------- KMV bottom-k

def test_kmv_matches_oracle(ray_session):
    got = sketch.kmv_distinct_by_type_ds(SF).reset_index(drop=True)
    want = _oracle_on(SF, entry.oracle_sql()["kmv_distinct_by_type"])
    pd.testing.assert_frame_equal(got, want[got.columns], check_dtype=False)


def test_kmv_exact_branch_when_sketch_never_fills(ray_session, tmp_path):
    """Fewer distinct users than k → the kept set IS the universe and the
    estimate must be exactly the distinct count, in engine and SQL."""
    pd.DataFrame({
        "event_id": np.arange(60, dtype=np.int64),
        "user_id": np.arange(60, dtype=np.int64) % 7,
        "event_type": ["click"] * 30 + ["view"] * 30,
        "ts": pd.to_datetime("2024-01-01"),
    }).to_parquet(tmp_path / "events.parquet")
    got = sketch.kmv_distinct_by_type_ds(str(tmp_path))
    want = _oracle_on(str(tmp_path), entry.oracle_sql()["kmv_distinct_by_type"])
    pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                  want[got.columns], check_dtype=False)
    assert (got["estimate"] == 7).all() and (got["n_kept"] == 7).all()


def test_kmv_estimate_close_to_exact(ray_session):
    """k=64 → σ ≈ 1/√(k−2) ≈ 12.7%; assert within 3σ of the exact
    distinct per type (sf0.01 has 150 distinct users per type)."""
    sf = "/root/testdata/sf0.01"
    got = sketch.kmv_distinct_by_type_ds(sf)
    exact = _oracle_on(sf, "SELECT event_type, count(DISTINCT user_id) AS n "
                           "FROM events GROUP BY 1 ORDER BY 1")
    merged = got.merge(exact, on="event_type")
    assert len(merged) == len(got)
    full = merged[merged["n_kept"] == 64]
    rel = (full["estimate"] - full["n"]).abs() / full["n"]
    assert (rel < 3 / np.sqrt(62)).all(), rel


def test_kmv_block_layout_independent():
    """Bottom-k of a union == bottom-k of per-block bottom-k's — the fold
    the tree merge relies on (pure-pandas property check)."""
    rng = np.random.default_rng(7)
    hv = rng.integers(0, 1 << 60, size=500, dtype=np.int64)
    df = pd.DataFrame({"event_type": "x", "hv": hv})
    k = 64
    whole = df.drop_duplicates().sort_values(["event_type", "hv"]).head(k)
    merged = pd.concat([
        part.drop_duplicates().sort_values(["event_type", "hv"]).head(k)
        for part in np.array_split(df.sample(frac=1, random_state=3), 7)
    ]).drop_duplicates().sort_values(["event_type", "hv"]).head(k)
    assert whole["hv"].tolist() == merged["hv"].tolist()


# ------------------------------------------------- prefix-filter SSJoin

def test_prefix_jaccard_matches_oracle(ray_session):
    got = dedup.prefix_jaccard_pairs_ds(SF).to_pandas() \
        .sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    want = _oracle_on(SF, entry.oracle_sql()["prefix_jaccard_pairs"],
                      tables=("documents",)) \
        .sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got.astype("int64"),
                                  want[got.columns].astype("int64"))


def test_prefix_filter_is_complete(ray_session):
    """The SSJoin guarantee: prefix-filtered candidates lose NOTHING vs the
    full quadratic gram join at the same threshold (unlike LSH)."""
    got = dedup.prefix_jaccard_pairs_ds(SF).to_pandas() \
        .sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    full = _oracle_on(SF, """
        WITH t0 AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        ex AS (SELECT doc_id, unnest(t) AS tok,
                      generate_subscripts(t, 1) AS i, len(t) AS n FROM t0),
        g0 AS (SELECT doc_id, tok || ' ' || lead(tok, 1) OVER win || ' '
                          || lead(tok, 2) OVER win AS w, i, n
               FROM ex WINDOW win AS (PARTITION BY doc_id ORDER BY i)),
        toks AS (SELECT DISTINCT doc_id, w FROM g0 WHERE i + 2 <= n),
        sz AS (SELECT doc_id, count(*) AS s FROM toks GROUP BY doc_id),
        inter AS (SELECT ta.doc_id AS doc_a, tb.doc_id AS doc_b, count(*) AS i
                  FROM toks ta JOIN toks tb
                       ON ta.w = tb.w AND ta.doc_id < tb.doc_id GROUP BY 1, 2)
        SELECT i.doc_a, i.doc_b,
               CAST((1000 * i.i) // (sa.s + sb.s - i.i) AS BIGINT) AS jaccard_pm
        FROM inter i JOIN sz sa ON sa.doc_id = i.doc_a
                     JOIN sz sb ON sb.doc_id = i.doc_b
        WHERE (1000 * i.i) // (sa.s + sb.s - i.i) >= 500
        ORDER BY doc_a, doc_b
    """, tables=("documents",)).reset_index(drop=True)
    pd.testing.assert_frame_equal(got.astype("int64"),
                                  full[got.columns].astype("int64"))


def test_prefix_jaccard_synthetic_neardups(ray_session, tmp_path):
    """A planted near-dup pair must surface; an unrelated doc must not."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    near = base + " lambda"  # 8/9 shared grams → jaccard 888 pm
    other = "one two three four five six seven eight nine ten"
    pd.DataFrame({"doc_id": [1, 2, 3],
                  "text": [base, near, other],
                  "lang": ["en"] * 3, "source": ["s"] * 3,
                  "n_chars": [len(base), len(near), len(other)]}) \
        .to_parquet(tmp_path / "documents.parquet")
    got = dedup.prefix_jaccard_pairs_ds(str(tmp_path)).to_pandas()
    assert got[["doc_a", "doc_b"]].values.tolist() == [[1, 2]]
    assert int(got["jaccard_pm"].iloc[0]) == 888


# ------------------------------------------------------- exact kNN graph

def test_knn_graph_matches_oracle(ray_session):
    got = similarity.knn_graph_quant_ds(SF).to_pandas() \
        .sort_values(["vec_id", "rnk"]).reset_index(drop=True)
    want = _oracle_on(SF, entry.oracle_sql()["knn_graph"],
                      tables=("embeddings",)) \
        .sort_values(["vec_id", "rnk"]).reset_index(drop=True)
    cols = ["vec_id", "neighbor_id", "qdot", "rnk"]
    pd.testing.assert_frame_equal(got[cols].astype("int64"),
                                  want[cols].astype("int64"))


def test_knn_graph_bucket_count_invariant(ray_session):
    """The bucket-replicated partial top-k merge is layout-independent:
    1 bucket (single full block) and 4 buckets must agree exactly."""
    cols = ["vec_id", "neighbor_id", "qdot", "rnk"]
    one = similarity.knn_graph_quant_ds(SF, n_buckets=1).to_pandas() \
        .sort_values(["vec_id", "rnk"]).reset_index(drop=True)
    four = similarity.knn_graph_quant_ds(SF, n_buckets=4).to_pandas() \
        .sort_values(["vec_id", "rnk"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(one[cols].astype("int64"),
                                  four[cols].astype("int64"))


def test_knn_graph_excludes_self_and_ranks_densely(ray_session):
    got = similarity.knn_graph_quant_ds(SF).to_pandas()
    assert (got["vec_id"] != got["neighbor_id"]).all()
    per = got.groupby("vec_id")["rnk"].agg(["min", "max", "count"])
    assert (per["min"] == 1).all()
    assert (per["max"] == per["count"]).all()
    assert (per["count"] == 10).all()  # 500 vectors, k=10 always available


# ------------------------------------------------- default-drift guards

def test_new_op_defaults_match_oracle_constants():
    """The oracle strings freeze k=64 / t=500pm / k=10: the engine
    defaults must stay in lockstep (the r5 twin-drift guard pattern)."""
    assert inspect.signature(sketch.kmv_distinct_by_type_ds) \
        .parameters["k"].default == 64
    assert inspect.signature(dedup.prefix_jaccard_pairs_ds) \
        .parameters["threshold_pm"].default == 500
    assert inspect.signature(similarity.knn_graph_quant_ds) \
        .parameters["k"].default == 10
    o = entry.oracle_sql()
    assert "LEAST(n_u, 64)" in o["kmv_distinct_by_type"]
    assert "(500 * s + 999)" in o["prefix_jaccard_pairs"]
    assert "rnk <= 10" in o["knn_graph"]


# -------------------------------------- chi² discriminative tokens

def test_source_token_chi2_matches_oracle(ray_session):
    from crusty_ray.ops import curation
    got = curation.source_token_chi2_ds(SF).to_pandas() \
        .sort_values(["source", "rnk"]).reset_index(drop=True)
    want = _oracle_on(SF, entry.oracle_sql()["source_token_chi2"],
                      tables=("documents",)) \
        .sort_values(["source", "rnk"]).reset_index(drop=True)
    cols = ["source", "w", "o11", "chi2_e6", "rnk"]
    pd.testing.assert_frame_equal(got[cols], want[cols], check_dtype=False)


def test_source_token_chi2_planted_marker(ray_session, tmp_path):
    """A token exclusive to one source must rank #1 for that source with
    the maximal chi² (= N·10^6 for a perfect association)."""
    texts = (["SENTINEL common alpha"] * 5
             + ["common beta gamma"] * 5)
    pd.DataFrame({"doc_id": np.arange(10, dtype=np.int64),
                  "text": texts,
                  "lang": ["en"] * 10,
                  "source": ["marked"] * 5 + ["plain"] * 5,
                  "n_chars": [len(t) for t in texts]}) \
        .to_parquet(tmp_path / "documents.parquet")
    from crusty_ray.ops import curation
    got = curation.source_token_chi2_ds(str(tmp_path)).to_pandas()
    top = got[(got["source"] == "marked") & (got["rnk"] == 1)]
    assert top["w"].tolist() == ["SENTINEL"]
    assert int(top["chi2_e6"].iloc[0]) == 10 * 10 ** 6  # perfect 2×2
    # 'common' (in every doc) must be excluded everywhere
    assert not (got["w"] == "common").any()


# ------------------------------------------------------- 2-hop reach

def test_two_hop_reach_matches_oracle(ray_session):
    from crusty_ray.ops import graph
    got = graph.part_two_hop_reach_ds(SF).to_pandas() \
        .sort_values("partkey").reset_index(drop=True)
    want = _oracle_on(SF, entry.oracle_sql()["part_two_hop_reach"],
                      tables=("lineitem",)) \
        .sort_values("partkey").reset_index(drop=True)
    cols = ["partkey", "n1", "reach2"]
    pd.testing.assert_frame_equal(got[cols].astype("int64"),
                                  want[cols].astype("int64"))


def test_two_hop_reach_path_graph(ray_session, tmp_path):
    """Planted path a–b–c–d (each edge in 2 orders for support): reach2 of
    the endpoints is 2, of the middles 3; n1 is 1/2/2/1."""
    rows = []
    ok = 0
    for (x, y) in [(1, 2), (2, 3), (3, 4)]:
        for _ in range(2):  # support 2 per edge
            rows += [(ok, x), (ok, y)]
            ok += 1
    df = pd.DataFrame(rows, columns=["l_orderkey", "l_partkey"])
    df["l_linenumber"] = df.groupby("l_orderkey").cumcount() + 1
    df["l_quantity"] = 1.0
    df["l_extendedprice"] = 1.0
    df["l_returnflag"] = "N"
    df["l_shipdate"] = pd.to_datetime("2024-01-01")
    df.to_parquet(tmp_path / "lineitem.parquet")
    from crusty_ray.ops import graph
    got = graph.part_two_hop_reach_ds(str(tmp_path)).to_pandas() \
        .sort_values("partkey").reset_index(drop=True)
    assert got["partkey"].tolist() == [1, 2, 3, 4]
    assert got["n1"].tolist() == [1, 2, 2, 1]
    assert got["reach2"].tolist() == [2, 3, 3, 2]


# -------------------------------------------------- mutual-kNN clusters

def test_mutual_knn_clusters_matches_oracle(ray_session):
    got = similarity.mutual_knn_clusters_ds(SF).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    want = _oracle_on(SF, entry.oracle_sql()["mutual_knn_clusters"],
                      tables=("embeddings",)) \
        .sort_values("vec_id").reset_index(drop=True)
    cols = ["vec_id", "component_id"]
    pd.testing.assert_frame_equal(got[cols].astype("int64"),
                                  want[cols].astype("int64"))


def test_mutual_knn_edges_are_symmetric_subset(ray_session):
    """Every mutual edge is in the kNN graph BOTH ways; components never
    exceed the label clusters' granularity badly (sanity: ≥ n_labels
    clusters would be ideal, but at minimum every vector is labeled and
    component ids are component minima)."""
    got = similarity.mutual_knn_clusters_ds(SF).to_pandas()
    assert len(got) == 500  # every vector labeled
    # component_id is the min member: the row holding its own id exists
    roots = set(got["component_id"])
    assert roots <= set(got["vec_id"])
    mins = got.groupby("component_id")["vec_id"].min()
    assert (mins.index == mins.values).all()


# --------------------------------------------- degree assortativity

def test_degree_assortativity_matches_oracle(ray_session):
    from crusty_ray.ops import graph
    got = graph.degree_assortativity_ds(SF).reset_index(drop=True)
    want = _oracle_on(SF, entry.oracle_sql()["degree_assortativity"],
                      tables=("lineitem",)).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want[got.columns], check_dtype=False)


def test_degree_assortativity_star_graph(ray_session, tmp_path):
    """Planted star (hub 1 — leaves 2..5, support 2 each): perfectly
    DISassortative — x,y pairs are (4,1)×4 and (1,4)×4, slope −1000 pm."""
    rows, ok = [], 0
    for leaf in (2, 3, 4, 5):
        for _ in range(2):
            rows += [(ok, 1), (ok, leaf)]
            ok += 1
    df = pd.DataFrame(rows, columns=["l_orderkey", "l_partkey"])
    df["l_linenumber"] = df.groupby("l_orderkey").cumcount() + 1
    df["l_quantity"] = 1.0
    df["l_extendedprice"] = 1.0
    df["l_returnflag"] = "N"
    df["l_shipdate"] = pd.to_datetime("2024-01-01")
    df.to_parquet(tmp_path / "lineitem.parquet")
    from crusty_ray.ops import graph
    got = graph.degree_assortativity_ds(str(tmp_path))
    assert int(got["n_dir_edges"].iloc[0]) == 8
    assert int(got["slope_pm"].iloc[0]) == -1000


# --------------------------------------------- audience overlap jaccard

def test_event_type_user_jaccard_matches_oracle(ray_session):
    from crusty_ray.ops import behavior
    got = behavior.event_type_user_jaccard_ds(SF).to_pandas() \
        .sort_values(["type_a", "type_b"]).reset_index(drop=True)
    want = _oracle_on(SF, entry.oracle_sql()["event_type_user_jaccard"]) \
        .sort_values(["type_a", "type_b"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want,
                                  check_dtype=False)


def test_event_type_user_jaccard_planted_overlap(ray_session, tmp_path):
    """Users 0-9 click; users 5-14 view; users 20+ purchase (disjoint):
    click∩view = 5 of 15 → 333 pm; purchase pairs never co-occur."""
    rows = ([("click", u) for u in range(10)]
            + [("view", u) for u in range(5, 15)]
            + [("purchase", u) for u in range(20, 30)])
    df = pd.DataFrame(rows, columns=["event_type", "user_id"])
    df["event_id"] = np.arange(len(df), dtype=np.int64)
    df["ts"] = pd.to_datetime("2024-01-01")
    df["value"] = 1.0
    df["props"] = "{}"
    df.to_parquet(tmp_path / "events.parquet")
    from crusty_ray.ops import behavior
    got = behavior.event_type_user_jaccard_ds(str(tmp_path)).to_pandas()
    assert len(got) == 1  # only click/view co-occur
    r = got.iloc[0]
    assert (r["type_a"], r["type_b"]) == ("click", "view")
    assert (int(r["inter"]), int(r["uni"]), int(r["jaccard_pm"])) \
        == (5, 15, 333)


# ------------------------------------------------- priority sampling

def test_pps_sample_matches_oracle(ray_session):
    from crusty_ray.ops import sample
    got = sample.pps_sample_orders_ds(SF).reset_index(drop=True)
    want = _oracle_on(SF, entry.oracle_sql()["pps_sample_orders"],
                      tables=("orders",)).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[want.columns.tolist()].astype("int64"),
                                  want.astype("int64"))


def test_pps_sample_weight_monotone(ray_session, tmp_path):
    """A giant-weight order is a near-certain member (its priority beats
    any unit-weight row unless its hash is ~2^60/heavy-ratio small), and
    a zero-weight order can never outrank ANY positive-weight row."""
    n = 500
    df = pd.DataFrame({
        "o_orderkey": np.arange(n, dtype=np.int64),
        "o_totalprice": [1.0] * (n - 2) + [10_000_000.0, 0.0],
        "o_custkey": np.int64(1), "o_orderstatus": "O",
        "o_orderdate": pd.to_datetime("2024-01-01"),
        "o_orderpriority": "1-URGENT"})
    df.to_parquet(tmp_path / "orders.parquet")
    from crusty_ray.ops import sample
    got = sample.pps_sample_orders_ds(str(tmp_path))
    assert n - 2 in set(got["o_orderkey"])      # the heavy row is in
    assert n - 1 not in set(got["o_orderkey"])  # the zero row is out
    # bottom-k fold: per-block top-k then merge == whole-table ranking
    assert got["rnk"].tolist() == list(range(1, 33))
