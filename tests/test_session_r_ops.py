"""Session-r ops: entity-resolution clusters, GraphSAGE-style neighbor
feature aggregation, fixed-round quantized k-means. The SQL faces are
covered by test_driver_contract; these pin the mechanics the SQL compare
can't see (transitive chaining across blocks, truncated-mean semantics on
signed sums, tie-breaks, empty-cluster carry-over, block-layout stability).
"""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


# ------------------------------------------------------- entity clusters

def test_entity_clusters_transitive_and_sized(ray_session):
    """Match chains must close transitively into one entity, and every doc
    (including singletons) gets a row with the right size."""
    from crusty_ray.ops.linkage import entity_clusters_ds
    got = entity_clusters_ds(SF).to_pandas()
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id"])
    assert len(got) == len(docs)
    assert set(got["doc_id"]) == set(docs["doc_id"])
    # entity_id is the min member of its cluster
    mins = got.groupby("entity_id")["doc_id"].min()
    assert (mins.index == mins.values).all()
    # sizes are consistent with the actual grouping
    sizes = got.groupby("entity_id")["doc_id"].size()
    merged = got.merge(sizes.rename("true_size"), on="entity_id")
    assert (merged["entity_size"] == merged["true_size"]).all()


def test_entity_clusters_match_edges_agree_with_scores(ray_session):
    """Two docs joined by a direct match edge must share an entity; two
    docs in different components must not."""
    from crusty_ray.ops.linkage import (entity_clusters_ds,
                                        record_linkage_scores_ds)
    ent = entity_clusters_ds(SF).to_pandas().set_index("doc_id")["entity_id"]
    sc = record_linkage_scores_ds(SF).to_pandas()
    m = sc[sc["decision"] == "match"]
    assert len(m) > 0, "fixture has no match pairs - test is vacuous"
    assert (ent.loc[m["doc_a"]].to_numpy()
            == ent.loc[m["doc_b"]].to_numpy()).all()


# -------------------------------------------- neighbor feature aggregation

def test_neighbor_feature_agg_planted(ray_session):
    """Hand-computed star + triangle: degree, truncated mean, max."""
    import ray
    from crusty_ray.ops.graph import neighbor_feature_agg
    # graph: 1-2, 1-3, 2-3 (triangle), 4-1 (pendant)
    edges = ray.data.from_pandas(pd.DataFrame(
        {"a": [1, 1, 2, 4], "b": [2, 3, 3, 1]}))
    feats = ray.data.from_pandas(pd.DataFrame(
        {"node": [1, 2, 3, 4], "price": [10, 25, 31, 7]}))
    got = neighbor_feature_agg(edges, feats, "node", "price",
                               num_partitions=4).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    exp = pd.DataFrame({
        "node": [1, 2, 3, 4],
        "degree": [3, 2, 2, 1],
        # node 1 nbrs {2,3,4}: (25+31+7)//3 = 21; node 2 nbrs {1,3}:
        # 41//2 = 20; node 3 nbrs {1,2}: 35//2 = 17; node 4 nbr {1}: 10
        "avg_price": [21, 20, 17, 10],
        "max_price": [31, 31, 25, 10]})
    pd.testing.assert_frame_equal(got.astype("int64"), exp.astype("int64"))


def test_part_neighbor_stats_degree_equals_nb_list(ray_session):
    """Degrees must equal the cosupport graph's per-node edge counts."""
    from crusty_ray.ops.graph import (part_cosupport_edges,
                                      part_neighbor_stats_ds)
    got = part_neighbor_stats_ds(SF).to_pandas()
    ed = part_cosupport_edges(SF).to_pandas()
    deg = pd.concat([ed["a"], ed["b"]]).value_counts()
    assert set(got["partkey"]) == set(deg.index)
    merged = got.set_index("partkey")["degree"]
    assert (merged.loc[deg.index].to_numpy() == deg.to_numpy()).all()


# ------------------------------------------------------------ k-means

def _ref_kmeans(mat, ids, k, rounds):
    """Pure-numpy single-process Lloyd with the op's exact conventions."""
    from crusty_ray.ops.stats import _trunc_div
    order = np.argsort(ids)
    cen = mat[order[:k]].copy()
    for _ in range(rounds):
        d = ((mat[:, None, :] - cen[None, :, :]) ** 2).sum(axis=2)
        a = d.argmin(axis=1)
        for cid in range(k):
            sel = mat[a == cid]
            if len(sel):
                cen[cid] = _trunc_div(
                    sel.sum(axis=0),
                    np.full(mat.shape[1], len(sel), dtype=np.int64))
    d = ((mat[:, None, :] - cen[None, :, :]) ** 2).sum(axis=2)
    a = d.argmin(axis=1)
    return a, d[np.arange(len(a)), a]


def test_kmeans_quant_equals_reference(ray_session):
    """Distributed plan ≡ the single-process reference, including on a
    fixture with NEGATIVE components (trunc-div is load-bearing) and an
    initial centroid that immediately loses all members (carry-over)."""
    import ray
    from crusty_ray.ops.similarity import kmeans_quant
    rng = np.random.RandomState(7)
    mat = rng.randint(-3000, 3000, size=(60, 5)).astype(np.int64)
    # two ids form a far-away duplicate pair so one seed goes empty
    mat[0] = mat[1]
    ids = np.arange(100, 160, dtype=np.int64)
    df = pd.DataFrame({"vid": ids,
                       "vec": [(m / 1000.0).tolist() for m in mat]})
    # the reference sees exactly what the op's quantizer produces (the
    # /1000*1000 round-trip is NOT exact in binary floats)
    mat = np.floor(np.stack([np.asarray(v, np.float64)
                             for v in df["vec"]]) * 1000.0).astype(np.int64)
    assert (mat < 0).any(), "fixture must exercise negative components"
    ds = ray.data.from_pandas([df.iloc[:17], df.iloc[17:40], df.iloc[40:]])
    got = kmeans_quant(ds, "vid", "vec", k=4, rounds=3).to_pandas() \
        .sort_values("vid").reset_index(drop=True)
    a, d2 = _ref_kmeans(mat, ids, 4, 3)
    assert (got["cluster"].to_numpy() == a).all()
    assert (got["d2"].to_numpy() == d2).all()


def test_kmeans_block_layout_stable(ray_session):
    """Same input split into different block layouts → identical output
    (int sums are order-independent; the seed prune is global)."""
    from crusty_ray.ops.similarity import kmeans_embeddings_ds
    got1 = kmeans_embeddings_ds(SF).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    import ray
    import pyarrow.parquet as pq
    t = pq.read_table(f"{SF}/embeddings.parquet",
                      columns=["vec_id", "embedding"]).to_pandas()
    from crusty_ray.ops.similarity import kmeans_quant
    ds = ray.data.from_pandas(
        [t.iloc[i::7].reset_index(drop=True) for i in range(7)])
    got2 = kmeans_quant(ds, "vec_id", "embedding").to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got1, got2)


def test_kmeans_tie_breaks_to_lowest_cid(ray_session):
    """A point equidistant to two centroids must take the lower cid."""
    import ray
    from crusty_ray.ops.similarity import kmeans_quant
    # seeds at 0 and 2; the third point at 1 ties → cluster 0
    df = pd.DataFrame({"vid": [1, 2, 3],
                       "vec": [[0.0], [0.002], [0.001]]})
    got = kmeans_quant(ray.data.from_pandas(df), "vid", "vec",
                       k=2, rounds=0).to_pandas() \
        .sort_values("vid").reset_index(drop=True)
    assert got.loc[2, "cluster"] == 0 and got.loc[2, "d2"] == 1


# --------------------------------------------------------- Count-Min sketch

def test_cms_never_undercounts_and_is_layout_stable(ray_session):
    """CMS guarantee: est ≥ exact for every key; identical output across
    block layouts (integer cell sums are order-independent)."""
    from crusty_ray.ops.sketch import cms_user_counts_ds
    got = cms_user_counts_ds(SF).to_pandas()
    assert (got["cms_est"] >= got["exact_n"]).all()
    # exact counts must agree with pandas ground truth
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["user_id"])
    truth = ev["user_id"].value_counts()
    g = got.set_index("user_id")["exact_n"]
    assert (g.loc[truth.index].to_numpy() == truth.to_numpy()).all()


def test_cms_narrow_width_forces_collisions(ray_session):
    """A deliberately tiny sketch must overcount SOME key (otherwise the
    est >= exact assertion above is vacuous) while never undercounting."""
    from crusty_ray.ops.sketch import cms_user_counts_ds
    got = cms_user_counts_ds(SF, depth=2, width=4).to_pandas()
    assert (got["cms_est"] >= got["exact_n"]).all()
    assert (got["cms_est"] > got["exact_n"]).any()


# ------------------------------------------------------- label propagation

def test_label_propagation_planted(ray_session):
    """Path graph 1-2-3-4-5 with seeds at the ends: round/tie mechanics.
    seeds: 1→7, 5→3. Round 1: 2 gets 7, 4 gets 3; 3 ties {7,3} → takes
    the LOWER label 3 in round 2. Seeds never change."""
    import ray
    from crusty_ray.ops.graph import label_propagation
    edges = ray.data.from_pandas(pd.DataFrame(
        {"a": [1, 2, 3, 4], "b": [2, 3, 4, 5]}))
    seeds = ray.data.from_pandas(pd.DataFrame(
        {"node": [1, 5], "lab": [7, 3]}))
    got = label_propagation(edges, seeds, "node", "lab", rounds=2,
                            num_partitions=4).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    exp = pd.DataFrame({"node": [1, 2, 3, 4, 5],
                        "lab": [7, 7, 3, 3, 3],
                        "assigned_round": [0, 1, 2, 1, 0]})
    pd.testing.assert_frame_equal(got.astype("int64"), exp.astype("int64"))


def test_label_propagation_unreached_and_clamped(ray_session):
    """A node with no labeled path gets NO row; a seed surrounded by
    opposite labels keeps its own (hard clamping)."""
    import ray
    from crusty_ray.ops.graph import label_propagation
    # component {1,2}: seed 1. component {3,4}: no seed. seed 5 adjacent
    # to three nodes that all get label 9 — stays 1.
    edges = ray.data.from_pandas(pd.DataFrame(
        {"a": [1, 3, 5, 5, 5, 6, 7, 8],
         "b": [2, 4, 6, 7, 8, 9, 9, 9]}))
    seeds = ray.data.from_pandas(pd.DataFrame(
        {"node": [1, 5, 9], "lab": [4, 1, 9]}))
    got = label_propagation(edges, seeds, "node", "lab", rounds=3,
                            num_partitions=4).to_pandas() \
        .set_index("node")
    assert 3 not in got.index and 4 not in got.index
    assert got.loc[5, "lab"] == 1 and got.loc[5, "assigned_round"] == 0
    assert got.loc[2, "lab"] == 4
    for n in (6, 7, 8):  # two labeled nbrs {1, 9} → modal tie → lower = 1
        assert got.loc[n, "lab"] == 1 and got.loc[n, "assigned_round"] == 1


# ------------------------------------------------------ empty-input guards

def test_session_r_empty_input_guards(ray_session):
    """Empty edge/event sets must return typed-empty (or seed-only)
    results, not crash in hash_join/cell-table schema probes."""
    import ray
    from crusty_ray.ops.graph import label_propagation, neighbor_feature_agg
    from crusty_ray.ops.sketch import count_min_cells
    empty_edges = ray.data.from_pandas(pd.DataFrame(
        {"a": pd.Series([], dtype="int64"),
         "b": pd.Series([], dtype="int64")}))
    feats = ray.data.from_pandas(pd.DataFrame({"node": [1], "f": [2]}))
    got = neighbor_feature_agg(empty_edges, feats, "node", "f").to_pandas()
    # Ray's to_pandas drops columns from all-empty datasets — the guard's
    # contract is "no crash, zero rows", same as the pagerank guard
    assert len(got) == 0
    seeds = ray.data.from_pandas(pd.DataFrame({"node": [1], "lab": [9]}))
    lp = label_propagation(empty_edges, seeds, "node", "lab",
                           rounds=2).to_pandas()
    assert len(lp) == 1 and lp.loc[0, "lab"] == 9
    ev = ray.data.from_pandas(pd.DataFrame(
        {"user_id": pd.Series([], dtype="int64")}))
    cells = count_min_cells(ev, "user_id").to_pandas()
    assert len(cells) == 0


# ------------------------------------------------------- embedding drift

def test_embedding_drift_matches_numpy_reference(ray_session):
    """drift_d2 per label ≡ a pure-numpy replica of the floor-mean
    convention (floor_divide on quantized sums, label vs global)."""
    from crusty_ray.ops.similarity import embedding_drift_by_label_ds
    got = embedding_drift_by_label_ds(SF).to_pandas() \
        .sort_values("label").reset_index(drop=True)
    emb = pd.read_parquet(f"{SF}/embeddings.parquet",
                          columns=["embedding", "label"])
    q = np.floor(np.stack([np.asarray(v, np.float64)
                           for v in emb["embedding"]]) * 1000.0) \
        .astype(np.int64)
    labs = emb["label"].to_numpy()
    gmean = np.floor_divide(q.sum(axis=0), len(q))
    exp = []
    for lab in sorted(pd.unique(labs)):
        sel = q[labs == lab]
        lmean = np.floor_divide(sel.sum(axis=0), len(sel))
        exp.append((int(lab), len(sel), int(((lmean - gmean) ** 2).sum())))
    ref = pd.DataFrame(exp, columns=["label", "n", "drift_d2"])
    pd.testing.assert_frame_equal(got.astype("int64"), ref.astype("int64"))


# ----------------------------------------------------------------- HITS

def test_hits_planted_one_round(ray_session):
    """Hand-computed 1-round HITS on a 2x3 bipartite graph. Edges:
    h1→{a1,a2,a3}, h2→{a1}. a1 raw = indeg: a1=2,a2=1,a3=1 → norm (×1e6//2)
    = [1e6, 5e5, 5e5]. h raw: h1 = 2e6, h2 = 1e6 → norm = [1e6, 5e5]."""
    import ray
    from crusty_ray.ops.graph import hits_scores
    edges = ray.data.from_pandas(pd.DataFrame(
        {"hub": [1, 1, 1, 2], "auth": [10, 20, 30, 10]}))
    got = hits_scores(edges, rounds=1, num_partitions=4).to_pandas() \
        .sort_values(["side", "node"]).reset_index(drop=True)
    exp = pd.DataFrame({
        "side": ["authority", "authority", "authority", "hub", "hub"],
        "node": [10, 20, 30, 1, 2],
        "score": [1_000_000, 500_000, 500_000, 1_000_000, 500_000]})
    pd.testing.assert_frame_equal(
        got, exp.astype({"node": "int64", "score": "int64"}))


def test_purchase_hits_shape_and_normalization(ray_session):
    """Both sides rank 1..25, scores weakly decreasing within a side, and
    each side's top score is exactly the normalization scale."""
    from crusty_ray.ops.graph import purchase_hits_ds
    got = purchase_hits_ds(SF).to_pandas()
    for side, g in got.groupby("side"):
        g = g.sort_values("rnk")
        assert list(g["rnk"]) == list(range(1, 26))
        assert g["score"].is_monotonic_decreasing  # non-strict: ties ok
        assert g["score"].iloc[0] == 1_000_000


# ------------------------------------------ incremental view maintenance

def test_ivm_maintained_equals_recompute(ray_session):
    """The IVM contract: base sums + per-key deltas ≡ recomputing the
    view from the merged latest rows (the upsert face)."""
    from crusty_ray.ops.analytic import (ivm_segment_totals_ds,
                                         upsert_orders_latest_ds)
    got = ivm_segment_totals_ds(SF).to_pandas() \
        .sort_values("segment").reset_index(drop=True)
    latest = upsert_orders_latest_ds(SF).to_pandas()
    ref = latest.assign(segment=latest["o_orderkey"] % 10) \
        .groupby("segment", as_index=False) \
        .agg(n_keys=("o_orderkey", "size"), total_cents=("final_cents",
                                                         "sum")) \
        .sort_values("segment").reset_index(drop=True)
    pd.testing.assert_frame_equal(got.astype("int64"), ref.astype("int64"))


def test_ivm_delta_aggregate_planted(ray_session):
    """Hand-computed deltas incl. an update whose key spans blocks and an
    insert-as-update (no base row): k=1 base 100 → 110 → 95; k=2 base 50;
    k=3 arrives only as version-1 row of value 7 (counts 0, adds 7)."""
    import ray
    from crusty_ray.ops.analytic import ivm_delta_aggregate
    b1 = pd.DataFrame({"k": [1, 2], "version": [0, 0], "cents": [100, 50]})
    b2 = pd.DataFrame({"k": [1, 1, 3], "version": [2, 1, 1],
                       "cents": [95, 110, 7]})
    ds = ray.data.from_pandas([b1, b2])
    got = ivm_delta_aggregate(
        ds, "k", "version", "cents",
        lambda df: df["k"].to_numpy(np.int64) % 2,
        num_partitions=4).to_pandas() \
        .sort_values("segment").reset_index(drop=True)
    # segment 0: k=2 → (1, 50); segment 1: k=1 gives 95 (100+10-15),
    # k=3 gives 7 with count 0 → (1, 102)
    exp = pd.DataFrame({"segment": [0, 1], "n_keys": [1, 1],
                        "total": [50, 102]})
    pd.testing.assert_frame_equal(got.astype("int64"), exp.astype("int64"))


# --------------------------------------------------- bloom prune report

def test_bloom_prune_no_false_negatives_and_fp_visible(ray_session):
    """Every (query user, shard) pair that truly exists must appear with
    hit=1 (bloom guarantees no false negatives); a deliberately tiny bit
    space must produce hit=0 rows (false positives — the pruning cost)."""
    from crusty_ray.ops.pack import bloom_prune_report_ds
    got = bloom_prune_report_ds(SF).to_pandas()
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["ts", "user_id"])
    shard = (ev["ts"].astype("int64") // 3_600_000_000).astype("int64")
    su = pd.DataFrame({"shard": shard, "user_id": ev["user_id"]}) \
        .drop_duplicates()
    q = sorted(su["user_id"].unique())[:20]
    truth = su[su["user_id"].isin(q)]
    have = set(map(tuple, got.loc[got["hit"] == 1,
                                  ["user_id", "shard"]].to_numpy()))
    want = set(map(tuple, truth[["user_id", "shard"]].to_numpy()))
    assert have == want  # no false negatives, and hit=1 only when true
    tiny = bloom_prune_report_ds(SF, nbits=16).to_pandas()
    assert (tiny["hit"] == 0).any(), "16-bit space must force collisions"
    have16 = set(map(tuple, tiny.loc[tiny["hit"] == 1,
                                     ["user_id", "shard"]].to_numpy()))
    assert have16 == want
