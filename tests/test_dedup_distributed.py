"""Distributed pair-generation ≡ single-process brute force (r2 rewrites).

The r1 versions of simhash_pairs / minhash_dedup_pairs materialized tables on
the driver; the r2 versions are bucketed shuffles. These tests pin the exact
output semantics to a brute-force recomputation at sf0.001.
"""

from collections import defaultdict

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from crusty_ray.ops import dedup

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs():
    return pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()


def test_simhash_pairs_match_bruteforce(ray_session, docs):
    res = dedup.simhash_pairs(SF, 3, "md5").to_pandas() \
        .sort_values(["doc_a", "doc_b"]).reset_index(drop=True).astype("int64")
    sigs = {int(d): np.uint64(dedup.simhash64(t or "", dedup.md5_token_hash))
            for d, t in zip(docs.doc_id, docs.text)}
    cand = set()
    for q in range(4):
        buckets = defaultdict(list)
        for d, v in sigs.items():
            buckets[int((v >> np.uint64(16 * q)) & np.uint64(0xFFFF))].append(d)
        for ids in buckets.values():
            ids = sorted(ids)
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    cand.add((ids[i], ids[j]))
    rows = [{"doc_a": a, "doc_b": b,
             "hamming": bin(int(sigs[a]) ^ int(sigs[b])).count("1")}
            for a, b in sorted(cand)
            if bin(int(sigs[a]) ^ int(sigs[b])).count("1") <= 3]
    exp = pd.DataFrame(rows, columns=["doc_a", "doc_b", "hamming"]).astype("int64")
    pd.testing.assert_frame_equal(res, exp)


def test_simhash_crc_path_runs(ray_session):
    # the fast (crc) engine path shares the plan; just confirm it executes
    res = dedup.simhash_pairs(SF, 3, "crc").to_pandas()
    assert set(res.columns) == {"doc_a", "doc_b", "hamming"}


def test_blocked_self_join_equals_allpairs(ray_session, tmp_path):
    """blocked_self_join (chunk-pair decomposition) produces exactly the
    all-pairs-within-label result, including on a skewed hot label."""
    import pyarrow as pa
    import ray

    rng = np.random.default_rng(7)
    n = 400
    labels = ["hot"] * 300 + [f"l{i % 5}" for i in range(100)]  # skew
    ids = np.arange(n, dtype=np.int64)
    vecs = rng.integers(-50, 50, size=(n, 8)).astype(np.int64)
    t = pa.table({"vec_id": ids, "label": labels,
                  "q": [v.tolist() for v in vecs]})
    ds = ray.data.from_arrow(t).map_batches(lambda b: b,
                                            batch_format="pandas")
    THRESH = 2000

    def score(ga, gb):
        if not len(ga):
            return pd.DataFrame({"vec_a": pd.Series([], dtype="int64"),
                                 "vec_b": pd.Series([], dtype="int64"),
                                 "qdot": pd.Series([], dtype="int64")})
        ia = ga["vec_id"].to_numpy().astype(np.int64)
        ma = np.stack(ga["q"].to_list())
        if gb is None:
            order = np.argsort(ia)
            ia, ma = ia[order], ma[order]
            dots = ma @ ma.T
            iu, ju = np.triu_indices(len(ia), k=1)
            keep = dots[iu, ju] >= THRESH
            return pd.DataFrame({"vec_a": ia[iu[keep]], "vec_b": ia[ju[keep]],
                                 "qdot": dots[iu, ju][keep].astype("int64")})
        ib = gb["vec_id"].to_numpy().astype(np.int64)
        mb = np.stack(gb["q"].to_list())
        dots = ma @ mb.T
        r, c = np.nonzero(dots >= THRESH)
        return pd.DataFrame({"vec_a": np.minimum(ia[r], ib[c]),
                             "vec_b": np.maximum(ia[r], ib[c]),
                             "qdot": dots[r, c].astype("int64")})

    got = dedup.blocked_self_join(ds, "label", "vec_id", score).to_pandas() \
        .sort_values(["vec_a", "vec_b"]).reset_index(drop=True)

    # naive all-pairs reference
    rows = []
    df = t.to_pandas()
    for _, g in df.groupby("label"):
        gi = g["vec_id"].to_numpy()
        gm = np.stack(g["q"].to_list())
        order = np.argsort(gi)
        gi, gm = gi[order], gm[order]
        dots = gm @ gm.T
        for i in range(len(gi)):
            for j in range(i + 1, len(gi)):
                if dots[i, j] >= THRESH:
                    rows.append((gi[i], gi[j], dots[i, j]))
    exp = pd.DataFrame(rows, columns=["vec_a", "vec_b", "qdot"]) \
        .astype("int64").sort_values(["vec_a", "vec_b"]).reset_index(drop=True)
    assert len(exp) > 50  # non-trivial pair volume
    pd.testing.assert_frame_equal(got, exp)


def test_blocked_self_join_single_chunk_label(ray_session):
    """Regression (r2 ADVICE, high): a label whose ids all share id % K
    lands in ONE chunk; its cross-chunk (a,b) groups then contain rows from
    only chunk a and were mis-scored as diagonals, emitting every pair K
    times. Pairs must appear exactly once."""
    import pyarrow as pa
    import ray

    # every id ≡ 0 (mod 8) → all rows of the label live in chunk 0
    ids = np.arange(0, 5 * 8, 8, dtype=np.int64)
    vecs = np.eye(5, 4, dtype=np.int64) + 10  # all pairs exceed THRESH
    t = pa.table({"vec_id": ids, "label": ["solo"] * 5,
                  "q": [v.tolist() for v in vecs]})
    ds = ray.data.from_arrow(t).map_batches(lambda b: b,
                                            batch_format="pandas")

    def score(ga, gb):
        if not len(ga):
            return pd.DataFrame({"vec_a": pd.Series([], dtype="int64"),
                                 "vec_b": pd.Series([], dtype="int64")})
        ia = np.sort(ga["vec_id"].to_numpy().astype(np.int64))
        if gb is None:
            iu, ju = np.triu_indices(len(ia), k=1)
            return pd.DataFrame({"vec_a": ia[iu], "vec_b": ia[ju]})
        ib = gb["vec_id"].to_numpy().astype(np.int64)
        a = np.repeat(ia, len(ib))
        b = np.tile(ib, len(ia))
        return pd.DataFrame({"vec_a": np.minimum(a, b),
                             "vec_b": np.maximum(a, b)})

    got = dedup.blocked_self_join(ds, "label", "vec_id", score).to_pandas() \
        .sort_values(["vec_a", "vec_b"]).reset_index(drop=True)
    iu, ju = np.triu_indices(5, k=1)
    exp = pd.DataFrame({"vec_a": ids[iu], "vec_b": ids[ju]}) \
        .sort_values(["vec_a", "vec_b"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp)  # each pair exactly once


def test_minhash_verify_matches_bruteforce(ray_session, docs):
    res = dedup.minhash_dedup_pairs(SF).to_pandas() \
        .sort_values(["doc_a", "doc_b"]).reset_index(drop=True).astype("int64")
    cands = dedup.minhash_candidates_ds(SF).to_pandas()
    grams = {int(r.doc_id): dedup.word_ngrams(r.text or "")
             for r in docs.itertuples()}
    rows = []
    for a, b in zip(cands.doc_a, cands.doc_b):
        ga, gb = grams.get(int(a), set()), grams.get(int(b), set())
        union = len(ga | gb) or 1
        j = len(ga & gb) / union
        if j >= 0.7:
            rows.append({"doc_a": int(a), "doc_b": int(b),
                         "jaccard_pm": int(round(j * 1000))})
    exp = pd.DataFrame(rows, columns=["doc_a", "doc_b", "jaccard_pm"]) \
        .astype("int64").sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(res, exp)


class TestStopHashCaps:
    """Deterministic hot-bucket caps (r2 VERDICT #5): a pathological bucket
    is dropped whole, bounding per-bucket work; uncapped mode is unchanged
    (the oracle faces run uncapped — their bit-exact tests stay green)."""

    def test_quadrant_cap_drops_hot_bucket_only(self, ray_session):
        import pyarrow as pa
        import ray

        # 40 all-zero signatures: every quadrant bucket is hot (the classic
        # boilerplate-shell pathology) + one genuine near pair off to the
        # side that shares only cold buckets
        n_hot = 40
        sigs = [0] * n_hot + [int(0x0101010101010101), int(0x0101010101010111)]
        ids = list(range(len(sigs)))
        t = pa.table({"doc_id": pa.array(ids, pa.int64()),
                      "sig": pa.array(sigs, pa.int64())})
        ds = ray.data.from_arrow(t).map_batches(lambda b: b,
                                                batch_format="pandas")
        capped = dedup.signature_quadrant_pairs(
            ds, "doc_id", "sig", 3, "doc_a", "doc_b", max_bucket=8) \
            .to_pandas().sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
        # hot-bucket (all-zero crowd) pairs gone; the cold genuine pair kept
        assert list(capped.doc_a) == [n_hot]
        assert list(capped.doc_b) == [n_hot + 1]

        uncapped = dedup.signature_quadrant_pairs(
            ds, "doc_id", "sig", 3, "doc_a", "doc_b").to_pandas()
        assert len(uncapped) == n_hot * (n_hot - 1) // 2 + 1

    def test_minhash_band_cap(self, ray_session, tmp_path, docs):
        import pyarrow.parquet as pq

        # clone one doc 30x: its band buckets all exceed the cap; normal
        # docs' candidates must be unaffected
        base = docs.head(20).copy()
        clones = pd.concat([base.iloc[[0]]] * 30, ignore_index=True)
        clones["doc_id"] = 10_000 + pd.RangeIndex(30)
        skewed = pd.concat([base, clones], ignore_index=True)
        d = tmp_path / "skew"
        d.mkdir()
        pq.write_table(__import__("pyarrow").Table.from_pandas(
            skewed, preserve_index=False), str(d / "documents.parquet"))

        capped = dedup.minhash_candidates_ds(str(d), max_bucket=10) \
            .to_pandas()
        uncapped = dedup.minhash_candidates_ds(str(d)).to_pandas()
        clone_ids = set(range(10_000, 10_030)) | {int(base.iloc[0].doc_id)}
        # every clone-cluster pair came only from hot (capped) buckets
        hot = uncapped[uncapped.doc_a.isin(clone_ids)
                       & uncapped.doc_b.isin(clone_ids)]
        assert len(hot) == len(clone_ids) * (len(clone_ids) - 1) // 2
        assert not capped.doc_a.isin(clone_ids).any()
        # non-hot candidates identical to the uncapped plan
        cold_un = uncapped[~uncapped.doc_a.isin(clone_ids)
                           & ~uncapped.doc_b.isin(clone_ids)]
        pd.testing.assert_frame_equal(
            capped.sort_values(["doc_a", "doc_b"]).reset_index(drop=True),
            cold_un.sort_values(["doc_a", "doc_b"]).reset_index(drop=True))

    def test_ngram_stop_gram_cap(self, ray_session, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        # one gram ("a b c") shared by every doc; pairs must survive with
        # jaccard over the remaining grams only
        texts = [f"a b c u{i} v{i} w{i}" for i in range(6)]
        texts += ["a b c x y z", "a b c x y z"]  # true dups incl. stop gram
        t = pa.table({"doc_id": pa.array(range(8), pa.int64()),
                      "source": ["s"] * 8, "text": texts})
        d = tmp_path / "g"
        d.mkdir()
        pq.write_table(t, str(d / "documents.parquet"))
        capped = dedup.ngram_jaccard_pairs_ds(
            str(d), threshold_pm=500, max_gram_df=4).to_pandas() \
            .sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
        # docs 6,7 share all non-stop grams → jaccard 1000; others share
        # nothing once the stop gram is removed
        assert list(capped.itertuples(index=False)) == [(6, 7, 1000)]

    def test_ngram_containment_catches_embedded_doc(self, ray_session,
                                                    tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        # doc 0 (5 tokens, 3 grams) is verbatim-embedded in doc 1 (25
        # tokens): containment = 3/min(3,23) = 1000 but jaccard =
        # 3/(3+23-3) = 130 pm — the asymmetric face must catch what the
        # symmetric one dilutes below threshold
        short = "p q r s t"
        long = short + " " + " ".join(f"u{i}" for i in range(20))
        t = pa.table({"doc_id": pa.array([0, 1], pa.int64()),
                      "source": ["s", "s"], "text": [short, long]})
        d = tmp_path / "c"
        d.mkdir()
        pq.write_table(t, str(d / "documents.parquet"))
        cont = dedup.ngram_containment_pairs_ds(str(d), threshold_pm=500) \
            .to_pandas()
        assert list(cont.itertuples(index=False)) == [(0, 1, 1000)]
        jac = dedup.ngram_jaccard_pairs_ds(str(d), threshold_pm=500) \
            .to_pandas()
        assert len(jac) == 0


def test_connected_components_matches_union_find(ray_session):
    """Hash-min label propagation ≡ union-find, including a long chain
    (diameter ≫ 1 → multiple propagation rounds) and isolated nodes."""
    import pyarrow as pa
    import ray

    rng = np.random.default_rng(3)
    n = 200
    edges = [(i, i + 1) for i in range(40)]            # chain 0..40
    edges += [(100, 101), (101, 102), (100, 103)]      # small star
    edges += [(150 + i, 150 + rng.integers(0, i + 1)) for i in range(1, 20)]
    nodes = list(range(n))

    parent = list(range(n))
    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    for u, v in edges:
        parent[find(u)] = find(v)
    exp = {i: min(j for j in nodes if find(j) == find(i)) for i in nodes}

    e_t = pa.table({"u": pa.array([u for u, _ in edges], pa.int64()),
                    "v": pa.array([v for _, v in edges], pa.int64())})
    n_t = pa.table({"nid": pa.array(nodes, pa.int64())})
    got = dedup.connected_components(
        ray.data.from_arrow(e_t).map_batches(lambda b: b, batch_format="pandas"),
        ray.data.from_arrow(n_t).map_batches(lambda b: b, batch_format="pandas"),
        "nid").to_pandas().sort_values("nid").reset_index(drop=True)
    assert dict(zip(got.nid, got.component_id)) == exp


def test_connected_components_bsp_path(ray_session):
    """driver_threshold=0 forces the BSP label-propagation rounds; a chain
    (diameter 12) exercises the shortcut-edge convergence."""
    import pyarrow as pa
    import ray

    edges = [(i, i + 1) for i in range(12)] + [(30, 31)]
    nodes = list(range(40))
    e_t = pa.table({"u": pa.array([u for u, _ in edges], pa.int64()),
                    "v": pa.array([v for _, v in edges], pa.int64())})
    n_t = pa.table({"nid": pa.array(nodes, pa.int64())})
    got = dedup.connected_components(
        ray.data.from_arrow(e_t).map_batches(lambda b: b, batch_format="pandas"),
        ray.data.from_arrow(n_t).map_batches(lambda b: b, batch_format="pandas"),
        "nid", num_partitions=4, driver_threshold=0) \
        .to_pandas().sort_values("nid").reset_index(drop=True)
    comp = dict(zip(got.nid, got.component_id))
    assert all(comp[i] == 0 for i in range(13))
    assert comp[30] == 30 and comp[31] == 30
    assert all(comp[i] == i for i in range(13, 30))


def test_connected_components_no_edges(ray_session):
    """Zero near-dup pairs (contract queries note this is reachable): every
    node is its own component; no KeyError on the empty edge frame."""
    import pyarrow as pa
    import ray

    e_t = pa.table({"u": pa.array([], pa.int64()),
                    "v": pa.array([], pa.int64())})
    n_t = pa.table({"nid": pa.array([3, 1, 2], pa.int64())})
    got = dedup.connected_components(
        ray.data.from_arrow(e_t).map_batches(lambda b: b, batch_format="pandas"),
        ray.data.from_arrow(n_t).map_batches(lambda b: b, batch_format="pandas"),
        "nid").to_pandas().sort_values("nid").reset_index(drop=True)
    assert list(got.nid) == [1, 2, 3]
    assert list(got.component_id) == [1, 2, 3]


def test_connected_components_bsp_string_ids(ray_session):
    """String ids on the forced BSP path go through the distributed
    dictionary encoding and must label every node with the min ORIGINAL id
    of its component — identical to the driver union-find path. Chain +
    star + isolated nodes; ids deliberately NOT in hash order."""
    import pyarrow as pa
    import ray

    nodes = [f"img-{i:03d}" for i in range(30)]
    edges = [(f"img-{i:03d}", f"img-{i+1:03d}") for i in range(8)]   # chain
    edges += [("img-020", "img-025"), ("img-025", "img-021")]        # star
    e_t = pa.table({"u": [u for u, _ in edges],
                    "v": [v for _, v in edges]})
    n_t = pa.table({"nid": nodes})

    def run(thresh):
        got = dedup.connected_components(
            ray.data.from_arrow(e_t).map_batches(lambda b: b,
                                                 batch_format="pandas"),
            ray.data.from_arrow(n_t).map_batches(lambda b: b,
                                                 batch_format="pandas"),
            "nid", num_partitions=4, driver_threshold=thresh) \
            .to_pandas().sort_values("nid").reset_index(drop=True)
        return dict(zip(got.nid, got.component_id))

    bsp, driver = run(0), run(10 ** 9)
    assert bsp == driver
    assert all(bsp[f"img-{i:03d}"] == "img-000" for i in range(9))
    assert bsp["img-020"] == bsp["img-021"] == bsp["img-025"] == "img-020"
    assert bsp["img-029"] == "img-029"


def test_connected_components_bsp_string_ids_empty_translate(ray_session):
    """Edges whose endpoints are absent from nodes_ds drop in translation;
    the encoded path must still label every node (as itself here)."""
    import pyarrow as pa
    import ray

    e_t = pa.table({"u": ["ghost-1"], "v": ["ghost-2"]})
    n_t = pa.table({"nid": ["a", "b"]})
    got = dedup.connected_components(
        ray.data.from_arrow(e_t).map_batches(lambda b: b,
                                             batch_format="pandas"),
        ray.data.from_arrow(n_t).map_batches(lambda b: b,
                                             batch_format="pandas"),
        "nid", num_partitions=4, driver_threshold=0) \
        .to_pandas().sort_values("nid").reset_index(drop=True)
    assert dict(zip(got.nid, got.component_id)) == {"a": "a", "b": "b"}


def test_connected_components_foreign_edge_endpoints(ray_session):
    """An id present only in EDGES conducts connectivity but emits no output
    row — identical semantics on the driver, int-BSP, and encoded paths
    (late-r3 review fix: the BSP path used to emit rows for such ids, the
    encoded path used to drop their edges entirely)."""
    import pyarrow as pa
    import ray

    def run(ids, edges, threshold):
        e_t = pa.table({"u": pa.array([u for u, _ in edges]),
                        "v": pa.array([v for _, v in edges])})
        n_t = pa.table({"nid": pa.array(ids)})
        return dedup.connected_components(
            ray.data.from_arrow(e_t).map_batches(lambda b: b,
                                                 batch_format="pandas"),
            ray.data.from_arrow(n_t).map_batches(lambda b: b,
                                                 batch_format="pandas"),
            "nid", num_partitions=3, driver_threshold=threshold) \
            .to_pandas().sort_values("nid").reset_index(drop=True)

    # int ids: X=99 bridges 1 and 2; 50 only-in-edges pair with node 3
    ids = [1, 2, 3, 4]
    edges = [(1, 99), (99, 2), (3, 50)]
    for thr in (1_000_000, 0):  # driver path, then forced BSP
        got = run(ids, edges, thr)
        assert list(got.nid) == ids, thr
        comp = dict(zip(got.nid, got.component_id))
        assert comp[1] == comp[2], thr          # connected THROUGH 99
        assert comp[3] == min(3, 50), thr       # canonical may be foreign
        assert comp[4] == 4, thr

    # string ids: same shape through the encoded path
    sids = ["a", "b", "c", "d"]
    sedges = [("a", "xx"), ("xx", "b"), ("c", "00")]
    for thr in (1_000_000, 0):
        got = run(sids, sedges, thr)
        assert list(got.nid) == sids, thr
        comp = dict(zip(got.nid, got.component_id))
        assert comp["a"] == comp["b"], thr
        assert comp["c"] == min("c", "00"), thr
        assert comp["d"] == "d", thr


def test_bipartite_matches_equal_bruteforce(ray_session):
    """signature_quadrant_matches ≡ brute-force new×corpus hamming check
    (pigeonhole exact at radius 3), including multi-quadrant matches and
    buckets that are all-new / all-corpus."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray

    from crusty_ray.ops.dedup import signature_quadrant_matches

    rng = np.random.default_rng(17)
    base = rng.integers(0, 2**63, 60, dtype=np.int64)
    sigs = list(base)
    # plant near-dups: corpus sig with 0-3 bits flipped for some new rows
    for i in range(8):
        flips = rng.choice(64, size=i % 4, replace=False)
        v = int(base[i])
        for f in flips:
            v ^= (1 << int(f))
        sigs.append(np.int64(v & (2**63 - 1)))
    df = pd.DataFrame({
        "doc_id": np.arange(len(sigs), dtype=np.int64),
        "simhash": np.array(sigs, dtype=np.int64),
        "is_new": np.arange(len(sigs)) >= 60,
    })

    parts = np.array_split(df.sample(frac=1.0, random_state=3), 4)
    ds = ray.data.from_arrow([pa.Table.from_pandas(p, preserve_index=False)
                              for p in parts])
    got = signature_quadrant_matches(ds, "doc_id", "simhash", "is_new", 3,
                                     num_partitions=4).to_pandas()
    got_ids = sorted(got["doc_id"].tolist()) if len(got) else []

    new = df[df.is_new]
    corp = df[~df.is_new]
    nv = new["simhash"].to_numpy().astype(np.int64).view(np.uint64)
    cv = corp["simhash"].to_numpy().astype(np.int64).view(np.uint64)
    x = nv[:, None] ^ cv[None, :]
    d = np.vectorize(lambda v: bin(int(v)).count("1"))(x)
    exp_ids = sorted(new["doc_id"].to_numpy()[(d <= 3).any(axis=1)].tolist())
    assert got_ids == exp_ids
    assert len(exp_ids) >= 6  # the planted dups are actually found


class TestSemDedup:
    """semdedup_ds vs a serial whole-corpus greedy recomputation, over a
    planted fixture (the sf embeddings are i.i.d. random — max pairwise
    cosine 0.48 — so near-dup structure must be planted)."""

    DIM = 16

    def _fixture(self, tmp_path, n_base=40, n_dups=12, seed=5):
        """n_base random unit vectors; the first n_dups each get a near-copy
        (tiny perturbation → cosine ≫ 0.95). Returns (dir, ids, unit_mat)."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        rng = np.random.default_rng(seed)
        base = rng.standard_normal((n_base, self.DIM))
        rows = [v for v in base]
        for k in range(n_dups):
            rows.append(base[k] + 0.01 * rng.standard_normal(self.DIM))
        mat = np.stack(rows)
        mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        ids = np.arange(len(mat), dtype=np.int64)
        t = pa.table({
            "vec_id": ids,
            "embedding": pa.array([list(map(float, v)) for v in mat],
                                  pa.list_(pa.float32())),
            "label": np.zeros(len(mat), dtype=np.int32),
        })
        d = tmp_path / "semdedup"
        d.mkdir()
        pq.write_table(t, str(d / "embeddings.parquet"))
        # recompute unit vectors from the WRITTEN float32 payload — the op
        # reads float32, so the oracle must too
        stored = pq.read_table(str(d / "embeddings.parquet")).to_pandas()
        stored = stored.sort_values("vec_id").reset_index(drop=True)
        m = np.stack(stored["embedding"].to_list()).astype(np.float64)
        m = m / np.linalg.norm(m, axis=1, keepdims=True)
        return str(d), stored["vec_id"].to_numpy().astype(np.int64), m

    @staticmethod
    def _serial_greedy(ids, nv, threshold_pm):
        pm = np.floor((nv @ nv.T) * 1000.0).astype(np.int64)
        keep, dup_of, kept = {}, {}, []
        for i in range(len(ids)):
            if kept:
                sims = pm[i, kept]
                j = int(np.argmax(sims))
                if sims[j] >= threshold_pm:
                    keep[int(ids[i])] = False
                    dup_of[int(ids[i])] = int(ids[kept[j]])
                    continue
            keep[int(ids[i])] = True
            dup_of[int(ids[i])] = -1
            kept.append(i)
        return keep, dup_of

    def test_single_cluster_equals_serial_greedy(self, ray_session, tmp_path):
        from crusty_ray.ops.dedup import semdedup_ds
        d, ids, nv = self._fixture(tmp_path)
        got = semdedup_ds(d, n_clusters=1, threshold_pm=950).to_pandas() \
            .sort_values("vec_id").reset_index(drop=True)
        keep, dup_of = self._serial_greedy(ids, nv, 950)
        assert len(got) == len(ids)
        assert (got["cluster"] == 0).all()
        for r in got.itertuples():
            assert bool(r.keep) == keep[int(r.vec_id)], r.vec_id
            assert int(r.dup_of) == dup_of[int(r.vec_id)], r.vec_id
        # every planted near-copy is actually dropped
        assert (~got["keep"]).sum() == 12

    def test_multi_cluster_invariants_and_determinism(self, ray_session,
                                                      tmp_path):
        from crusty_ray.ops.dedup import semdedup_ds
        d, ids, nv = self._fixture(tmp_path)
        idx = {int(v): i for i, v in enumerate(ids)}
        got = semdedup_ds(d, n_clusters=6, threshold_pm=950).to_pandas() \
            .sort_values("vec_id").reset_index(drop=True)
        # exactly one verdict per vector
        assert sorted(got["vec_id"].tolist()) == sorted(ids.tolist())
        kept = got[got["keep"]]
        dropped = got[~got["keep"]]
        assert (kept["dup_of"] == -1).all()
        kept_by_id = dict(zip(kept["vec_id"], kept["cluster"]))
        pm = np.floor((nv @ nv.T) * 1000.0).astype(np.int64)
        for r in dropped.itertuples():
            # dup_of is a KEPT, earlier row of the SAME cluster, above thresh
            assert r.dup_of in kept_by_id, r.vec_id
            assert kept_by_id[r.dup_of] == r.cluster
            assert r.dup_of < r.vec_id
            assert pm[idx[int(r.vec_id)], idx[int(r.dup_of)]] >= 950
        # a near-copy lands in its original's cluster (identical direction
        # up to 1% noise) → all 12 planted dups are still caught
        assert (~got["keep"]).sum() == 12
        # deterministic across runs
        again = semdedup_ds(d, n_clusters=6, threshold_pm=950).to_pandas() \
            .sort_values("vec_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(got, again)

    def test_sf_face_runs_and_keeps_everything_random(self, ray_session):
        # the sf embeddings are i.i.d. (max cosine 0.48): semdedup at the
        # default threshold must keep every row — the no-false-positive face
        from crusty_ray.ops.dedup import semdedup_ds
        got = semdedup_ds(SF, n_clusters=8, threshold_pm=950).to_pandas()
        assert got["keep"].all()
        assert (got["dup_of"] == -1).all()

    def test_max_cluster_cap_keeps_whole(self, ray_session, tmp_path):
        # cap below the single cluster's size → every row kept, no pruning
        from crusty_ray.ops.dedup import semdedup_ds
        d, ids, nv = self._fixture(tmp_path)
        got = semdedup_ds(d, n_clusters=1, threshold_pm=950,
                          max_cluster=10).to_pandas()
        assert len(got) == len(ids)
        assert got["keep"].all()
        assert (got["dup_of"] == -1).all()


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(seed=st.integers(0, 10_000))
def test_ngram_faces_equal_bruteforce(ray_session, tmp_path_factory, seed):
    """Both gram-partition faces (jaccard + containment) ≡ a pure-Python
    all-pairs reference on random small corpora (tiny vocab → dense gram
    collisions), and containment ≥ jaccard pointwise."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(seed)
    vocab = [f"t{i}" for i in range(8)]
    n_docs = int(rng.integers(4, 11))
    texts = [" ".join(rng.choice(vocab, size=rng.integers(1, 13)))
             for _ in range(n_docs)]
    sources = [f"s{rng.integers(0, 2)}" for _ in range(n_docs)]

    def grams(t):
        toks = t.split(" ")
        return {" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)}

    gsets = [grams(t) for t in texts]
    exp_j, exp_c = {}, {}
    for a in range(n_docs):
        for b in range(a + 1, n_docs):
            if sources[a] != sources[b] or not gsets[a] or not gsets[b]:
                continue
            shared = len(gsets[a] & gsets[b])
            if not shared:
                continue
            j = (1000 * shared) // (len(gsets[a]) + len(gsets[b]) - shared)
            c = (1000 * shared) // min(len(gsets[a]), len(gsets[b]))
            assert c >= j
            if j >= 500:
                exp_j[(a, b)] = j
            if c >= 500:
                exp_c[(a, b)] = c

    d = tmp_path_factory.mktemp("ngram_prop")
    pq.write_table(pa.table({
        "doc_id": pa.array(range(n_docs), pa.int64()),
        "source": sources, "text": texts}),
        str(d / "documents.parquet"))
    got_j = dedup.ngram_jaccard_pairs_ds(str(d)).to_pandas()
    got_c = dedup.ngram_containment_pairs_ds(str(d)).to_pandas()
    assert {(a, b): v for a, b, v in got_j.itertuples(index=False)} == exp_j
    assert {(a, b): v for a, b, v in got_c.itertuples(index=False)} == exp_c


def test_doc_dedup_groups_cap_plumbing(ray_session):
    """An inert cap (larger than any gram's df) must reproduce the
    uncapped bit-exact face; a tight cap still keeps EXACT duplicates
    grouped (md5 edges don't go through the gram stage)."""
    from crusty_ray.ops import dedup

    sf = "/root/testdata/sf0.001"
    base = dedup.doc_dedup_groups_ds(sf).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    inert = dedup.doc_dedup_groups_ds(sf, max_gram_df=10**9).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(base, inert, check_exact=True)

    # a tight cap changes BOTH intersection and union (Jaccard over the
    # non-stop grams), so group structure may shift either way — pin only
    # the contract: LEFT-complete, a valid canonical partition
    capped = dedup.doc_dedup_groups_ds(sf, max_gram_df=2).to_pandas()
    assert len(capped) == len(base)
    assert set(capped["doc_id"]) == set(base["doc_id"])
    mins = capped.groupby("canonical_id", as_index=False)["doc_id"].min()
    assert (mins["canonical_id"] == mins["doc_id"]).all()  # = min member
    assert (capped["keep"] == (capped["doc_id"]
            == capped["canonical_id"]).astype("int64")).all()
