"""ANN scale paths (LSH buckets, IVF inverted lists) vs brute-force ground
truth: structural guarantees plus a recall floor.

Bucketed ANN trades recall for fan-in — the tests pin (a) every returned
neighbor is scored correctly (sim_pm matches brute force for the same pair),
and (b) aggregate recall@k stays above a floor that the default parameters
comfortably clear on the test tables.
"""

import pandas as pd
import pytest

from crusty_ray.ops import similarity

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def brute(ray_session):
    df = similarity.ann_bruteforce_ds(SF, n_queries=8, k=10).to_pandas()
    return df


def _recall(approx: pd.DataFrame, brute: pd.DataFrame) -> float:
    got = approx.groupby("query_id")["vec_id"].apply(set)
    want = brute.groupby("query_id")["vec_id"].apply(set)
    hits = total = 0
    for q, w in want.items():
        hits += len(w & got.get(q, set()))
        total += len(w)
    return hits / total


def test_lsh_recall_and_scores(ray_session, brute):
    # 4 bits (16 buckets) on the tiny test table: the 8-bit default is sized
    # for the sf0.1+ tables where buckets still hold hundreds of vectors
    approx = similarity.ann_lsh_ds(SF, n_queries=8, k=10, n_bits=4).to_pandas()
    assert _recall(approx, brute) >= 0.2
    # scored pairs agree with brute force where they overlap (±1 per-mille:
    # BLAS accumulation order differs with matrix shape, so floor(sim·1000)
    # can flip by one at quantization boundaries)
    merged = approx.merge(brute, on=["query_id", "vec_id"],
                          suffixes=("_a", "_b"))
    assert (merged["sim_pm_a"] - merged["sim_pm_b"]).abs().le(1).all()


def test_ivf_recall_and_scores(ray_session, brute):
    approx = similarity.ann_ivf_ds(SF, n_queries=8, k=10,
                                   n_lists=16, nprobe=4).to_pandas()
    assert _recall(approx, brute) >= 0.5  # nprobe=4 of 16 lists
    merged = approx.merge(brute, on=["query_id", "vec_id"],
                          suffixes=("_a", "_b"))
    assert (merged["sim_pm_a"] - merged["sim_pm_b"]).abs().le(1).all()


def test_pq_recall_and_determinism(ray_session, brute):
    """PQ/ADC returns approximate scores (quantization error is the point),
    so unlike LSH/IVF there is no exact-score agreement to assert; instead:
    recall floor, self-hit sanity (ADC(q, q) is the per-subspace minimum by
    construction, so each query's own vector must appear in its top-k —
    ties with identically-coded cluster mates make exact rank-1 too strict),
    and run-to-run determinism of the seeded codebooks."""
    # fine subspaces (dsub=2) for the recall floor: this table's variance is
    # spread evenly across dims, so coarse 8-dim subspaces quantize harshly
    # at 500 rows (measured 0.41 @ m=8 vs 0.69 @ m=32); the m=8 default is
    # the 8-byte/vector production trade, pinned at its own looser floor
    fine = similarity.ann_pq_ds(SF, n_queries=8, k=10, m=32, ks=16).to_pandas()
    assert _recall(fine, brute) >= 0.6
    approx = similarity.ann_pq_ds(SF, n_queries=8, k=10).to_pandas()
    assert _recall(approx, brute) >= 0.35
    got = approx.groupby("query_id")["vec_id"].apply(set)
    assert all(q in got[q] for q in got.index)
    again = similarity.ann_pq_ds(SF, n_queries=8, k=10).to_pandas()
    a = approx.sort_values(["query_id", "rnk"]).reset_index(drop=True)
    b = again.sort_values(["query_id", "rnk"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_ivf_deterministic(ray_session):
    a = similarity.ann_ivf_ds(SF, n_queries=4, k=5).to_pandas() \
        .sort_values(["query_id", "rnk"]).reset_index(drop=True)
    b = similarity.ann_ivf_ds(SF, n_queries=4, k=5).to_pandas() \
        .sort_values(["query_id", "rnk"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_label_centroids_match_numpy(ray_session):
    """Distributed partial-sum centroids ≡ numpy mean per label (float sums
    are order-dependent, so tolerance 1e-4 — the contract face is rows-only)."""
    import numpy as np
    import pyarrow.parquet as pq
    from crusty_ray.ops.similarity import label_centroids_ds
    sf = "/root/testdata/sf0.01"
    got = label_centroids_ds(sf)
    t = pq.read_table(f"{sf}/embeddings.parquet").to_pandas()
    assert len(got) == t["label"].nunique()
    for _, row in got.iterrows():
        sub = t[t["label"] == row["label"]]
        exp = np.stack(sub["embedding"].to_numpy()).mean(axis=0)
        assert row["n"] == len(sub)
        np.testing.assert_allclose(np.array(row["centroid"]), exp, atol=1e-4)


def test_embedding_outliers_negative_mean_floor(ray_session, tmp_path):
    """Pins the floor-division convention on a NEGATIVE quantized mean:
    numpy floor_divide floors (-7//2 = -4) where DuckDB's integer //
    truncates (-3) — the op and its oracle must agree via floor(double)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    from crusty_ray.ops.similarity import embedding_outliers_ds

    # label 0: two 2-dim vectors with qsum = (-7, 3) over n=2
    #   -> floor mean (-4, 1); q rows (-3,2) and (-4,1)
    #   -> d2: (1)^2+(1)^2 = 2 and 0
    vecs = [[-0.003, 0.002], [-0.004, 0.001]]
    pq.write_table(pa.table({
        "vec_id": pa.array([10, 11], pa.int64()),
        "label": pa.array([0, 0], pa.int64()),
        "embedding": pa.array(vecs, pa.list_(pa.float32())),
    }), str(tmp_path / "embeddings.parquet"))
    got = embedding_outliers_ds(str(tmp_path), threshold=1) \
        .to_pandas().set_index("vec_id").sort_index()
    assert got["d2"].tolist() == [2, 0]
    assert got["is_outlier"].tolist() == [1, 0]

    import duckdb
    import __ray_entry__ as e
    con = duckdb.connect()
    con.sql(f"CREATE VIEW embeddings AS SELECT * FROM "
            f"read_parquet('{tmp_path}/embeddings.parquet')")
    oracle = con.sql(e.oracle_sql()["embedding_outliers"]
                     .replace("> 1000000", "> 1")).df() \
        .set_index("vec_id").sort_index()
    assert oracle["d2"].tolist() == got["d2"].tolist()
    assert oracle["is_outlier"].tolist() == got["is_outlier"].tolist()


def test_hard_negatives_exclude_anchor_label(ray_session):
    """Every mined negative has a label different from its anchor's, and
    each anchor gets exactly k negatives (the sf corpus has plenty)."""
    import duckdb
    from crusty_ray.ops.similarity import hard_negatives_ds

    sf = "/root/testdata/sf0.001"
    got = hard_negatives_ds(sf, n_queries=5, k=10).to_pandas()
    labels = duckdb.sql(
        f"SELECT vec_id, label FROM read_parquet('{sf}/embeddings.parquet')"
    ).df().set_index("vec_id")["label"]
    assert (got.groupby("query_id").size() == 10).all()
    assert got["rnk"].between(1, 10).all()
    for qid, g in got.groupby("query_id"):
        assert (labels.loc[g["vec_id"]].to_numpy()
                != labels.loc[qid]).all(), f"anchor {qid} leaked its label"


def test_embedding_pca_matches_serial(ray_session):
    """Distributed PCA == serial numpy (same sign convention) to 1e-8;
    projections are decorrelated with variances ~ descending eigenvalues."""
    import duckdb
    import numpy as np
    from crusty_ray.ops.similarity import embedding_pca_ds

    sf = "/root/testdata/sf0.001"
    got = embedding_pca_ds(sf, n_components=8).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    df = duckdb.sql(
        f"SELECT vec_id, embedding FROM "
        f"read_parquet('{sf}/embeddings.parquet') ORDER BY vec_id").df()
    mat = np.stack(df["embedding"].to_list()).astype(np.float64)
    mu = mat.mean(axis=0)
    x = mat - mu
    cov = (x.T @ x) / (len(mat) - 1)
    evals, evecs = np.linalg.eigh(cov)
    comps = evecs[:, ::-1][:, :8].T
    for i in range(8):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    want = x @ comps.T

    assert got["vec_id"].tolist() == df["vec_id"].tolist()
    proj = np.stack(got["proj"].to_list())
    np.testing.assert_allclose(proj, want, atol=1e-8)
    # variances track the top eigenvalues, descending
    var = proj.var(axis=0, ddof=1)
    np.testing.assert_allclose(var, evals[::-1][:8], rtol=1e-6)
    assert (np.diff(var) <= 1e-9).all()


# ------------------------- SQL-oracled quantized twins (r4, md5 pattern)

def _qmat(sf: str):
    import numpy as np
    df = pd.read_parquet(f"{sf}/embeddings.parquet")[["vec_id", "embedding"]] \
        .sort_values("vec_id").reset_index(drop=True)
    q = np.stack([np.floor(np.asarray(v, np.float64) * 1000.0)
                  .astype(np.int64) for v in df["embedding"]])
    return df["vec_id"].to_numpy(), q


def test_ivf_quant_matches_reference(ray_session):
    """ann_ivf_quant_ds ≡ a from-scratch serial replay of the whole plan
    (quantize → Lloyd train → assign → probe → integer-dot top-k) — the
    pytest half of the face's oracle pair (the SQL half runs in
    test_driver_contract)."""
    import numpy as np
    n_q, k, n_lists, rounds, nprobe = 8, 10, 8, 2, 2
    ids, q = _qmat(SF)

    cen = q[:n_lists].copy()                      # ids pre-sorted ascending
    for _ in range(rounds):
        d = ((q[:, None, :] - cen[None, :, :]) ** 2).sum(axis=2)
        a = d.argmin(axis=1)
        for c in range(n_lists):
            m = q[a == c]
            if len(m):
                s = m.sum(axis=0)
                cen[c] = np.sign(s) * (np.abs(s) // len(m))   # trunc div
    d = ((q[:, None, :] - cen[None, :, :]) ** 2).sum(axis=2)
    assign = d.argmin(axis=1)

    rows = []
    for qi in range(n_q):
        qd2 = ((q[qi] - cen) ** 2).sum(axis=1)
        probes = np.argsort(qd2, kind="stable")[:nprobe]
        sel = np.nonzero(np.isin(assign, probes))[0]
        dots = q[sel] @ q[qi]
        o = np.lexsort((ids[sel], -dots))[:k]
        for r, j in enumerate(o, start=1):
            rows.append((ids[qi], ids[sel][j], dots[j], r))
    want = pd.DataFrame(rows, columns=["query_id", "vec_id", "qdot", "rnk"])

    got = similarity.ann_ivf_quant_ds(
        SF, n_queries=n_q, k=k, n_lists=n_lists,
        rounds=rounds, nprobe=nprobe).to_pandas()
    got = got.sort_values(["query_id", "rnk"]).reset_index(drop=True)
    want = want.sort_values(["query_id", "rnk"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[want.columns].astype("int64"),
                                  want.astype("int64"))


def test_lsh_md5_matches_reference(ray_session):
    """ann_lsh_md5_ds ≡ a serial replay: md5-parity ±1 planes, strictly-
    positive bucket bits, own-bucket probe, integer-dot top-k."""
    import hashlib
    import numpy as np
    n_q, k, n_bits = 8, 10, 4
    ids, q = _qmat(SF)
    dim = q.shape[1]

    coef = np.empty((n_bits, dim), dtype=np.int64)
    for b in range(n_bits):
        for i in range(1, dim + 1):
            h = int(hashlib.md5(f"lshp{b}:{i}".encode()).hexdigest()[:8], 16)
            coef[b, i - 1] = 1 if h % 2 == 0 else -1
    proj = coef @ q.T
    bucket = sum(((proj[b] > 0).astype(np.int64) << b)
                 for b in range(n_bits))

    rows = []
    for qi in range(n_q):
        sel = np.nonzero(bucket == bucket[qi])[0]
        dots = q[sel] @ q[qi]
        o = np.lexsort((ids[sel], -dots))[:k]
        for r, j in enumerate(o, start=1):
            rows.append((ids[qi], ids[sel][j], dots[j], r))
    want = pd.DataFrame(rows, columns=["query_id", "vec_id", "qdot", "rnk"])

    got = similarity.ann_lsh_md5_ds(SF, n_queries=n_q, k=k,
                                    n_bits=n_bits).to_pandas()
    got = got.sort_values(["query_id", "rnk"]).reset_index(drop=True)
    want = want.sort_values(["query_id", "rnk"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[want.columns].astype("int64"),
                                  want.astype("int64"))


def test_quant_twins_overlap_brute(ray_session, brute):
    """The quantized twins stay *useful* ANN: their probed candidates
    overlap the float brute-force top-k (recall floors sized for the
    500-row test table; the faces' exactness is pinned above/in SQL)."""
    ivf = similarity.ann_ivf_quant_ds(SF).to_pandas()
    lsh = similarity.ann_lsh_md5_ds(SF).to_pandas()
    assert _recall(ivf, brute) >= 0.3
    assert _recall(lsh, brute) >= 0.2


def test_pq_quant_matches_reference(ray_session):
    """ann_pq_quant_ds ≡ a from-scratch serial replay (per-subspace Lloyd →
    encode → ADC top-k) — the pytest half of the face's oracle pair."""
    import numpy as np
    n_q, k, m, ks, rounds = 8, 10, 4, 8, 2
    ids, q = _qmat(SF)
    dim = q.shape[1]
    dsub = dim // m

    cbs = []
    for s in range(m):
        sub = q[:, s * dsub:(s + 1) * dsub]
        cen = sub[:ks].copy()
        for _ in range(rounds):
            d = ((sub[:, None, :] - cen[None, :, :]) ** 2).sum(axis=2)
            a = d.argmin(axis=1)
            for c in range(ks):
                mm = sub[a == c]
                if len(mm):
                    ssum = mm.sum(axis=0)
                    cen[c] = np.sign(ssum) * (np.abs(ssum) // len(mm))
        cbs.append(cen)

    codes = np.stack([
        ((q[:, s * dsub:(s + 1) * dsub][:, None, :]
          - cbs[s][None, :, :]) ** 2).sum(axis=2).argmin(axis=1)
        for s in range(m)], axis=1)                        # (n, m)

    rows = []
    for qi in range(n_q):
        adc = np.zeros(len(ids), dtype=np.int64)
        for s in range(m):
            t = ((q[qi, s * dsub:(s + 1) * dsub] - cbs[s]) ** 2).sum(axis=1)
            adc += t[codes[:, s]]
        o = np.lexsort((ids, adc))[:k]
        for r, j in enumerate(o, start=1):
            rows.append((ids[qi], ids[j], adc[j], r))
    want = pd.DataFrame(rows, columns=["query_id", "vec_id", "adc_d2", "rnk"])

    got = similarity.ann_pq_quant_ds(SF, n_queries=n_q, k=k, m=m, ks=ks,
                                     rounds=rounds).to_pandas()
    got = got.sort_values(["query_id", "rnk"]).reset_index(drop=True)
    want = want.sort_values(["query_id", "rnk"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[want.columns].astype("int64"),
                                  want.astype("int64"))


def test_pq_quant_overlap_brute(ray_session, brute):
    pq = similarity.ann_pq_quant_ds(SF).to_pandas()
    assert _recall(pq, brute) >= 0.3


def test_ivf_append_matches_reference(ray_session):
    """ann_ivf_append_ds ≡ serial replay: centroids train on base rows
    only, delta rows assign against the frozen quantizer."""
    import numpy as np
    split, n_lists, rounds = 250, 8, 2
    ids, q = _qmat(SF)
    base = q[ids < split]
    cen = base[:n_lists].copy()
    for _ in range(rounds):
        d = ((base[:, None, :] - cen[None, :, :]) ** 2).sum(axis=2)
        a = d.argmin(axis=1)
        for c in range(n_lists):
            m = base[a == c]
            if len(m):
                s = m.sum(axis=0)
                cen[c] = np.sign(s) * (np.abs(s) // len(m))
    dmask = ids >= split
    d = ((q[dmask][:, None, :] - cen[None, :, :]) ** 2).sum(axis=2)
    want = pd.DataFrame({"vec_id": ids[dmask],
                         "list_id": d.argmin(axis=1),
                         "d2": d.min(axis=1)})
    got = similarity.ann_ivf_append_ds(SF).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype("int64"),
        want.sort_values("vec_id").reset_index(drop=True).astype("int64"))


def test_ivf_append_structural_bounds(ray_session):
    """Structural contract of the append output: delta rows only, list
    ids inside the trained quantizer's range, non-negative distances.
    (The assignment rule itself is pinned exactly by the serial-replay
    test above and the DuckDB oracle in the driver contract.)"""
    got = similarity.ann_ivf_append_ds(SF).to_pandas()
    assert (got["vec_id"] >= 250).all()
    assert got["list_id"].between(0, 7).all()
    assert (got["d2"] >= 0).all()
