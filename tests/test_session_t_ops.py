"""Round-4 continuation ops: hybrid retrieval (sparse→dense two-stage)."""

import duckdb
import numpy as np
import pandas as pd

import __ray_entry__ as entry
from crusty_ray.ops import text

SF = "/root/testdata/sf0.001"


def _oracle(sf: str, name: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(f"CREATE VIEW {t} AS SELECT * "
                    f"FROM read_parquet('{sf}/{t}.parquet')")
    return con.execute(entry.oracle_sql()[name]).df()


def test_hybrid_retrieval_matches_oracle_small_sf(ray_session):
    """The contract pins sf0.01; this re-pins the composed two-stage plan
    at sf0.001 (different candidate-cut boundary conditions)."""
    got = text.hybrid_retrieval_ds(SF).to_pandas()
    want = _oracle(SF, "hybrid_retrieval")
    cols = ["doc_id", "score_mb", "qdot", "rnk"]
    a = got[cols].sort_values(cols).reset_index(drop=True).astype("int64")
    b = want[cols].sort_values(cols).reset_index(drop=True).astype("int64")
    pd.testing.assert_frame_equal(a, b)


def test_hybrid_retrieval_structure(ray_session):
    got = text.hybrid_retrieval_ds(SF, n_candidates=20, k=5).to_pandas()
    # final ranks are 1..n with qdot non-increasing, doc_id breaking ties
    got = got.sort_values("rnk").reset_index(drop=True)
    assert got["rnk"].tolist() == list(range(1, len(got) + 1))
    assert (np.diff(got["qdot"].to_numpy()) <= 0).all()
    # every reranked doc came from the BM25 candidate cut
    bm25 = text.bm25_scores_ds(SF).to_pandas()
    cut = bm25.sort_values(["score_mb", "doc_id"],
                           ascending=[False, True]).head(20)
    assert set(got["doc_id"]) <= set(cut["doc_id"])
    # score_mb carried through unchanged
    merged = got.merge(cut, on="doc_id", suffixes=("", "_bm"))
    assert (merged["score_mb"] == merged["score_mb_bm"]).all()
