"""Round-5 ops: integer fixed-point HLL estimator (md5 face promotion)."""

import duckdb
import numpy as np
import pandas as pd

import __ray_entry__ as entry
from crusty_ray.ops import sketch

SF = "/root/testdata/sf0.001"


def _oracle_on(view_dir: str, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * "
                f"FROM read_parquet('{view_dir}/events.parquet')")
    return con.execute(sql).df()


def test_hll_estimate_matches_oracle_main_branch(ray_session):
    got = sketch.approx_distinct_users_md5_ds(SF)
    want = _oracle_on(SF, entry._approx_distinct_users_oracle_sql())
    pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                  want.astype("int64"), check_dtype=False)


def test_hll_estimate_linear_counting_branch(ray_session, tmp_path):
    """Few distinct users → raw estimate under 2.5m with zeros > 0 → the
    linear-counting branch must fire identically in engine and SQL."""
    pd.DataFrame({
        "event_id": np.arange(40, dtype=np.int64),
        "user_id": np.arange(40, dtype=np.int64) % 10,
        "event_type": ["click"] * 40,
        "ts": pd.to_datetime("2024-01-01"),
    }).to_parquet(tmp_path / "events.parquet")
    got = sketch.approx_distinct_users_md5_ds(str(tmp_path))
    want = _oracle_on(str(tmp_path), entry._approx_distinct_users_oracle_sql())
    pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                  want.astype("int64"), check_dtype=False)
    assert int(got["zeros"].iloc[0]) > 0
    # LC estimate of 10 distinct should land within ±30%
    assert 7_000_000 <= int(got["estimate_e6"].iloc[0]) <= 13_000_000


def test_hll_estimate_close_to_exact(ray_session):
    got = int(sketch.approx_distinct_users_md5_ds(SF)["estimate_e6"].iloc[0])
    exact = duckdb.sql(
        f"SELECT count(DISTINCT user_id) FROM read_parquet('{SF}/events.parquet')"
    ).fetchone()[0]
    # p=6 standard error ~13%; allow 3 sigma
    assert abs(got / 10**6 - exact) <= 0.4 * exact


def test_new_twin_defaults_match_engine_oracle():
    """The r4 PCA advice generalized: every r5 promotion's tunable default
    must agree between the engine function and its oracle generator, so a
    caller relying on defaults always gets a matching oracle."""
    import inspect
    from crusty_ray.ops import dedup
    sd_e = inspect.signature(dedup.semdedup_quant_ds).parameters
    sd_o = inspect.signature(entry._semdedup_quant_oracle_sql).parameters
    for k in ("n_clusters", "rounds", "threshold_q"):
        assert sd_e[k].default == sd_o[k].default, k
    hll_e = inspect.signature(sketch.approx_distinct_users_md5_ds).parameters
    hll_o = inspect.signature(entry._approx_distinct_users_oracle_sql).parameters
    assert hll_e["p"].default == hll_o["p"].default == 6
