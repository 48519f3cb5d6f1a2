"""Unit tests for grouped_top_n, the self range join, and exact_quantiles —
small synthetic inputs with brute-force / duckdb cross-checks (the sf0.01
driver-contract conformance runs separately in test_driver_contract.py)."""

import math

import numpy as np
import pandas as pd
import pytest


def _ds(df, n_blocks=4):
    import pyarrow as pa
    import ray
    parts = np.array_split(df, n_blocks)
    return ray.data.from_arrow([pa.Table.from_pandas(p, preserve_index=False)
                                for p in parts if len(p)])


class TestGroupedTopN:
    def test_matches_window_function(self, ray_session):
        from crusty_ray.ops.agg import grouped_top_n
        rng = np.random.default_rng(5)
        df = pd.DataFrame({
            "g": rng.integers(0, 37, 500),
            "id": np.arange(500, dtype=np.int64),
            "score": rng.integers(0, 50, 500).astype(np.int64),
        })
        got = grouped_top_n(_ds(df), ["g"], "score", 3, ascending=False,
                            tie_cols=["id"], num_partitions=4).to_pandas() \
            .sort_values(["g", "rn"]).reset_index(drop=True)

        exp_rows = []
        for g, sub in df.groupby("g"):
            sub = sub.sort_values(["score", "id"], ascending=[False, True])
            for rn, (_, r) in enumerate(sub.head(3).iterrows(), 1):
                exp_rows.append((g, r["id"], r["score"], rn))
        exp = pd.DataFrame(exp_rows, columns=["g", "id", "score", "rn"]) \
            .sort_values(["g", "rn"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(
            got.astype("int64")[["g", "id", "score", "rn"]],
            exp.astype("int64"), check_dtype=False)

    def test_group_smaller_than_n(self, ray_session):
        from crusty_ray.ops.agg import grouped_top_n
        df = pd.DataFrame({"g": [1, 1, 2], "id": [10, 11, 12],
                           "score": [5, 7, 1]})
        got = grouped_top_n(_ds(df, 2), ["g"], "score", 5,
                            tie_cols=["id"], num_partitions=2).to_pandas() \
            .sort_values(["g", "rn"]).reset_index(drop=True)
        assert got.to_dict("records") == [
            {"g": 1, "id": 11, "score": 7, "rn": 1},
            {"g": 1, "id": 10, "score": 5, "rn": 2},
            {"g": 2, "id": 12, "score": 1, "rn": 1}]


class TestRangeJoin:
    def test_matches_bruteforce(self, ray_session, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq
        from crusty_ray.ops.joins import range_join_events_ds
        rng = np.random.default_rng(11)
        n = 400
        base = np.int64(1_700_000_000_000_000)
        df = pd.DataFrame({
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.integers(0, 12, n),
            "ts": base + rng.integers(0, 3_600_000_000, n),  # 1h span, us
        })
        t = pa.Table.from_pandas(df, preserve_index=False)
        t = t.set_column(t.schema.get_field_index("ts"),
                         pa.field("ts", pa.timestamp("us")),
                         t["ts"].cast(pa.timestamp("us")))
        pq.write_table(t, tmp_path / "events.parquet")

        got = range_join_events_ds(str(tmp_path), window_minutes=10) \
            .to_pandas().sort_values("event_id").reset_index(drop=True)

        win = 10 * 60_000_000
        exp_rows = []
        for _, e in df.iterrows():
            prior = df[(df.user_id == e.user_id)
                       & (df.ts >= e.ts - win) & (df.ts < e.ts)]
            exp_rows.append((e.event_id, len(prior),
                             prior.event_id.min() if len(prior) else -1))
        exp = pd.DataFrame(exp_rows,
                           columns=["event_id", "n_prior", "first_prior"])
        pd.testing.assert_frame_equal(got.astype("int64"),
                                      exp.astype("int64"))
        assert (got.n_prior > 0).any()  # the window actually matched


class TestExactQuantiles:
    @pytest.mark.parametrize("bucket_width", [1.0, 7.5, 1000.0])
    def test_matches_numpy_order_statistic(self, ray_session, bucket_width):
        """percentile_disc = sorted[max(1, ceil(p*n)) - 1] for any bucket
        width, including one so wide everything lands in one bucket."""
        from crusty_ray.ops.quantiles import exact_quantiles
        rng = np.random.default_rng(2)
        vals = np.round(rng.uniform(0, 500, 1111), 2)
        df = pd.DataFrame({"x": vals})
        ps = [1, 250, 500, 750, 990, 1000]
        got = exact_quantiles(_ds(df), "x", ps, bucket_width=bucket_width,
                              num_partitions=4)
        s = np.sort(vals)
        exp = {p: s[max(1, math.ceil(p / 1000.0 * len(s))) - 1] for p in ps}
        assert dict(zip(got.p_pm, got.value)) == pytest.approx(exp, abs=0)

    def test_duckdb_percentile_disc_convention(self, ray_session):
        """Our k convention must equal DuckDB's percentile_disc exactly,
        including on tiny inputs where off-by-one shows."""
        import duckdb
        from crusty_ray.ops.quantiles import exact_quantiles
        vals = [3.5, 1.25, 9.0, 7.75, 5.5]
        df = pd.DataFrame({"x": vals})
        ps = [100, 200, 333, 500, 700, 999, 1000]
        got = exact_quantiles(_ds(df, 2), "x", ps, bucket_width=2.0,
                              num_partitions=2)
        for p, v in zip(got.p_pm, got.value):
            exp = duckdb.sql(
                f"SELECT percentile_disc({p / 1000.0}) WITHIN GROUP "
                f"(ORDER BY x) FROM (SELECT unnest({vals}) AS x)").fetchone()[0]
            assert v == exp, (p, v, exp)

    def test_empty_input(self, ray_session):
        from crusty_ray.ops.quantiles import exact_quantiles
        df = pd.DataFrame({"x": pd.Series([], dtype="float64")})
        got = exact_quantiles(_ds(df, 1), "x", [500])
        assert list(got.p_pm) == [500] and np.isnan(got.value.iloc[0])

    def test_cont_matches_duckdb_bitexact(self, ray_session):
        """percentile_cont parity including points strictly between order
        statistics — value equality is EXACT float bits, not approx."""
        import duckdb
        from crusty_ray.ops.quantiles import exact_quantiles_cont
        rng = np.random.default_rng(11)
        vals = np.round(rng.uniform(0, 10000, 733), 2)
        df = pd.DataFrame({"x": vals})
        ps = [0, 13, 250, 500, 613, 750, 999, 1000]
        got = exact_quantiles_cont(_ds(df), "x", ps, bucket_width=50.0,
                                   num_partitions=4)
        for p, v in zip(got.p_pm, got.value):
            exp = duckdb.sql(
                f"SELECT percentile_cont({p / 1000.0!r}) WITHIN GROUP "
                f"(ORDER BY x) FROM (SELECT CAST(unnest({vals.tolist()}) "
                f"AS DOUBLE) AS x)"  # parquet faces are DOUBLE, not DECIMAL
            ).fetchone()[0]
            assert v == exp, (p, v, exp)

    def test_cont_single_row_and_empty(self, ray_session):
        from crusty_ray.ops.quantiles import exact_quantiles_cont
        one = exact_quantiles_cont(_ds(pd.DataFrame({"x": [42.0]}), 1),
                                   "x", [0, 500, 1000])
        assert list(one.value) == [42.0, 42.0, 42.0]
        empty = exact_quantiles_cont(
            _ds(pd.DataFrame({"x": pd.Series([], dtype="float64")}), 1),
            "x", [500])
        assert list(empty.p_pm) == [500] and np.isnan(empty.value.iloc[0])


class TestDeterministicSampling:
    def test_membership_stable_under_corpus_change(self, ray_session):
        """A doc's sample decision must not depend on which other docs are
        present (the dataset-versioning stability guarantee)."""
        from crusty_ray.ops.sample import sample_stratified
        df = pd.DataFrame({"doc_id": np.arange(200, dtype=np.int64),
                           "source": ["a", "b"] * 100})
        rates = {"a": 300, "b": 800}
        full = sample_stratified(_ds(df), "doc_id", "source", rates) \
            .to_pandas()
        half = sample_stratified(_ds(df.iloc[:100]), "doc_id", "source",
                                 rates).to_pandas()
        kept_full = set(full[full.doc_id < 100].doc_id)
        assert kept_full == set(half.doc_id)

    def test_unknown_stratum_uses_default(self, ray_session):
        from crusty_ray.ops.sample import sample_stratified
        df = pd.DataFrame({"doc_id": np.arange(50, dtype=np.int64),
                           "source": ["mystery"] * 50})
        none = sample_stratified(_ds(df, 2), "doc_id", "source", {}) \
            .to_pandas()
        assert len(none) == 0
        everything = sample_stratified(_ds(df, 2), "doc_id", "source", {},
                                       default_pm=1000).to_pandas()
        assert len(everything) == 50

    def test_splits_partition_the_corpus(self, ray_session):
        from crusty_ray.ops.sample import assign_splits
        df = pd.DataFrame({"doc_id": np.arange(1000, dtype=np.int64)})
        got = assign_splits(_ds(df), "doc_id",
                            {"train": 900, "val": 950, "test": 1000}) \
            .to_pandas()
        assert len(got) == 1000 and got.doc_id.is_unique
        counts = got.split.value_counts()
        # buckets are ~uniform; bounds are exact per-mille cuts
        assert 850 < counts["train"] < 950
        assert set(got.split) == {"train", "val", "test"}


def test_build_vocab_caps_and_ranks(ray_session, tmp_path):
    """Vocab op: ids are dense ranks by (count desc, token asc) and the
    output is capped at vocab_size even when the corpus vocabulary is
    larger (the local-prune + bounded-final-rank scale contract)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from crusty_ray.ops.text import build_vocab_ds
    docs = (["aa bb aa cc"] * 5 + ["bb  cc dd"] * 3
            + [f"rare{i}" for i in range(40)])
    pq.write_table(pa.table({"doc_id": list(range(len(docs))),
                             "text": docs}), tmp_path / "documents.parquet")
    got = build_vocab_ds(str(tmp_path), vocab_size=4).to_pandas() \
        .sort_values("token_id").reset_index(drop=True)
    assert len(got) == 4
    assert list(got.w) == ["aa", "bb", "cc", "dd"]
    assert list(got.cnt) == [10, 8, 8, 3]
    assert list(got.token_id) == [1, 2, 3, 4]


def test_group_quantiles_match_per_group_numpy(ray_session):
    """Per-group two-phase selection ≡ per-group numpy order statistic,
    including a single-row group (k clamps to 1)."""
    import math
    from crusty_ray.ops.quantiles import exact_group_quantiles
    rng = np.random.default_rng(9)
    df = pd.DataFrame({"g": list(rng.integers(0, 5, 999)) + [99],
                       "x": list(np.round(rng.uniform(0, 80, 999), 3)) + [42.0]})
    ps = [250, 500, 900]
    got = exact_group_quantiles(_ds(df), "g", "x", ps, bucket_width=5.0,
                                num_partitions=4)
    for g, sub in df.groupby("g"):
        s = np.sort(sub.x.to_numpy())
        for p in ps:
            exp = s[max(1, math.ceil(p / 1000.0 * len(s))) - 1]
            row = got[(got.g == g) & (got.p_pm == p)]
            assert float(row.value.iloc[0]) == exp, (g, p)


class TestHashJoin:
    def test_matches_pandas_merge_with_64bit_values(self, ray_session):
        """Inner equi-join parity incl. int64 payloads near 2^63 (the case a
        null-padded union would silently corrupt via float64 coercion)."""
        from crusty_ray.ops.joins import hash_join
        rng = np.random.default_rng(3)
        left = pd.DataFrame({
            "k": rng.integers(0, 40, 300),
            "lv": rng.integers(1 << 62, (1 << 63) - 1, 300, dtype=np.int64),
        })
        right = pd.DataFrame({
            "k": rng.integers(0, 50, 120),  # some keys unmatched either side
            "rv": rng.integers(1 << 62, (1 << 63) - 1, 120, dtype=np.int64),
            "tag": [f"t{i}" for i in range(120)],
        })
        got = hash_join(_ds(left), _ds(right, 3), on=["k"],
                        num_partitions=4).to_pandas()
        exp = left.merge(right, on="k", how="inner")
        key = ["k", "lv", "rv", "tag"]
        got = got[key].sort_values(key).reset_index(drop=True)
        exp = exp[key].sort_values(key).reset_index(drop=True)
        pd.testing.assert_frame_equal(got, exp, check_dtype=True)

    def test_multi_key(self, ray_session):
        from crusty_ray.ops.joins import hash_join
        rng = np.random.default_rng(4)
        left = pd.DataFrame({"a": rng.integers(0, 5, 80),
                             "b": rng.integers(0, 5, 80),
                             "x": np.arange(80, dtype=np.int64)})
        right = pd.DataFrame({"a": rng.integers(0, 5, 40),
                              "b": rng.integers(0, 5, 40),
                              "y": np.arange(40, dtype=np.int64)})
        got = hash_join(_ds(left), _ds(right, 2), on=["a", "b"],
                        num_partitions=3).to_pandas()
        exp = left.merge(right, on=["a", "b"], how="inner")
        key = ["a", "b", "x", "y"]
        pd.testing.assert_frame_equal(
            got[key].sort_values(key).reset_index(drop=True),
            exp[key].sort_values(key).reset_index(drop=True))

    def test_rejects_overlapping_value_columns(self, ray_session):
        from crusty_ray.ops.joins import hash_join
        df = pd.DataFrame({"k": [1], "v": [2]})
        with pytest.raises(ValueError, match="disjoint"):
            hash_join(_ds(df, 1), _ds(df, 1), on=["k"])

    def test_left_join_fills_and_preserves_dtypes(self, ray_session):
        from crusty_ray.ops.joins import hash_join
        left = pd.DataFrame({"k": [1, 2, 3, 4], "name": list("abcd")})
        right = pd.DataFrame({"k": [2, 4],
                              "big": np.array([1 << 62, (1 << 62) + 1],
                                              dtype=np.int64)})
        got = hash_join(_ds(left, 2), _ds(right, 1), on=["k"], how="left",
                        fill={"big": -1}, num_partitions=2).to_pandas() \
            .sort_values("k").reset_index(drop=True)
        assert got["big"].dtype == np.int64
        assert got["big"].tolist() == [-1, 1 << 62, -1, (1 << 62) + 1]
        assert got["name"].tolist() == list("abcd")

    def test_left_join_requires_complete_fill(self, ray_session):
        from crusty_ray.ops.joins import hash_join
        left = pd.DataFrame({"k": [1], "x": [1]})
        right = pd.DataFrame({"k": [1], "y": [2], "z": [3]})
        with pytest.raises(ValueError, match="fill"):
            hash_join(_ds(left, 1), _ds(right, 1), on=["k"], how="left",
                      fill={"y": 0})

    def test_outer_join_matches_pandas_both_unmatched_sides(self, ray_session):
        """Full outer parity vs pandas, with keys unmatched on EACH side
        (the sf0.01 contract data never exercises unmatched-right, so this
        is the symmetric probe's regression test) and int64 payloads near
        2^63 that a NaN round-trip would corrupt."""
        from crusty_ray.ops.joins import hash_join
        rng = np.random.default_rng(7)
        left = pd.DataFrame({
            "k": rng.integers(0, 30, 100),          # keys 0..29
            "lv": rng.integers(1 << 62, (1 << 63) - 1, 100, dtype=np.int64),
        })
        right = pd.DataFrame({
            "k": rng.integers(15, 45, 80),          # keys 15..44 (15..29 shared)
            "rv": rng.integers(1 << 62, (1 << 63) - 1, 80, dtype=np.int64),
        })
        got = hash_join(_ds(left, 3), _ds(right, 2), on=["k"], how="outer",
                        fill={"lv": -1, "rv": -1},
                        num_partitions=4).to_pandas()
        # nullable Int64 keeps matched 2^62-scale values exact in the
        # reference merge (plain int64 would round-trip through float64)
        exp = left.astype({"lv": "Int64"}) \
            .merge(right.astype({"rv": "Int64"}), on="k", how="outer")
        exp["lv"] = exp["lv"].fillna(-1).astype(np.int64)
        exp["rv"] = exp["rv"].fillna(-1).astype(np.int64)
        key = ["k", "lv", "rv"]
        got = got[key].sort_values(key).reset_index(drop=True)
        exp = exp[key].sort_values(key).reset_index(drop=True)
        assert got["lv"].dtype == np.int64 and got["rv"].dtype == np.int64
        # both outer branches genuinely exercised
        assert (got["lv"] == -1).any() and (got["rv"] == -1).any()
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)

    def test_outer_join_requires_fill_for_both_sides(self, ray_session):
        from crusty_ray.ops.joins import hash_join
        left = pd.DataFrame({"k": [1], "x": [1]})
        right = pd.DataFrame({"k": [1], "y": [2]})
        with pytest.raises(ValueError, match="fill"):
            hash_join(_ds(left, 1), _ds(right, 1), on=["k"], how="outer",
                      fill={"y": 0})


def test_group_quantiles_cont_match_duckdb(ray_session):
    """Per-group percentile_cont parity, exact float bits, incl. a group of
    size 1 (rn=0) and between-stat points."""
    import duckdb
    import pyarrow as pa
    import ray
    from crusty_ray.ops.quantiles import exact_group_quantiles_cont
    rng = np.random.default_rng(8)
    sizes = {"a": 301, "b": 40, "c": 1}
    frames = [pd.DataFrame({"g": k, "x": np.round(rng.uniform(0, 900, n), 2)})
              for k, n in sizes.items()]
    df = pd.concat(frames, ignore_index=True)
    parts = np.array_split(df.sample(frac=1, random_state=0), 5)
    ds = ray.data.from_arrow([pa.Table.from_pandas(p, preserve_index=False)
                              for p in parts])
    ps = [250, 613, 900]
    got = exact_group_quantiles_cont(ds, "g", "x", ps, bucket_width=30.0,
                                     num_partitions=3)
    got = got.sort_values(["g", "p_pm"]).reset_index(drop=True)
    con = duckdb.connect()
    con.register("t", df)
    exp = con.sql(" UNION ALL ".join(
        f"SELECT g, {p} AS p_pm, percentile_cont({p / 1000.0!r}) "
        f"WITHIN GROUP (ORDER BY x) AS value FROM t GROUP BY g"
        for p in ps)).df().sort_values(["g", "p_pm"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False,
                                  check_exact=True)


class TestQuantileEdgeCases:
    """Regressions from the r3 adversarial review of ops/quantiles.py."""

    def test_float_boundary_bucket_not_dropped(self, ray_session):
        """bucket_width=0.1: floor(7.8/0.1)=78 but 78*0.1 > 7.8 — a float
        range prefilter would exclude a value the histogram counted. The
        refine pass must use the same floor() the histogram used."""
        from crusty_ray.ops.quantiles import exact_quantiles
        vals = [7.8, 7.9, 8.0, 8.1]
        got = exact_quantiles(_ds(pd.DataFrame({"x": vals}), 2), "x",
                              [1, 250], bucket_width=0.1, num_partitions=2)
        assert list(got.value) == [7.8, 7.8]

    def test_nan_values_ignored_like_sql_nulls(self, ray_session):
        import duckdb
        from crusty_ray.ops.quantiles import (exact_group_quantiles,
                                              exact_quantiles,
                                              exact_quantiles_cont)
        rng = np.random.default_rng(5)
        x = np.round(rng.uniform(0, 100, 200), 2)
        x[::5] = np.nan  # 40 NULLs
        df = pd.DataFrame({"g": np.repeat(["a", "b"], 100), "x": x})
        con = duckdb.connect()
        con.register("t", df)
        for p in [250, 500, 990]:
            d = exact_quantiles(_ds(df), "x", [p], bucket_width=7.0)
            c = exact_quantiles_cont(_ds(df), "x", [p], bucket_width=7.0)
            ed = con.sql(f"SELECT percentile_disc({p / 1000.0!r}) WITHIN "
                         f"GROUP (ORDER BY x) FROM t").fetchone()[0]
            ec = con.sql(f"SELECT percentile_cont({p / 1000.0!r}) WITHIN "
                         f"GROUP (ORDER BY x) FROM t").fetchone()[0]
            assert d.value.iloc[0] == ed, (p, "disc")
            assert c.value.iloc[0] == ec, (p, "cont")
        g = exact_group_quantiles(_ds(df), "g", "x", [500], bucket_width=7.0)
        eg = con.sql("SELECT g, percentile_disc(0.5) WITHIN GROUP "
                     "(ORDER BY x) AS v FROM t GROUP BY g ORDER BY g").df()
        assert list(g.sort_values("g").value) == list(eg.v)

    def test_all_nan_returns_nan(self, ray_session):
        from crusty_ray.ops.quantiles import exact_quantiles
        df = pd.DataFrame({"x": [np.nan, np.nan]})
        got = exact_quantiles(_ds(df, 1), "x", [500])
        assert np.isnan(got.value.iloc[0])

    def test_out_of_range_points_rejected(self, ray_session):
        from crusty_ray.ops.quantiles import (exact_quantiles,
                                              exact_quantiles_cont)
        df = pd.DataFrame({"x": [1.0, 2.0]})
        with pytest.raises(ValueError, match="1100"):
            exact_quantiles(_ds(df, 1), "x", [1100])
        with pytest.raises(ValueError, match="-5"):
            exact_quantiles_cont(_ds(df, 1), "x", [-5])


def test_bottomk_sketch_quantiles(ray_session):
    """Sketch face: bit-exact vs its SQL oracle (conformance test covers
    sf0.01) AND the sample estimate is rank-accurate within the KMV bound
    (~3.5/sqrt(k) at k=256 -> +/-0.22 rank error, checked much tighter)."""
    import duckdb

    import __ray_entry__ as e
    from crusty_ray.ops.quantiles import order_price_quantiles_sketch_ds

    sf = "/root/testdata/sf0.01"
    got = order_price_quantiles_sketch_ds(sf)
    prices = duckdb.sql(
        f"SELECT o_totalprice FROM read_parquet('{sf}/orders.parquet')"
    ).df()["o_totalprice"].to_numpy()
    n = len(prices)
    for _, row in got.iterrows():
        p = row["p_pm"] / 1000.0
        rank = (prices <= row["value"]).sum() / n
        assert abs(rank - p) < 0.22, (row["p_pm"], rank)


def test_numeric_profile_all_null_column(ray_session, tmp_path):
    """An all-NULL profiled column still gets its row (n=0, 0 sentinels),
    matching the COALESCEd oracle; present columns are exact."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from crusty_ray.ops.stats import numeric_profile_ds

    t = pa.table({
        "a": pa.array([1.0, 2.0, 2.0], pa.float64()),
        "b": pa.array([None, None, None], pa.float64()),
    })
    pq.write_table(t, str(tmp_path / "nums.parquet"))
    got = numeric_profile_ds(str(tmp_path), table="nums", cols=("a", "b")) \
        .set_index("column_name")
    assert got.loc["a"].tolist() == [3, 2, 100, 200, 500]
    assert got.loc["b"].tolist() == [0, 0, 0, 0, 0]
