"""Unit tests for ordered_pack — the distributed global ordered prefix-sum
packing primitive (sf0.01 driver-contract conformance of pack_token_chunks
runs separately in test_driver_contract.py)."""

import numpy as np
import pandas as pd
import pyarrow as pa


def _ds(df, n_blocks=4):
    import ray
    parts = np.array_split(df.sample(frac=1.0, random_state=7), n_blocks)
    return ray.data.from_arrow([pa.Table.from_pandas(p, preserve_index=False)
                                for p in parts if len(p)])


def _expect(df, budget):
    g = df.sort_values("k").reset_index(drop=True)
    excl = g["w"].cumsum().shift(fill_value=0).to_numpy(dtype=np.int64)
    g["chunk_id"] = excl // budget
    return g


def _run(df, budget, bucket_width, n_blocks=4, num_partitions=5):
    from crusty_ray.ops.pack import ordered_pack
    got = ordered_pack(_ds(df, n_blocks), "k", "w", budget, bucket_width,
                       num_partitions=num_partitions).to_pandas() \
        .sort_values("k").reset_index(drop=True)
    return got[["k", "w", "chunk_id"]].astype("int64")


class TestOrderedPack:
    def test_matches_serial_cumsum(self, ray_session):
        rng = np.random.default_rng(11)
        df = pd.DataFrame({"k": np.arange(400, dtype=np.int64),
                           "w": rng.integers(0, 90, 400).astype(np.int64)})
        got = _run(df, budget=128, bucket_width=16)
        exp = _expect(df, 128)[["k", "w", "chunk_id"]].astype("int64")
        pd.testing.assert_frame_equal(got, exp)

    def test_item_heavier_than_budget(self, ray_session):
        df = pd.DataFrame({"k": np.arange(6, dtype=np.int64),
                           "w": np.array([5, 999, 5, 5, 5, 5], np.int64)})
        got = _run(df, budget=10, bucket_width=2, n_blocks=2,
                   num_partitions=3)
        exp = _expect(df, 10)[["k", "w", "chunk_id"]].astype("int64")
        pd.testing.assert_frame_equal(got, exp)
        # the heavy item advances the counter past itself (SQL semantics)
        assert got["chunk_id"].tolist() == [0, 0, 100, 100, 101, 101]

    def test_sparse_nondense_keys(self, ray_session):
        rng = np.random.default_rng(3)
        ks = np.sort(rng.choice(10_000, size=150, replace=False)) \
            .astype(np.int64)
        df = pd.DataFrame({"k": ks,
                           "w": rng.integers(1, 40, 150).astype(np.int64)})
        got = _run(df, budget=64, bucket_width=97)
        exp = _expect(df, 64)[["k", "w", "chunk_id"]].astype("int64")
        pd.testing.assert_frame_equal(got, exp)

    def test_passthrough_columns_survive(self, ray_session):
        df = pd.DataFrame({"k": np.arange(20, dtype=np.int64),
                           "w": np.ones(20, dtype=np.int64),
                           "tag": [f"t{i}" for i in range(20)]})
        from crusty_ray.ops.pack import ordered_pack
        got = ordered_pack(_ds(df, 3), "k", "w", 7, 4).to_pandas() \
            .sort_values("k").reset_index(drop=True)
        assert got["tag"].tolist() == [f"t{i}" for i in range(20)]
        assert got["chunk_id"].tolist() == [i // 7 for i in range(20)]


class TestAspectBucketBatches:
    def test_matches_duckdb_window_oracle(self, ray_session, tmp_path):
        import duckdb
        import pyarrow as pa
        import pyarrow.parquet as pq

        from crusty_ray.ops.pack import aspect_bucket_batches

        rng = np.random.default_rng(5)
        n = 400
        df = pd.DataFrame({
            "image_id": [f"im{i:04d}" for i in range(n)],
            "w": rng.integers(16, 512, n).astype("int64"),
            "h": rng.integers(16, 512, n).astype("int64"),
        })
        p = tmp_path / "images.parquet"
        pq.write_table(pa.table(df), str(p))

        got = aspect_bucket_batches(str(p), batch_rows=16).to_pandas() \
            .sort_values("image_id").reset_index(drop=True)

        anchors = "[500, 750, 1000, 1333, 2000]"
        want = duckdb.sql(f"""
            WITH m AS (
              SELECT image_id,
                     1000 * h // greatest(w, 1) AS aspect_pm,
                     ('0x' || substr(md5(image_id), 1, 16))::UBIGINT
                         & 9223372036854775807 AS key
              FROM '{p}'
            ), b AS (
              SELECT image_id, key,
                     (SELECT a FROM unnest({anchors}) AS t(a)
                      ORDER BY abs(aspect_pm - a), a LIMIT 1)
                         AS aspect_bucket_pm
              FROM m
            )
            SELECT image_id, aspect_bucket_pm::BIGINT AS aspect_bucket_pm,
                   ((row_number() OVER (PARTITION BY aspect_bucket_pm
                                        ORDER BY key, image_id) - 1) // 16)
                       ::BIGINT AS batch_id
            FROM b ORDER BY image_id
        """).df()
        pd.testing.assert_frame_equal(
            got.astype({"aspect_bucket_pm": "int64", "batch_id": "int64"}),
            want.astype({"aspect_bucket_pm": "int64", "batch_id": "int64"}))

    def test_batches_are_full_except_last_per_bucket(self, ray_session,
                                                     tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from crusty_ray.ops.pack import aspect_bucket_batches
        rng = np.random.default_rng(7)
        n = 333
        df = pd.DataFrame({
            "image_id": [f"x{i:04d}" for i in range(n)],
            "w": rng.integers(16, 512, n).astype("int64"),
            "h": rng.integers(16, 512, n).astype("int64"),
        })
        p = tmp_path / "im.parquet"
        pq.write_table(pa.table(df), str(p))
        out = aspect_bucket_batches(str(p), batch_rows=8).to_pandas()
        sizes = out.groupby(["aspect_bucket_pm", "batch_id"]).size()
        for (bkt, bid), sz in sizes.items():
            last = out.loc[out["aspect_bucket_pm"] == bkt, "batch_id"].max()
            assert sz == 8 or bid == last, (bkt, bid, sz)


class TestDataMixture:
    def test_keep_is_a_doc_id_prefix_per_source(self, ray_session):
        """Within each source, admitted docs are exactly the doc_id-ordered
        prefix whose exclusive token prefix sum is under the source budget —
        so keeps never have holes, and cum_before is the serial cumsum."""
        from crusty_ray.ops.pack import data_mixture_ds
        out = data_mixture_ds("/root/testdata/sf0.001").to_pandas()
        assert set(out.columns) == {"doc_id", "source", "n_tokens",
                                    "cum_before", "keep"}
        for src, g in out.groupby("source"):
            g = g.sort_values("doc_id").reset_index(drop=True)
            # cum_before is the exclusive serial cumsum of n_tokens
            expect = g["n_tokens"].cumsum().shift(fill_value=0)
            assert (g["cum_before"] == expect).all(), src
            # keeps form a prefix (monotone non-increasing flag sequence)
            k = g["keep"].to_numpy()
            assert (np.diff(k) <= 0).all(), src
        # a deterministic mixture: re-running yields identical verdicts
        again = data_mixture_ds("/root/testdata/sf0.001").to_pandas()
        pd.testing.assert_frame_equal(
            out.sort_values(["source", "doc_id"]).reset_index(drop=True),
            again.sort_values(["source", "doc_id"]).reset_index(drop=True))
