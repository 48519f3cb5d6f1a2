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
