"""Session-p ops: salted skew join, z-order layout, sorted-neighborhood
blocking, multi-epoch shuffle manifest. The SQL faces are covered by
test_driver_contract; these tests pin the scale-relevant mechanics the SQL
compare can't see (hot-key detection binding, salt spreading, boundary
replication, per-epoch permutation validity).
"""

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


# ------------------------------------------------------------- salted join

def _planted_skew(n_hot=500, n_cold=50):
    """Probe with ONE key owning n_hot rows, plus n_cold singleton keys."""
    probe = pd.DataFrame({
        "k": np.concatenate([np.full(n_hot, 7, dtype=np.int64),
                             np.arange(100, 100 + n_cold, dtype=np.int64)]),
        "rid": np.arange(n_hot + n_cold, dtype=np.int64),
        "pv": np.arange(n_hot + n_cold, dtype=np.int64) * 10})
    build = pd.DataFrame({
        "k": np.arange(0, 160, dtype=np.int64),
        "bv": np.arange(0, 160, dtype=np.int64) * 100})
    return probe, build


def test_salted_join_equals_plain_join(ray_session):
    import ray
    from crusty_ray.ops.joins import hash_join, salted_hash_join
    probe, build = _planted_skew()
    got = salted_hash_join(
        ray.data.from_pandas(probe), ray.data.from_pandas(build),
        on="k", hot_threshold=100, salt_by="rid", n_salts=4) \
        .to_pandas().sort_values(["rid"]).reset_index(drop=True)
    exp = probe.merge(build, on="k").sort_values(["rid"]) \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["k", "rid", "pv", "bv"]].astype("int64"),
        exp[["k", "rid", "pv", "bv"]].astype("int64"))


def test_salted_join_spreads_hot_key(ray_session):
    """The point of the op: with a binding threshold, the hot key's probe
    rows split across all n_salts sub-keys (each ≤ ~n_hot/n_salts), while
    cold keys stay on salt 0 — no single partition holds the hot key."""
    import ray
    from crusty_ray.ops.joins import salted_hash_join
    n_salts = 4
    probe, build = _planted_skew(n_hot=400, n_cold=40)
    joined = salted_hash_join(
        ray.data.from_pandas(probe), ray.data.from_pandas(build),
        on="k", hot_threshold=100, salt_by="rid", n_salts=n_salts) \
        .to_pandas()
    hot = probe[probe["k"] == 7]
    salts = (hot["rid"].to_numpy() % n_salts)
    counts = np.bincount(salts, minlength=n_salts)
    assert (counts > 0).all()
    assert counts.max() <= len(hot)  # sanity
    assert counts.max() < len(hot)   # actually split, not one bucket
    # every hot row still joined exactly once
    assert (joined["k"] == 7).sum() == len(hot)


def test_salted_join_no_hot_keys_is_plain(ray_session):
    """A non-binding threshold must leave every key on salt 0 and still
    reproduce the plain join (the cold path alone)."""
    import ray
    from crusty_ray.ops.joins import salted_hash_join
    probe, build = _planted_skew(n_hot=5, n_cold=20)
    got = salted_hash_join(
        ray.data.from_pandas(probe), ray.data.from_pandas(build),
        on="k", hot_threshold=10 ** 6, salt_by="rid", n_salts=8) \
        .to_pandas().sort_values(["rid"]).reset_index(drop=True)
    exp = probe.merge(build, on="k").sort_values(["rid"]) \
        .reset_index(drop=True)
    assert len(got) == len(exp)
    assert (got["bv"].to_numpy() == exp["bv"].to_numpy()).all()


# ----------------------------------------------------------- z-order layout

def test_zorder_key_matches_bit_reference():
    from crusty_ray.ops.pack import zorder_key
    rng = np.random.RandomState(7)
    x = rng.randint(0, 65536, size=200).astype(np.int64)
    y = rng.randint(0, 65536, size=200).astype(np.int64)
    got = zorder_key(x, y)
    ref = np.zeros_like(x)
    for i in range(16):
        ref |= (((x >> i) & 1) << (2 * i)) | (((y >> i) & 1) << (2 * i + 1))
    assert (got == ref).all()


def test_zorder_layout_rejects_bad_n_files(ray_session):
    from crusty_ray.ops.pack import zorder_events_layout_ds
    with pytest.raises(ValueError):
        zorder_events_layout_ds(SF, n_files=48)


def test_zorder_layout_partitions_rows(ray_session):
    from crusty_ray.ops.pack import zorder_events_layout_ds
    out = zorder_events_layout_ds(SF).to_pandas()
    assert out["n_rows"].sum() == 1000
    assert out["file_id"].is_unique
    assert (out["min_user_bucket"] <= out["max_user_bucket"]).all()
    assert (out["min_minute_bucket"] <= out["max_minute_bucket"]).all()


# ------------------------------------------- sorted-neighborhood blocking

def test_sorted_neighborhood_boundary_replication(ray_session):
    """A block far smaller than the corpus forces pairs ACROSS bucket
    boundaries; the output must equal the serial reference regardless."""
    from crusty_ray.ops.dedup import sorted_neighborhood_pairs_ds
    import pyarrow.parquet as pq
    w = 3
    got = sorted_neighborhood_pairs_ds(SF, window=w, block=8).to_pandas() \
        .sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "n_chars"]).to_pandas() \
        .sort_values(["n_chars", "doc_id"]).reset_index(drop=True)
    rows = []
    for i in range(len(docs)):
        for d in range(1, w + 1):
            if i + d < len(docs):
                rows.append((int(docs["doc_id"][i]),
                             int(docs["doc_id"][i + d]),
                             int(docs["n_chars"][i + d]
                                 - docs["n_chars"][i])))
    exp = pd.DataFrame(rows, columns=["doc_a", "doc_b", "char_gap"]) \
        .sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got.astype("int64"), exp.astype("int64"))


def test_sorted_neighborhood_validates_window(ray_session):
    from crusty_ray.ops.dedup import sorted_neighborhood_pairs_ds
    with pytest.raises(ValueError):
        sorted_neighborhood_pairs_ds(SF, window=8, block=8)


# ------------------------------------------------- multi-epoch shuffle

def test_epoch_shuffle_each_epoch_is_a_permutation(ray_session):
    from crusty_ray.ops.pack import epoch_shuffle_manifest_ds
    out = epoch_shuffle_manifest_ds(SF, n_epochs=3).to_pandas()
    n_docs = out["doc_id"].nunique()
    assert len(out) == 3 * n_docs
    orders = {}
    for e, g in out.groupby("epoch"):
        # dense 0..n-1 rank per epoch
        assert sorted(g["shuffle_rank"]) == list(range(n_docs))
        # shards are contiguous in shuffle order and start at 0
        g = g.sort_values("shuffle_rank")
        assert g["shard_id"].iloc[0] == 0
        assert (g["shard_id"].diff().fillna(0) >= 0).all()
        orders[e] = g["doc_id"].tolist()
    # epochs are genuinely different permutations
    assert orders[0] != orders[1]
    assert orders[1] != orders[2]
