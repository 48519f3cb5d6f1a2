"""Planted-fixture tests for the session-o operators: event transition
matrix, referential-integrity audit, CCNet perplexity buckets, temperature
mixture sampling, WebDataset tar export. The sf0.01 DuckDB bit-exact checks
live in test_driver_contract.py; these pin the SEMANTICS on inputs where the
right answer is known by construction.
"""

import hashlib
import os
import tarfile

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


# ------------------------------------------------------ transition matrix

def _write_events(path, rows):
    """rows: list of (event_id, user_id, ts_us, event_type)."""
    t = pa.table({
        "event_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "user_id": pa.array([r[1] for r in rows], type=pa.int64()),
        "ts": pa.array([r[2] for r in rows], type=pa.timestamp("us")),
        "event_type": pa.array([r[3] for r in rows]),
        "value": pa.array([0.0] * len(rows)),
        "props": pa.array(["{}"] * len(rows)),
    })
    pq.write_table(t, f"{path}/events.parquet")
    return str(path)


def test_transition_matrix_planted(ray_session, tmp_path):
    from crusty_ray.ops.behavior import event_transition_matrix_ds
    # user 1: view->click->view ; user 2: view->view ; user 3: single event
    sf = _write_events(tmp_path, [
        (1, 1, 10, "view"), (2, 1, 20, "click"), (3, 1, 30, "view"),
        (4, 2, 10, "view"), (5, 2, 20, "view"),
        (6, 3, 10, "purchase"),
    ])
    got = event_transition_matrix_ds(sf)
    exp = pd.DataFrame({
        "from_type": ["click", "view", "view"],
        "to_type": ["view", "click", "view"],
        "n_transitions": pd.Series([1, 1, 1], dtype="int64")})
    pd.testing.assert_frame_equal(got, exp)


def test_transition_matrix_ts_tie_broken_by_event_id(ray_session, tmp_path):
    from crusty_ray.ops.behavior import event_transition_matrix_ds
    # same ts: order = event_id → a(1) -> b(2) -> c(3)
    sf = _write_events(tmp_path, [
        (3, 1, 10, "c"), (1, 1, 10, "a"), (2, 1, 10, "b"),
    ])
    got = event_transition_matrix_ds(sf)
    exp = pd.DataFrame({
        "from_type": ["a", "b"], "to_type": ["b", "c"],
        "n_transitions": pd.Series([1, 1], dtype="int64")})
    pd.testing.assert_frame_equal(got, exp)


def test_transition_matrix_empty(ray_session, tmp_path):
    from crusty_ray.ops.behavior import event_transition_matrix_ds
    sf = _write_events(tmp_path, [])
    got = event_transition_matrix_ds(sf)
    assert list(got.columns) == ["from_type", "to_type", "n_transitions"]
    assert got.empty


# --------------------------------------------------- referential integrity

def test_fk_orphans_planted(ray_session, tmp_path):
    import ray
    from crusty_ray.ops.stats import fk_orphan_summary
    child = ray.data.from_pandas(pd.DataFrame({
        "k": pd.Series([1, 1, 2, 3, 3, 3, 9], dtype="int64")}))
    parent = ray.data.from_pandas(pd.DataFrame({
        "p": pd.Series([1, 2, 5], dtype="int64")}))
    s = fk_orphan_summary(child, "k", parent, "p")
    # orphans: key 3 (3 rows) and key 9 (1 row)
    assert s == {"n_child_rows": 7, "n_orphan_rows": 4, "n_orphan_keys": 2}


def test_fk_orphans_null_keys(ray_session):
    """NULL child keys follow the LEFT-JOIN oracle: they count as child
    rows AND orphan rows, but COUNT(DISTINCT key) ignores NULLs — the
    canonical dirty-data case the audit exists for (regression: pandas
    groupby silently dropped them before counting)."""
    import ray
    from crusty_ray.ops.stats import fk_orphan_summary
    child = ray.data.from_pandas(pd.DataFrame({
        "k": pd.Series([1, 2, None, 9], dtype="Int64")}))
    parent = ray.data.from_pandas(pd.DataFrame({
        "p": pd.Series([1, 2], dtype="int64")}))
    s = fk_orphan_summary(child, "k", parent, "p")
    assert s == {"n_child_rows": 4, "n_orphan_rows": 2, "n_orphan_keys": 1}


def test_fk_orphans_all_null(ray_session):
    import ray
    from crusty_ray.ops.stats import fk_orphan_summary
    child = ray.data.from_pandas(pd.DataFrame({
        "k": pd.Series([None, None], dtype="Int64")}))
    parent = ray.data.from_pandas(pd.DataFrame({
        "p": pd.Series([1], dtype="int64")}))
    s = fk_orphan_summary(child, "k", parent, "p")
    assert s == {"n_child_rows": 2, "n_orphan_rows": 2, "n_orphan_keys": 0}


def test_fk_orphans_null_parent_keys(ray_session):
    """NULL PARENT keys match nothing (SQL join semantics) and must not
    crash the audit (regression: astype('int64') on a NULL-bearing parent
    column raised inside the map task)."""
    import ray
    from crusty_ray.ops.stats import fk_orphan_summary
    child = ray.data.from_pandas(pd.DataFrame({
        "k": pd.Series([1, 2, 9], dtype="int64")}))
    parent = ray.data.from_pandas(pd.DataFrame({
        "p": pd.Series([1, None, 2, None], dtype="Int64")}))
    s = fk_orphan_summary(child, "k", parent, "p")
    assert s == {"n_child_rows": 3, "n_orphan_rows": 1, "n_orphan_keys": 1}

    # float-NaN parent column (parquet NULLs often read back as float)
    parent_f = ray.data.from_pandas(pd.DataFrame({
        "p": pd.Series([1.0, float("nan")], dtype="float64")}))
    s = fk_orphan_summary(child, "k", parent_f, "p")
    assert s == {"n_child_rows": 3, "n_orphan_rows": 2, "n_orphan_keys": 2}


def test_fk_orphans_all_present(ray_session):
    import ray
    from crusty_ray.ops.stats import fk_orphan_summary
    child = ray.data.from_pandas(pd.DataFrame({
        "k": pd.Series([1, 2, 2], dtype="int64")}))
    parent = ray.data.from_pandas(pd.DataFrame({
        "p": pd.Series([1, 2, 3], dtype="int64")}))
    s = fk_orphan_summary(child, "k", parent, "p")
    assert s == {"n_child_rows": 3, "n_orphan_rows": 0, "n_orphan_keys": 0}


# --------------------------------------------------------- ccnet buckets

def _write_docs(path, rows):
    """rows: list of (doc_id, text, lang, source)."""
    t = pa.table({
        "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "text": pa.array([r[1] for r in rows]),
        "lang": pa.array([r[2] for r in rows]),
        "source": pa.array([r[3] for r in rows]),
        "n_chars": pa.array([len(r[1]) for r in rows], type=pa.int64()),
    })
    pq.write_table(t, f"{path}/documents.parquet")
    return str(path)


def test_ccnet_buckets_match_bruteforce(ray_session, tmp_path):
    from crusty_ray.ops.curation import ccnet_perplexity_buckets_ds
    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(25)]
    rows = []
    for d in range(30):
        toks = rng.choice(vocab, size=rng.integers(2, 10)).tolist()
        rows.append((d, " ".join(toks), ["en", "de"][d % 2], "s0"))
    sf = _write_docs(tmp_path, rows)
    got = ccnet_perplexity_buckets_ds(sf).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)

    # brute force with the shared integer-surprisal convention
    cnt: dict = {}
    for _, text, _, _ in rows:
        for w in text.split(" "):
            if w:
                cnt[w] = cnt.get(w, 0) + 1
    n_tot = sum(cnt.values())
    bits = {w: (n_tot // c).bit_length() - 1 for w, c in cnt.items()}
    mb = {}
    for d, text, lang, _ in rows:
        toks = [w for w in text.split(" ") if w]
        tot = sum(bits[w] for w in toks)
        mb[d] = (1000 * tot) // len(toks) if toks else 0
    exp_rows = []
    for lang in ("en", "de"):
        docs = sorted((d for d, r in enumerate(rows) if r[2] == lang),
                      key=lambda d: (mb[d], d))
        n = len(docs)
        for r0, d in enumerate(docs):
            bucket = ("head" if r0 * 3 < n
                      else "middle" if r0 * 3 < 2 * n else "tail")
            exp_rows.append((d, lang, mb[d], bucket))
    exp = pd.DataFrame(exp_rows, columns=["doc_id", "lang",
                                          "mean_millibits", "ppl_bucket"]) \
        .astype({"doc_id": "int64", "mean_millibits": "int64"}) \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp)
    # thirds are balanced to within 1 per lang
    per = got.groupby(["lang", "ppl_bucket"]).size().unstack()
    assert (per.max(axis=1) - per.min(axis=1)).max() <= 1


# ----------------------------------------------------- temperature sample

def test_temperature_sample_rule_exact(ray_session, tmp_path):
    from crusty_ray.ops.sample import temperature_sample_ds
    # skewed langs: en 40, de 10 → de rate = sqrt(10/40) = 0.5
    rows = [(i, f"doc {i}", "en" if i < 40 else "de", "s0")
            for i in range(50)]
    sf = _write_docs(tmp_path, rows)
    got = temperature_sample_ds(sf).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    counts = {"en": 40, "de": 10}
    n_max = 40
    exp_ids = []
    for i, _, lang, _ in rows:
        b = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 1000
        if b * b * n_max < 1_000_000 * counts[lang]:
            exp_ids.append((i, lang))
    exp = pd.DataFrame(exp_ids, columns=["doc_id", "lang"]) \
        .astype({"doc_id": "int64"})
    pd.testing.assert_frame_equal(got, exp)
    # en keeps everything (rate 1); de is actually downsampled
    assert (got["lang"] == "en").sum() == 40
    assert 0 < (got["lang"] == "de").sum() < 10


# ------------------------------------------------------ webdataset export

def _write_images(path, n=40, dup_every=5):
    rng = np.random.default_rng(3)
    rows = []
    for i in range(n):
        payload = bytes(rng.integers(0, 256, rng.integers(100, 800),
                                     dtype=np.uint8))
        rows.append({
            "image_id": f"im{i:04d}", "bytes": payload, "w": 64, "h": 64,
            "fmt": "png", "caption": f"a fine caption number {i}",
            # dup groups share a phash → dedup keeps the min image_id
            "phash": np.int64(i // dup_every), "n_bytes": len(payload),
            "decode_ok": True})
    t = pa.table({k: pa.array([r[k] for r in rows]) for k in rows[0]})
    p = f"{path}/images.parquet"
    pq.write_table(t, p)
    return p, rows


def test_webdataset_roundtrip_and_determinism(ray_session, tmp_path):
    from crusty_ray.ops.pack import export_webdataset
    src, rows = _write_images(tmp_path)
    out1, out2 = tmp_path / "wds1", tmp_path / "wds2"
    s1 = export_webdataset(src, str(out1), shard_bytes=2000)
    s2 = export_webdataset(src, str(out2), shard_bytes=2000)

    # summary is consistent and covers exactly the dedup survivors
    survivors = {f"im{i:04d}": r for i, r in enumerate(rows) if i % 5 == 0}
    assert int(s1["n_images"].sum()) == len(survivors)
    assert len(s1) > 1  # the byte budget actually splits shards

    # byte determinism: two runs produce identical files
    for p1 in sorted(os.listdir(out1)):
        b1 = open(out1 / p1, "rb").read()
        b2 = open(out2 / p1, "rb").read()
        assert b1 == b2, p1

    # readback: every survivor present exactly once, payload + caption exact
    seen = {}
    for p1 in sorted(os.listdir(out1)):
        with tarfile.open(out1 / p1) as tar:
            members = tar.getmembers()
            # members come in (payload, caption) adjacent pairs, id-sorted
            names = [m.name for m in members]
            assert names == sorted(names, key=lambda x: x.rsplit(".", 1)[0])
            for m in members:
                stem, ext = m.name.rsplit(".", 1)
                data = tar.extractfile(m).read()
                seen.setdefault(stem, {})[ext] = data
    assert set(seen) == set(survivors)
    for iid, parts in seen.items():
        assert parts["png"] == survivors[iid]["bytes"]
        assert parts["txt"].decode() == survivors[iid]["caption"]


def test_webdataset_retry_overwrites(ray_session, tmp_path):
    """A stale/partial shard file from a failed attempt is replaced, not
    appended to (os.replace semantics)."""
    from crusty_ray.ops.pack import export_webdataset
    src, _ = _write_images(tmp_path, n=10, dup_every=1)
    out = tmp_path / "wds"
    out.mkdir()
    (out / "shard-000000.tar").write_bytes(b"garbage from a dead task")
    s = export_webdataset(src, str(out), shard_bytes=1 << 20)
    with tarfile.open(out / "shard-000000.tar") as tar:
        assert len(tar.getmembers()) == 2 * int(s["n_images"].sum())
