"""Storage-backend seam (ops/io.py): Lance when importable, parquet fallback.

BASELINE.json's north rule names Lance tables; the `lance` package is not
installed in this sandbox, so the parquet fallback is what runs here and the
Lance leg is exercised only when the package exists (skipped otherwise).
"""

import importlib.util

import pyarrow as pa
import pytest

from crusty_ray.ops import io as cio

HAVE_LANCE = importlib.util.find_spec("lance") is not None


def test_backend_reports_installed_reality():
    assert cio.storage_backend() == ("lance" if HAVE_LANCE else "parquet")


def test_parquet_fallback_roundtrip(ray_session, tmp_path):
    import ray
    t = pa.table({"image_id": ["a", "b"], "caption": ["x", "y"],
                  "phash": pa.array([1, 2], pa.int64())})
    ds = ray.data.from_arrow(t)
    out = str(tmp_path / "imgs")
    cio.write_dataset(ds, out)
    back = cio.read_dataset(out).to_pandas().sort_values("image_id")
    assert list(back["image_id"]) == ["a", "b"]
    assert list(back["phash"]) == [1, 2]


@pytest.mark.skipif(not HAVE_LANCE, reason="lance not installed (sandbox)")
def test_lance_roundtrip(ray_session, tmp_path):
    import ray
    t = pa.table({"image_id": ["a"], "bytes": [b"\x89PNG"],
                  "caption": ["c"], "phash": pa.array([7], pa.int64())})
    ds = ray.data.from_arrow(t)
    out = str(tmp_path / "imgs_lance")
    cio.write_dataset(ds, out)
    back = cio.read_dataset(out, columns=["image_id", "phash"]).to_pandas()
    assert list(back["image_id"]) == ["a"]


def test_compact_dataset_preserves_rows(ray_session, tmp_path):
    """Compaction must be a pure rewrite: identical row multiset, fewer
    files, file count matching the byte-budget sizing."""
    import glob

    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq
    from crusty_ray.ops.io import compact_dataset

    src = tmp_path / "frag"
    src.mkdir()
    # 12 tiny fragments, epoch-partitioned like crawl_log
    for e in range(12):
        d = src / f"epoch={e}"
        d.mkdir()
        pq.write_table(pa.table({
            "k": pa.array(range(e * 100, e * 100 + 100), pa.int64()),
            "v": [f"r{e}_{i}" for i in range(100)],
        }), str(d / "part.parquet"))

    out = tmp_path / "compact"
    summary = compact_dataset(str(src), str(out), target_bytes=1 << 30)
    assert int(summary["in_files"][0]) == 12
    assert int(summary["out_files"][0]) == 1   # all fits one target file
    assert int(summary["rows"][0]) == 1200

    a = duckdb.sql(f"SELECT k, v FROM read_parquet('{src}/*/*.parquet') "
                   f"ORDER BY k").df()
    b = duckdb.sql(f"SELECT k, v FROM read_parquet('{out}/*.parquet') "
                   f"ORDER BY k").df()
    assert a.equals(b)


def test_read_any_csv_jsonl_parquet_equal(ray_session, tmp_path):
    """The same table through all three row/columnar ingest formats reads
    identically (types normalized: CSV/JSON re-infer ints)."""
    import duckdb
    import pandas as pd

    src = "/root/testdata/sf0.001/documents.parquet"
    csv, jsonl = str(tmp_path / "docs.csv"), str(tmp_path / "docs.jsonl")
    duckdb.sql(f"COPY (SELECT doc_id, source, text FROM '{src}') "
               f"TO '{csv}' (HEADER, DELIMITER ',')")
    duckdb.sql(f"COPY (SELECT doc_id, source, text FROM '{src}') "
               f"TO '{jsonl}'")  # newline-delimited json

    def norm(ds):
        df = ds.to_pandas()[["doc_id", "source", "text"]]
        df["doc_id"] = df["doc_id"].astype("int64")
        return df.sort_values("doc_id").reset_index(drop=True)

    base = norm(cio.read_any(src, columns=["doc_id", "source", "text"]))
    for path in (csv, jsonl):
        got = norm(cio.read_any(path, columns=["doc_id", "source", "text"]))
        pd.testing.assert_frame_equal(got, base, check_dtype=False)


def test_export_jsonl_roundtrip(ray_session, tmp_path):
    import pandas as pd
    import ray

    df = pd.DataFrame({"doc_id": pd.Series(range(50), dtype="int64"),
                       "text": [f"line {i} with, comma" for i in range(50)]})
    out = str(tmp_path / "export")
    cio.export_jsonl(ray.data.from_pandas(df), out)
    import glob as _g
    files = _g.glob(f"{out}/*.json*")
    assert files, "no jsonl files written"
    back = cio.read_any(files[0]) if len(files) == 1 else None
    if back is None:  # multiple blocks: read the dir as json
        back = ray.data.read_json(out)
    got = back.to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["doc_id", "text"]].astype({"doc_id": "int64"}), df,
        check_dtype=False)


# --------------------------------------------------------- lance maintenance
#
# The real `lance` package cannot be installed in this sandbox, so the
# maintenance LOGIC (ops/io.lance_maintain: bytes-measured fragment sizing +
# version pruning) is exercised against a minimal in-repo fake of exactly
# the API surface it uses — the same clearly-marked-stand-in pattern as the
# AV codecs. The fake is honest about Lance's storage model: every commit
# appends a manifest under _versions/, compaction writes NEW fragments and
# a new manifest (old fragments stay until cleanup), cleanup drops old
# manifests and deletes fragments no remaining manifest references.

import json as _json
import os as _os
import uuid as _uuid
from datetime import datetime as _dt
from datetime import timedelta as _td
from types import SimpleNamespace


class _FakeLanceModule:
    @staticmethod
    def _manifests(path):
        vdir = _os.path.join(path, "_versions")
        files = sorted(_os.listdir(vdir)) if _os.path.isdir(vdir) else []
        return [(_os.path.join(vdir, f), _json.load(open(_os.path.join(vdir, f))))
                for f in files if f.endswith(".json")]

    @classmethod
    def _commit(cls, path, frag_files, ts=None):
        vdir = _os.path.join(path, "_versions")
        _os.makedirs(vdir, exist_ok=True)
        n = len(cls._manifests(path)) + 1
        with open(_os.path.join(vdir, f"{n:06d}.json"), "w") as f:
            _json.dump({"version": n,
                        "timestamp": (ts or _dt.now()).isoformat(),
                        "fragments": frag_files}, f)

    @classmethod
    def write_dataset(cls, table, path, mode="create", ts=None):
        import pyarrow.parquet as _pq
        ddir = _os.path.join(path, "data")
        _os.makedirs(ddir, exist_ok=True)
        frag = f"frag-{_uuid.uuid4().hex}.bin"
        _pq.write_table(table, _os.path.join(ddir, frag))
        prev = (cls._manifests(path)[-1][1]["fragments"]
                if mode == "append" and cls._manifests(path) else [])
        cls._commit(path, prev + [frag], ts=ts)

    @classmethod
    def dataset(cls, path):
        return _FakeLanceDataset(path)


class _FakeLanceDataset:
    def __init__(self, path):
        self.path = path
        self._mod = _FakeLanceModule
        self.optimize = SimpleNamespace(compact_files=self._compact_files)

    def _live(self):
        return self._mod._manifests(self.path)[-1][1]["fragments"]

    def get_fragments(self):
        return list(self._live())

    def to_table(self):
        import pyarrow as _pa
        import pyarrow.parquet as _pq
        return _pa.concat_tables(
            _pq.read_table(_os.path.join(self.path, "data", f))
            for f in self._live())

    def count_rows(self):
        return self.to_table().num_rows

    def versions(self):
        return [{"version": m["version"],
                 "timestamp": _dt.fromisoformat(m["timestamp"])}
                for _p, m in self._mod._manifests(self.path)]

    def _compact_files(self, target_rows_per_fragment):
        import pyarrow.parquet as _pq
        t = self.to_table()
        ddir = _os.path.join(self.path, "data")
        frags = []
        for lo in range(0, t.num_rows, target_rows_per_fragment):
            frag = f"frag-{_uuid.uuid4().hex}.bin"
            _pq.write_table(t.slice(lo, target_rows_per_fragment),
                            _os.path.join(ddir, frag))
            frags.append(frag)
        self._mod._commit(self.path, frags)

    def cleanup_old_versions(self, older_than, delete_unverified=False):
        cutoff = _dt.now() - older_than
        manifests = self._mod._manifests(self.path)
        keep, drop = [], []
        for i, (p, m) in enumerate(manifests):
            is_latest = i == len(manifests) - 1
            if is_latest or _dt.fromisoformat(m["timestamp"]) >= cutoff:
                keep.append((p, m))
            else:
                drop.append((p, m))
        live = {f for _p, m in keep for f in m["fragments"]}
        removed = 0
        for p, _m in drop:
            removed += _os.path.getsize(p)
            _os.remove(p)
        ddir = _os.path.join(self.path, "data")
        for f in _os.listdir(ddir):
            if f not in live:
                removed += _os.path.getsize(_os.path.join(ddir, f))
                _os.remove(_os.path.join(ddir, f))
        return SimpleNamespace(bytes_removed=removed,
                               old_versions=len(drop))


@pytest.fixture
def fake_lance(monkeypatch):
    import sys
    monkeypatch.setitem(sys.modules, "lance", _FakeLanceModule)
    yield _FakeLanceModule


def test_lance_fragment_rows_sizing():
    from crusty_ray.ops.io import lance_fragment_rows
    # MB-scale binary rows: fragments sized by BYTES, far under the 1M cap
    assert lance_fragment_rows(10_000, 10_000 * (1 << 20)) == (64 << 20) // (1 << 20)
    # tiny rows: clamp at the 1M-row fragment ceiling
    assert lance_fragment_rows(10**9, 10**9 * 8) == 1 << 20
    # degenerate inputs: nothing measured -> the default ceiling
    assert lance_fragment_rows(0, 0) == 1 << 20
    assert lance_fragment_rows(100, 100 * (1 << 30)) == 1  # 1 GiB rows


def test_lance_maintain_compacts_and_prunes(fake_lance, tmp_path):
    """The maintenance pass over an append-accumulated fake-Lance dataset:
    fragments compact to the bytes-measured size, stale versions prune,
    orphaned fragment files leave the disk, data survives byte-exact."""
    import pyarrow as pa
    from crusty_ray.ops.io import lance_maintain

    path = str(tmp_path / "tbl")
    old_ts = _dt.now() - _td(days=30)
    rows = []
    for e in range(6):  # 6 append commits = 6 fragments + 6 old manifests
        t = pa.table({"image_id": [f"im{e}_{i}" for i in range(50)],
                      "payload": [b"x" * 2048] * 50})
        rows.extend(t["image_id"].to_pylist())
        fake_lance.write_dataset(t, path,
                                 mode="create" if e == 0 else "append",
                                 ts=old_ts)

    before = fake_lance.dataset(path)
    assert len(before.get_fragments()) == 6
    summary = lance_maintain(path, target_bytes=1 << 20, keep_hours=24.0)

    assert summary["compacted"] and summary["fragments_before"] == 6
    # 300 rows x ~2KB ≈ 620KB data; 1MiB target -> every row fits one frag
    assert summary["fragments_after"] == 1
    assert summary["rows"] == 300
    # all 6 backdated manifests pruned; compaction's fresh manifest remains
    assert summary["versions_after"] == 1
    assert summary["bytes_removed"] > 0
    after = fake_lance.dataset(path)
    assert sorted(after.to_table()["image_id"].to_pylist()) == sorted(rows)
    # the 6 orphaned append-fragments are gone from disk
    assert len(_os.listdir(_os.path.join(path, "data"))) == 1
