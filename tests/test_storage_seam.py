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
