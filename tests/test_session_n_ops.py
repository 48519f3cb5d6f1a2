"""Planted-fixture tests for the session-n operators: token frequency
spectrum, lang confusion, canonical dedup survivor, exact TF-IDF cosine
pairs, exactly-k stratified sampling. The sf0.01 DuckDB bit-exact check
lives in test_driver_contract.py; these pin the SEMANTICS on corpora where
the right answer is known by construction.
"""

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


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


def test_token_spectrum_planted(ray_session, tmp_path):
    from crusty_ray.ops.text import token_frequency_spectrum_ds
    # counts: a→5, b→2, c→2, d→1  → spectrum {1:1, 2:2, 5:1}
    sf = _write_docs(tmp_path, [
        (1, "a a b", "en", "s0"),
        (2, "a b c", "en", "s0"),
        (3, "a a c d", "en", "s1"),
    ])
    got = token_frequency_spectrum_ds(sf)
    exp = pd.DataFrame({"occurrences": [1, 2, 5], "n_tokens": [1, 2, 1]})
    pd.testing.assert_frame_equal(got, exp.astype("int64"))


def test_token_spectrum_empty_and_whitespace(ray_session, tmp_path):
    from crusty_ray.ops.text import token_frequency_spectrum_ds
    sf = _write_docs(tmp_path, [(1, "", "en", "s0"), (2, "  x", "en", "s0")])
    got = token_frequency_spectrum_ds(sf)
    exp = pd.DataFrame({"occurrences": [1], "n_tokens": [1]}).astype("int64")
    pd.testing.assert_frame_equal(got, exp)


def test_lang_confusion_planted(ray_session, tmp_path):
    from crusty_ray.ops.text import lang_confusion_ds
    # declared de, text is English stopwords → cell (de, en); declared en,
    # no profile hits → (en, unknown)
    sf = _write_docs(tmp_path, [
        (1, "the and of to in", "de", "s0"),
        (2, "qqq zzz www", "en", "s0"),
        (3, "the the the", "en", "s0"),
    ])
    got = lang_confusion_ds(sf)
    exp = pd.DataFrame({
        "lang": ["de", "en", "en"],
        "lang_pred": ["en", "en", "unknown"],
        "n_docs": pd.Series([1, 1, 1], dtype="int64")})
    pd.testing.assert_frame_equal(got, exp)


def test_dedup_canonical_survivor(ray_session, tmp_path):
    from crusty_ray.ops.dedup import dedup_canonical_ds
    # same text → same md5 group; survivor = longest n_chars is equal here
    # (identical texts), so tie-break = min doc_id; a second group where
    # texts differ keeps each its own row
    sf = _write_docs(tmp_path, [
        (10, "dup dup dup", "en", "s0"),
        (7, "dup dup dup", "en", "s0"),
        (3, "unique text", "en", "s0"),
    ])
    got = dedup_canonical_ds(sf).to_pandas()
    md5_dup = hashlib.md5(b"dup dup dup").hexdigest()
    surv = got.set_index("text_md5").loc[md5_dup]
    assert int(surv["canon_doc_id"]) == 7  # tie → min doc_id
    assert len(got) == 2


def test_dedup_canonical_prefers_longest(ray_session, tmp_path):
    """Groups are keyed by EXACT text md5 — different-length texts are
    different groups; the argmax-quality rule matters when a pipeline
    groups by a looser key. Pin the ordering rule itself through
    grouped_top_n: longest first, then min id."""
    from crusty_ray.ops.agg import grouped_top_n
    import ray
    df = pd.DataFrame({
        "text_md5": ["g"] * 3 + ["h"],
        "doc_id": pd.Series([5, 2, 9, 1], dtype="int64"),
        "n_chars": pd.Series([10, 30, 30, 4], dtype="int64")})
    top = grouped_top_n(ray.data.from_pandas(df), ["text_md5"], "n_chars",
                        n=1, ascending=False, tie_cols=["doc_id"]) \
        .to_pandas().sort_values("text_md5").reset_index(drop=True)
    assert list(top["doc_id"]) == [2, 1]  # g: n_chars 30 tie → min id 2


def test_tfidf_cosine_identical_docs(ray_session, tmp_path):
    from crusty_ray.ops.dedup import tfidf_cosine_pairs_ds
    # two identical docs + one disjoint doc (same source). df: shared
    # tokens appear in 2 of 3 docs → N//df = 1 → ibits 0 → all weights 0?
    # Use 4 docs so df=2 of 4 → N//df = 2 → ibits 1 (nonzero weights).
    sf = _write_docs(tmp_path, [
        (1, "alpha beta gamma", "en", "s0"),
        (2, "alpha beta gamma", "en", "s0"),
        (3, "delta epsilon zeta", "en", "s0"),
        (4, "eta theta iota", "en", "s0"),
    ])
    got = tfidf_cosine_pairs_ds(sf, threshold_ppm=100_000).to_pandas()
    assert len(got) == 1
    row = got.iloc[0]
    assert (row["doc_a"], row["doc_b"], row["cos2_ppm"]) == (1, 2, 1_000_000)


def test_tfidf_cosine_matches_bruteforce(ray_session, tmp_path):
    """Random small corpus: the distributed integer plan equals a direct
    per-pair Python-int computation of the same quantized weights."""
    from crusty_ray.ops.dedup import tfidf_cosine_pairs_ds
    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(30)]
    rows = []
    for d in range(24):
        toks = rng.choice(vocab, size=rng.integers(3, 12)).tolist()
        rows.append((d, " ".join(toks), "en", f"s{d % 2}"))
    sf = _write_docs(tmp_path, rows)
    got = tfidf_cosine_pairs_ds(sf, threshold_ppm=1).to_pandas() \
        .sort_values(["doc_a", "doc_b"]).reset_index(drop=True)

    # brute force with the same conventions
    n = len(rows)
    tf = []
    for _, text, _, _ in rows:
        c = {}
        for w in text.split(" "):
            if w:
                c[w] = c.get(w, 0) + 1
        tf.append(c)
    df_cnt = {}
    for c in tf:
        for w in c:
            df_cnt[w] = df_cnt.get(w, 0) + 1
    ibits = {w: (n // d).bit_length() - 1 for w, d in df_cnt.items()}
    weights = [{w: c * ibits[w] for w, c in doc.items() if ibits[w] > 0}
               for doc in tf]
    exp = []
    for a in range(n):
        for b in range(a + 1, n):
            if rows[a][3] != rows[b][3]:
                continue
            dot = sum(v * weights[b].get(w, 0)
                      for w, v in weights[a].items())
            na2 = sum(v * v for v in weights[a].values())
            nb2 = sum(v * v for v in weights[b].values())
            if dot == 0 or na2 == 0 or nb2 == 0:
                continue
            ppm = (1_000_000 * dot * dot) // (na2 * nb2)
            if ppm >= 1:
                exp.append((a, b, ppm))
    exp_df = pd.DataFrame(exp, columns=["doc_a", "doc_b", "cos2_ppm"]) \
        .astype("int64").sort_values(["doc_a", "doc_b"]) \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp_df)


def test_stratified_exact_k(ray_session, tmp_path):
    from crusty_ray.ops.sample import stratified_exact_k_ds
    rows = [(i, f"doc {i}", "en", f"s{i % 3}") for i in range(60)]
    sf = _write_docs(tmp_path, rows)
    got = stratified_exact_k_ds(sf, k=5)
    assert len(got) == 15
    per = got.groupby("source").agg(n=("doc_id", "size"),
                                    rmax=("rn", "max"), rmin=("rn", "min"))
    assert (per["n"] == 5).all() and (per["rmax"] == 5).all() \
        and (per["rmin"] == 1).all()
    # deterministic: same answer twice
    again = stratified_exact_k_ds(sf, k=5)
    pd.testing.assert_frame_equal(got, again)
    # matches the direct md5-rank rule
    ids = [i for i in range(60) if i % 3 == 0]
    exp = sorted(ids, key=lambda d: (hashlib.md5(str(d).encode())
                                     .hexdigest(), d))[:5]
    assert list(got[got["source"] == "s0"]["doc_id"]) == exp


# --------------------------------------------------------- empty-input edges

def test_session_n_ops_empty_corpus(ray_session, tmp_path):
    """All-empty partitions drop the pandas-block schema in Ray; every
    session-n op must restore its typed output columns instead of raising
    KeyError (review finding)."""
    from crusty_ray.ops.dedup import dedup_canonical_ds
    from crusty_ray.ops.sample import stratified_exact_k_ds
    from crusty_ray.ops.text import (lang_confusion_ds,
                                     token_frequency_spectrum_ds)
    sf = _write_docs(tmp_path, [])
    spec = token_frequency_spectrum_ds(sf)
    assert list(spec.columns) == ["occurrences", "n_tokens"] and spec.empty
    conf = lang_confusion_ds(sf)
    assert list(conf.columns) == ["lang", "lang_pred", "n_docs"] \
        and conf.empty
    canon = dedup_canonical_ds(sf)
    # Dataset-level schema survives the all-empty shuffle (the typed-empty
    # union block); ray's to_pandas drops columns on ANY zero-row dataset,
    # so assert at the Dataset level where downstream stages consume it
    assert canon.schema().names == ["text_md5", "canon_doc_id", "n_chars"]
    assert canon.count() == 0
    strat = stratified_exact_k_ds(sf, k=3)
    assert list(strat.columns) == ["source", "doc_id", "rn"] and strat.empty


def test_token_spectrum_all_whitespace(ray_session, tmp_path):
    """Every text tokenizes to nothing — the schema-drop case with
    non-empty input."""
    from crusty_ray.ops.text import token_frequency_spectrum_ds
    sf = _write_docs(tmp_path, [(1, "", "en", "s0"), (2, "   ", "en", "s0")])
    got = token_frequency_spectrum_ds(sf)
    assert list(got.columns) == ["occurrences", "n_tokens"] and got.empty


def test_image_curation_all_rejected(ray_session, tmp_path):
    """Gate rejects every row → the manifest keeps its typed schema
    (review finding: consumers index df['split'])."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from crusty_ray.ops.image_quality import image_text_curation
    t = pa.table({
        "image_id": pa.array(["a", "b"]),
        "w": pa.array([4, 4], type=pa.int32()),
        "h": pa.array([4, 4], type=pa.int32()),
        "fmt": pa.array(["png", "png"]),
        "decode_ok": pa.array([True, True]),
        "caption": pa.array(["x", "y"]),
        "phash": pa.array([1, 2], type=pa.int64()),
    })
    p = tmp_path / "tiny.parquet"
    pq.write_table(t, p)
    got = image_text_curation(str(p))
    # Dataset-level schema survives (typed-empty union block); ray's
    # to_pandas drops columns on any zero-row dataset
    assert got.schema().names == ["image_id", "phash", "w", "h", "fmt",
                                  "split"]
    assert got.count() == 0


def test_image_curation_noncovering_bounds_rejected(ray_session, tmp_path):
    """bounds_pm that doesn't cover [0,1000) fails fast at the driver
    (shared assign_splits assertion), not as an IndexError inside a task."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from crusty_ray.ops.image_quality import image_text_curation
    t = pa.table({
        "image_id": pa.array(["a"]), "w": pa.array([100], type=pa.int32()),
        "h": pa.array([100], type=pa.int32()), "fmt": pa.array(["png"]),
        "decode_ok": pa.array([True]),
        "caption": pa.array(["a perfectly fine caption"]),
        "phash": pa.array([1], type=pa.int64()),
    })
    p = tmp_path / "one.parquet"
    pq.write_table(t, p)
    with pytest.raises(AssertionError):
        image_text_curation(str(p), bounds_pm={"train": 500, "val": 800})


def test_tfidf_partials_are_exact_python_ints(ray_session, tmp_path):
    """The similarity partials carry Python ints (object dtype) so Σw² and
    dot sums beyond int64 can't wrap — semantic parity with the HUGEINT
    oracle. Simulate the magnitude with a repeated-token doc pair and check
    the exact expected cos2_ppm (identical docs → 10⁶)."""
    from crusty_ray.ops.dedup import tfidf_cosine_pairs_ds
    big = " ".join(["tok"] * 5000 + ["filler"])  # tf=5000
    sf = _write_docs(tmp_path, [
        (1, big, "en", "s0"), (2, big, "en", "s0"),
        (3, "other words entirely", "en", "s0"),
        (4, "unrelated stuff here", "en", "s0"),
    ])
    got = tfidf_cosine_pairs_ds(sf, threshold_ppm=100_000).to_pandas()
    assert len(got) == 1
    assert (int(got.iloc[0]["doc_a"]), int(got.iloc[0]["doc_b"]),
            int(got.iloc[0]["cos2_ppm"])) == (1, 2, 1_000_000)
