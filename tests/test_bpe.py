"""BPE training/apply conformance: the distributed trainer (word-count
table) must equal an independent serial reference that scans raw word
INSTANCES each iteration; apply semantics are pinned by construction."""

import hashlib
from collections import Counter

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _serial_bpe(texts: list[str], n_merges: int):
    """Instance-scanning reference: no word-frequency table — recounts
    pairs over every word OCCURRENCE in the corpus each iteration."""
    instances = [list(w) for t in texts for w in t.split(" ") if w != ""]
    merges = []
    for rank in range(n_merges):
        pairs = Counter()
        for syms in instances:
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += 1
        if not pairs:
            break
        (l, r), c = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if c < 2:
            break
        merges.append((rank, l, r, c))
        joined = l + r
        nxt = []
        for syms in instances:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(joined)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            nxt.append(out)
        instances = nxt
    return merges


FIXTURE = [
    "the cat sat on the mat",
    "the cats sat on the mats",
    "that cat that mat that hat",
    "hello hello world worldly",
    "abababab abab ab",
]


def _write_docs(tmp_path, texts):
    t = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": texts,
        "lang": ["en"] * len(texts),
        "source": ["s"] * len(texts),
        "n_chars": pa.array([len(x) for x in texts], pa.int64()),
    })
    d = tmp_path / "bpe_fixture"
    d.mkdir()
    pq.write_table(t, str(d / "documents.parquet"))
    return str(d)


class TestTrain:
    def test_matches_instance_scanning_reference(self, ray_session, tmp_path):
        from crusty_ray.ops.bpe import bpe_train_ds
        d = _write_docs(tmp_path, FIXTURE)
        got = bpe_train_ds(d, n_merges=12)
        want = _serial_bpe(FIXTURE, 12)
        assert [tuple(r) for r in
                got[["rank", "left", "right", "pair_count"]].itertuples(
                    index=False)] == want
        assert len(want) > 4  # the fixture actually trains several merges

    def test_sf_corpus_trains_and_is_deterministic(self, ray_session):
        from crusty_ray.ops.bpe import bpe_train_ds
        a = bpe_train_ds("/root/testdata/sf0.001", n_merges=10)
        b = bpe_train_ds("/root/testdata/sf0.001", n_merges=10)
        pd.testing.assert_frame_equal(a, b)
        assert len(a) == 10
        # counts are non-increasing in rank is NOT guaranteed by BPE (a
        # merge can create a new frequent pair), but every count >= 2 is
        assert (a["pair_count"] >= 2).all()


class TestEncode:
    def test_zero_merges_splits_to_chars(self, ray_session, tmp_path):
        from crusty_ray.ops.bpe import bpe_encode_ds
        d = _write_docs(tmp_path, ["ab cde", "x"])
        out = bpe_encode_ds(d, n_merges=0).to_pandas() \
            .set_index("doc_id").sort_index()
        assert out.loc[0, "n_words"] == 2
        assert out.loc[0, "n_bpe_tokens"] == 5      # a b c d e
        assert out.loc[1, "n_bpe_tokens"] == 1
        want0 = hashlib.md5(b"a b c d e").hexdigest()
        assert out.loc[0, "bpe_md5"] == want0

    def test_merges_compress_and_respect_rank_order(self, ray_session,
                                                    tmp_path):
        from crusty_ray.ops.bpe import bpe_encode_ds, encode_word
        texts = ["abab abab abab cd", "abab cd cd"]
        d = _write_docs(tmp_path, texts)
        few = bpe_encode_ds(d, n_merges=1).to_pandas() \
            .set_index("doc_id").sort_index()
        many = bpe_encode_ds(d, n_merges=8).to_pandas() \
            .set_index("doc_id").sort_index()
        assert (many["n_bpe_tokens"] <= few["n_bpe_tokens"]).all()
        # first learned merge must be (a, b) — the most frequent pair —
        # and apply greedily lowest-rank-first
        assert encode_word("abab", {("a", "b"): 0}) == ["ab", "ab"]
        assert encode_word("abab", {("a", "b"): 0, ("ab", "ab"): 1}) \
            == ["abab"]
        # overlapping occurrences merge left-to-right, non-overlapping
        assert encode_word("aaa", {("a", "a"): 0}) == ["aa", "a"]

    def test_encode_consistent_with_training_segmentation(self, ray_session,
                                                          tmp_path):
        """Applying the learned merges with the apply loop reproduces the
        trainer's own final segmentation of every corpus word (the
        rank-order apply is equivalent to replaying merges in sequence for
        merges learned from this corpus)."""
        from crusty_ray.ops.bpe import (_merge_word, encode_word,
                                        learn_merges)
        wc = Counter(w for t in FIXTURE for w in t.split(" ") if w != "")
        merges = learn_merges(dict(wc), 12)
        ranks = {(l, r): k for k, l, r, _ in merges}
        for w in wc:
            syms = tuple(w)
            for _, l, r, _c in merges:
                syms = _merge_word(syms, (l, r), l + r)
            assert encode_word(w, ranks) == list(syms), w
