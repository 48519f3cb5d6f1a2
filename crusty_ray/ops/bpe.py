"""BPE tokenizer TRAINING and application over a documents table.

The missing piece between the corpus ops and a real LM data pipeline: learn
byte-pair-encoding merges from the corpus (Sennrich et al. 2016, "Neural
Machine Translation of Rare Words with Subword Units"), then re-tokenize
every document under the learned merges (``text.bpe_token_count`` counts
pre-tokenizer pieces; this learns the subword vocabulary itself).

Scale shape — the same split real trainers use (HF tokenizers, fastBPE):
the DISTRIBUTED work is the word-frequency count (one explode + grouped
count over the corpus); merge learning then runs on the O(vocab)
word-frequency table, never on raw text — vocab is the documented
small-side bound this repo already accepts for ``build_vocab`` /
``unigram_surprisal``. Application is embarrassingly parallel: the merge
table (O(n_merges) rows) broadcasts via ``ray.put``; each worker encodes
each DISTINCT word once per process (memoized) and maps documents
vectorized through the cache.

Word convention: non-empty space-split tokens (the repo-wide one). Words
are sequences of CHARACTERS with no end-of-word marker; merges apply
within words only (no cross-word pairs) — both conventions are pinned by
the serial-reference test in ``tests/test_bpe.py``.
"""

from __future__ import annotations

import hashlib
from collections import Counter

import pandas as pd

from .io import read_parquet as _io_read


def _count_pairs(words: list[tuple[tuple[str, ...], int]]) -> Counter:
    pairs: Counter = Counter()
    for syms, cnt in words:
        for a, b in zip(syms, syms[1:]):
            pairs[(a, b)] += cnt
    return pairs


def _merge_word(syms: tuple[str, ...], pair: tuple[str, str],
                joined: str) -> tuple[str, ...]:
    """Replace occurrences of ``pair`` left-to-right (non-overlapping)."""
    out: list[str] = []
    i = 0
    while i < len(syms):
        if (i + 1 < len(syms) and syms[i] == pair[0]
                and syms[i + 1] == pair[1]):
            out.append(joined)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def learn_merges(word_counts: dict[str, int],
                 n_merges: int) -> list[tuple[int, str, str, int]]:
    """Classic BPE merge learning over a word-frequency table. Deterministic
    tie-break: highest pair count, then lexicographically smallest
    (left, right). Returns [(rank, left, right, pair_count)]; stops early
    when no pair occurs at least twice."""
    words = [(tuple(w), int(c)) for w, c in word_counts.items() if w]
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        pairs = _count_pairs(words)
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (left, right), cnt = best
        if cnt < 2:
            break  # merging hapax pairs is vocabulary noise, not compression
        merges.append((rank, left, right, cnt))
        joined = left + right
        words = [(_merge_word(s, (left, right), joined), c)
                 for s, c in words]
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply learned merges to one word: repeatedly merge the LOWEST-rank
    adjacent pair present (all its occurrences, left-to-right) until no
    merge applies — the standard BPE apply loop."""
    syms: tuple[str, ...] = tuple(word)
    while len(syms) > 1:
        best_rank, best_pair = None, None
        for p in zip(syms, syms[1:]):
            r = ranks.get(p)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, p
        if best_pair is None:
            break
        syms = _merge_word(syms, best_pair, best_pair[0] + best_pair[1])
    return list(syms)


def _corpus_word_counts(sf_dir: str) -> pd.DataFrame:
    """Distributed word-frequency table (w, cnt) — explode per batch with
    in-batch pre-aggregation, finished by one coarse grouped count."""
    from .agg import grouped_count

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        w = batch["text"].fillna("").str.split(" ").explode()
        w = w[w != ""].dropna()
        return pd.DataFrame({"w": w.astype(str)})

    toks = _io_read(f"{sf_dir}/documents.parquet", columns=["text"]) \
        .map_batches(explode, batch_format="pandas")
    return grouped_count(toks, ["w"], "cnt").to_pandas()  # O(vocab)


def bpe_train_ds(sf_dir: str, n_merges: int = 40) -> pd.DataFrame:
    """Contract face: learned merge table (rank, left, right, pair_count).
    Distributed word count → driver merge loop on the O(vocab) table."""
    counts = _corpus_word_counts(sf_dir)
    merges = learn_merges(dict(zip(counts["w"], counts["cnt"])), n_merges)
    return pd.DataFrame({
        "rank": pd.Series([m[0] for m in merges], dtype="int64"),
        "left": pd.Series([m[1] for m in merges], dtype="object"),
        "right": pd.Series([m[2] for m in merges], dtype="object"),
        "pair_count": pd.Series([m[3] for m in merges], dtype="int64"),
    })


def bpe_encode_ds(sf_dir: str, n_merges: int = 40):
    """Re-tokenize every document under the learned merges. Returns
    (doc_id, n_words, n_bpe_tokens, bpe_md5) where ``bpe_md5`` hashes the
    doc's full subword stream (subwords space-joined, in order) — a
    deterministic face for cross-run / cross-layout equality.

    The merge table is tiny (≤ n_merges rows) and ships once via
    ``ray.put``; encoding memoizes per DISTINCT word per worker process, so
    the per-batch cost is O(new words · word_len · merges) and repeated
    words are a dict hit."""
    import ray as _ray

    mt = bpe_train_ds(sf_dir, n_merges)
    ranks = {(l, r): int(k) for k, l, r in
             zip(mt["rank"], mt["left"], mt["right"])}
    ranks_ref = _ray.put(ranks)

    def encode(batch: pd.DataFrame, _state={}) -> pd.DataFrame:
        if "ranks" not in _state:  # once per worker process
            _state["ranks"] = _ray.get(ranks_ref)
            _state["memo"] = {}
        rk, memo = _state["ranks"], _state["memo"]

        def enc(word: str) -> tuple[int, str]:
            got = memo.get(word)
            if got is None:
                pieces = encode_word(word, rk)
                got = (len(pieces), " ".join(pieces))
                memo[word] = got
            return got

        ids, n_words, n_bpe, md5s = [], [], [], []
        for d, t in zip(batch["doc_id"], batch["text"].fillna("")):
            words = [w for w in t.split(" ") if w != ""]
            encs = [enc(w) for w in words]
            stream = " ".join(e[1] for e in encs)
            ids.append(int(d))
            n_words.append(len(words))
            n_bpe.append(sum(e[0] for e in encs))
            md5s.append(hashlib.md5(stream.encode()).hexdigest())
        return pd.DataFrame({
            "doc_id": pd.Series(ids, dtype="int64"),
            "n_words": pd.Series(n_words, dtype="int64"),
            "n_bpe_tokens": pd.Series(n_bpe, dtype="int64"),
            "bpe_md5": pd.Series(md5s, dtype="object"),
        })

    return _io_read(f"{sf_dir}/documents.parquet",
                    columns=["doc_id", "text"]) \
        .map_batches(encode, batch_format="pandas")
