"""BPE tokenizer (stages/bpe.py): distributed wordcount training +
actor-pool encoding, pinned against a brute-force reference."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from lasutility_ray.stages.bpe import (
    END,
    _merge_word,
    bpe_encode,
    bpe_train,
    bpe_train_from_types,
    encode_word,
    word_type_table,
)


def _brute_train(types: pd.DataFrame, n_merges):
    """Recompute-everything reference trainer."""
    words = [tuple(w) + (END,) for w in types["word"]]
    counts = types["count"].to_numpy()
    merges = []
    for _ in range(n_merges):
        pc = {}
        for syms, c in zip(words, counts):
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] = pc.get((syms[i], syms[i + 1]), 0) + int(c)
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        words = [_merge_word(w, best) for w in words]
    return merges


def _brute_encode(word, merges):
    """Apply merges strictly in rank order (the textbook definition)."""
    syms = tuple(word) + (END,)
    for m in merges:
        syms = _merge_word(syms, m)
    return syms


def test_incremental_trainer_matches_brute():
    types = pd.DataFrame(
        {
            "word": ["low", "lower", "newest", "widest", "lowest", "new"],
            "count": [5, 2, 6, 3, 4, 7],
        }
    )
    for n in (1, 5, 20, 100):
        assert bpe_train_from_types(types, n) == _brute_train(types, n)


def test_greedy_encode_matches_rank_order():
    types = pd.DataFrame(
        {"word": ["aaab", "abab", "baaa", "bbbb"], "count": [4, 3, 2, 5]}
    )
    merges = bpe_train_from_types(types, 12)
    ranks = {p: i for i, p in enumerate(merges)}
    for w in ["aaab", "abab", "bbbb", "ab", "unseen", "aaaaaaa"]:
        assert encode_word(w, ranks) == _brute_encode(w, merges)


def test_word_type_table_and_train(ray_session):
    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": pa.array(
                    ["the cat sat", "the cat ran", "THE Cat, cat!"], pa.string()
                ),
            }
        )
    )
    types = word_type_table(docs)
    got = dict(zip(types["word"], types["count"]))
    assert got == {"the": 3, "cat": 4, "sat": 1, "ran": 1}
    # deterministic ordering: count desc, word asc
    assert types["word"].tolist()[:2] == ["cat", "the"]
    merges = bpe_train(docs, n_merges=50)
    assert merges == bpe_train(docs, n_merges=50)
    # 'cat</w>' must become a single token early (highest-count word)
    ranks = {p: i for i, p in enumerate(merges)}
    assert encode_word("cat", ranks) == ("cat" + END,)


def test_bpe_encode_stage(ray_session):
    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": pa.array(
                    ["the cat sat", "", "totallyunseenword the"], pa.string()
                ),
            }
        )
    )
    merges = bpe_train(docs, n_merges=30)
    out = (
        bpe_encode(docs, merges)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["n_words"].tolist() == [3, 0, 2]
    ranks = {p: i for i, p in enumerate(merges)}
    exp = [
        sum(len(encode_word(w, ranks)) for w in ["the", "cat", "sat"]),
        0,
        sum(len(encode_word(w, ranks)) for w in ["totallyunseenword", "the"]),
    ]
    assert out["n_bpe_tokens"].tolist() == exp
    # with enough merges every trained word is one token
    assert out.loc[0, "n_bpe_tokens"] == 3
