"""Iterative BPE trainer: randomized parity vs a reference Python
implementation of Sennrich 2016 (word-frequency form, identical
tie-breaks), plus the greedy-overlap and early-stop edge cases."""

from __future__ import annotations

import random
import re
from collections import Counter

import pytest

from nebula_importer_spark.operators.bpe import (
    END_OF_WORD,
    bpe_encode,
    bpe_train,
)


def _model_vocab(texts):
    words = Counter()
    for t in texts:
        for w in re.findall(r"[^\t\n\f\r ]+", t or ""):
            words[w] += 1
    return {tuple(w) + (END_OF_WORD,): c for w, c in words.items()}


def _model_merge(syms, left, right, merged):
    out = []
    for s in syms:
        if out and out[-1] == left and s == right:
            out[-1] = merged
        else:
            out.append(s)
    return tuple(out)


def _model_train(texts, n_merges, min_pair_count):
    vocab = _model_vocab(texts)
    merges = []
    for rnd in range(1, n_merges + 1):
        pairs = Counter()
        for syms, cnt in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += cnt
        if not pairs:
            break
        # max count, ties by ascending (left, right)
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        (left, right), cnt = best
        if cnt < min_pair_count:
            break
        merged = left + right
        merges.append((rnd, left, right, merged, cnt))
        vocab = {
            _model_merge(syms, left, right, merged): c
            for syms, c in vocab.items()
        }
    return merges


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_bpe_train_classic_corpus(spark):
    texts = ["low low low lower lowest", "new newer newest low"]
    got = [
        (r.round, r.left_sym, r.right_sym, r.merged, r.pair_count)
        for r in bpe_train(_docs(spark, texts), n_merges=6).collect()
    ]
    assert got == _model_train(texts, 6, 2)
    # the classic chain: lo, low, low</w> lead
    assert [g[3] for g in got[:3]] == ["lo", "low", "low</w>"]


def test_bpe_train_random_parity(spark):
    rng = random.Random(5)
    words = ["".join(rng.choice("abc") for _ in range(rng.randint(1, 5)))
             for _ in range(30)]
    texts = [" ".join(rng.choice(words) for _ in range(rng.randint(1, 20)))
             for _ in range(12)]
    got = [
        (r.round, r.left_sym, r.right_sym, r.merged, r.pair_count)
        for r in bpe_train(_docs(spark, texts), n_merges=12,
                           min_pair_count=2).collect()
    ]
    assert got == _model_train(texts, 12, 2)


def test_bpe_greedy_overlap(spark):
    # 'aaa': merging (a,a) must give [aa, a] (left-to-right, non-overlapping)
    texts = ["aaa aaa aaa"]
    got = bpe_train(_docs(spark, texts), n_merges=1).collect()
    assert (got[0].left_sym, got[0].right_sym, got[0].pair_count) == ("a", "a", 6)
    enc = bpe_encode(_docs(spark, texts), [("a", "a")]).collect()
    assert list(enc[0].bpe_tokens) == ["aa", "a", END_OF_WORD] * 3


def test_bpe_early_stop_and_nulls(spark):
    texts = ["x y z", None, ""]
    got = bpe_train(_docs(spark, texts), n_merges=10, min_pair_count=2).collect()
    # best pair is (char, </w>) with count 1 < 2 → zero merges
    assert got == []


def test_bpe_encode_matches_model(spark):
    texts = ["low low lower", "newest low"]
    merges = [(m[1], m[2]) for m in _model_train(texts, 5, 1)]
    got = {
        r.doc_id: list(r.bpe_tokens)
        for r in bpe_encode(_docs(spark, texts), merges).collect()
    }
    for i, t in enumerate(texts):
        want = []
        for w in re.findall(r"[^\t\n\f\r ]+", t):
            syms = tuple(w) + (END_OF_WORD,)
            for left, right in merges:
                syms = _model_merge(syms, left, right, left + right)
            want.extend(syms)
        assert got[i] == want, i


def test_bpe_validation(spark):
    df = _docs(spark, ["x"])
    with pytest.raises(ValueError, match="n_merges"):
        bpe_train(df, n_merges=0)
    with pytest.raises(ValueError, match="min_pair_count"):
        bpe_train(df, min_pair_count=0)
    with pytest.raises(ValueError, match="not in input"):
        bpe_train(df.drop("text"))
    with pytest.raises(ValueError, match="not in input"):
        bpe_encode(df, [], text_col="zz")


def test_bpe_token_counts_equal_vocab_resolution(spark):
    """Per-doc token counts from the map-only encoder must equal the
    word->final-symbol-count dictionary route (the gate oracle's
    identity: encoding is a pure function of the word)."""
    from nebula_importer_spark.operators.bpe import bpe_encode, bpe_train

    docs = spark.createDataFrame(
        [
            (1, "low low lower lowest"),
            (2, "new newer newest low"),
            (3, ""),
            (4, None),
        ],
        "doc_id long, text string",
    )
    mt = bpe_train(docs, n_merges=5, min_pair_count=2)
    merges = [(r.left_sym, r.right_sym) for r in mt.orderBy("round").collect()]
    enc = {
        r.doc_id: list(r.bpe_tokens)
        for r in bpe_encode(docs, merges).collect()
    }
    # dictionary route: encode each distinct word once, sum per doc
    vocab_rows = bpe_encode(
        spark.createDataFrame(
            [(w,) for w in ["low", "lower", "lowest", "new", "newer",
                            "newest"]],
            "text string",
        ),
        merges,
    ).collect()
    per_word = {r.text: len(r.bpe_tokens) for r in vocab_rows}
    for doc_id, text in [(1, "low low lower lowest"),
                         (2, "new newer newest low")]:
        assert len(enc[doc_id]) == sum(per_word[w] for w in text.split())
    assert enc[3] == [] and enc[4] == []


def _py_unigram(words_with_counts, scores, L=4):
    out = {}
    for word, cnt in words_with_counts.items():
        n = len(word)
        v = [None] * (n + 1)
        v[0] = 0
        for i in range(1, n + 1):
            best = None
            for j in range(max(0, i - L), i):
                if v[j] is None:
                    continue
                s = scores.get(word[j:i])
                if s is None:
                    continue
                cand = v[j] + s * 100 - 1
                if best is None or cand > best:
                    best = cand
            v[i] = best
        if v[n] is None:
            out[word] = (cnt, None, None)
        else:
            p = (-v[n]) % 100
            out[word] = (cnt, (v[n] + p) // 100, p)
    return out


def test_unigram_tokenizer_random_parity(spark):
    import math
    import random

    from nebula_importer_spark.operators.bpe import (
        unigram_vocab,
        unigram_word_segments,
    )

    rng = random.Random(17)
    alphabet = "abcdef"
    docs = []
    for i in range(40):
        words = [
            "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 9)))
            for _ in range(rng.randint(1, 8))
        ]
        docs.append((i, " ".join(words)))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    v = unigram_vocab(df, min_count=2)
    got = {
        r["word"]: (r["count"], r["best_micro"], r["n_pieces"])
        for r in unigram_word_segments(df, v).collect()
    }

    # independent reference: rebuild vocab + DP in plain Python
    wc = {}
    for _, text in docs:
        for w in text.split():
            wc[w] = wc.get(w, 0) + 1
    pc = {}
    for w, c in wc.items():
        for i in range(len(w)):
            for l in range(1, 5):
                if i + l <= len(w):
                    pc[w[i:i + l]] = pc.get(w[i:i + l], 0) + c
    kept = {p: c for p, c in pc.items() if c >= 2 or len(p) == 1}
    tot = sum(kept.values())
    scores = {p: math.floor(math.log(c / tot) * 10**6) for p, c in kept.items()}
    assert got == _py_unigram(wc, scores)


def test_unigram_vocab_coverage_and_validation(spark):
    import pytest

    from nebula_importer_spark.operators.bpe import (
        unigram_vocab,
        unigram_word_segments,
    )

    df = spark.createDataFrame([(1, "xyzzy q")], "doc_id long, text string")
    v = unigram_vocab(df, min_count=5)
    pieces = {r.piece for r in v.collect()}
    # rare multigrams cut, but every single char survives (coverage)
    assert pieces == {"x", "y", "z", "q"}
    segs = {r.word: r.n_pieces for r in unigram_word_segments(df, v).collect()}
    assert segs == {"xyzzy": 5, "q": 1}  # char-by-char fallback
    with pytest.raises(ValueError, match="max_piece_len"):
        unigram_vocab(df, max_piece_len=0)
    with pytest.raises(ValueError, match="not in vocab"):
        unigram_word_segments(df, df)
