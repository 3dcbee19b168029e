"""rouge_n / distinct_ngrams — n-gram overlap grading and diversity.

Checked against an independent Python model (plain dict multisets) on
hand cases and randomized corpora, plus the edge cases the ppm guards
pin (empty sides, n longer than the text).
"""

from __future__ import annotations

import random

import pytest


def _py_grams(text: str, n: int) -> list[str]:
    toks = text.lower().split()
    return ["\x1f".join(toks[i:i + n]) for i in range(len(toks) - n + 1)]


def _py_rouge(cand: str, ref: str, n: int):
    from collections import Counter

    cg, rg = _py_grams(cand or "", n), _py_grams(ref or "", n)
    cc, rc = Counter(cg), Counter(rg)
    m = sum(min(cnt, rc[g]) for g, cnt in cc.items())
    rec = m * 10**6 // len(rg) if rg else 0
    prec = m * 10**6 // len(cg) if cg else 0
    f1 = 2 * m * 10**6 // (len(cg) + len(rg)) if cg or rg else 0
    return (len(cg), len(rg), m, rec, prec, f1)


def _run(spark, rows, n=2):
    from nebula_importer_spark.operators.metrics import rouge_n

    df = spark.createDataFrame(rows, "doc_id long, cand string, ref string")
    got = rouge_n(df, id_col="doc_id", cand_col="cand", ref_col="ref", n=n)
    return {
        r.doc_id: (
            r.cand_grams, r.ref_grams, r.matched,
            r.recall_ppm, r.precision_ppm, r.f1_ppm,
        )
        for r in got.collect()
    }


def test_rouge_hand_case(spark):
    rows = [
        (1, "the cat sat on the mat", "the cat was on the mat"),
        (2, "a b a b", "a b"),
        (3, "", "x y"),
        (4, "x y", ""),
        (5, "one", "one"),  # shorter than a bigram on both sides
    ]
    got = _run(spark, rows, n=2)
    for i, cand, ref in rows:
        assert got[i] == _py_rouge(cand, ref, 2), i
    # pinned: "the cat" + "on the" + "the mat" match → 3 of 5 bigrams
    assert got[1][2] == 3 and got[1][3] == 3 * 10**6 // 5
    # clipping: candidate repeats "a b" twice, reference has it once
    assert got[2][2] == 1


def test_rouge_randomized_model_parity(spark):
    rng = random.Random(17)
    vocab = ["a", "bb", "ccc", "dd", "e"]
    rows = [
        (
            i,
            " ".join(rng.choices(vocab, k=rng.randint(0, 12))),
            " ".join(rng.choices(vocab, k=rng.randint(0, 12))),
        )
        for i in range(30)
    ]
    for n in (1, 2, 3):
        got = _run(spark, rows, n=n)
        for i, cand, ref in rows:
            assert got[i] == _py_rouge(cand, ref, n), (n, i)


def test_rouge_validation(spark):
    from nebula_importer_spark.operators.metrics import rouge_n

    df = spark.createDataFrame([(1, "a", "b")], "doc_id long, cand string, ref string")
    with pytest.raises(ValueError, match="n must be"):
        rouge_n(df, n=0)
    with pytest.raises(ValueError, match="not in input"):
        rouge_n(df, cand_col="zz")


def test_distinct_ngrams_hand_and_model(spark):
    from nebula_importer_spark.operators.metrics import distinct_ngrams

    rows = [
        ("en", "a b a b a"),   # bigrams: ab ba ab ba → 2 distinct of 4
        ("en", "a b"),          # ab → total 5, distinct 2
        ("zh", "x y z"),        # xy yz → 2 of 2
        ("fr", "w"),            # no bigram → group absent
    ]
    df = spark.createDataFrame(rows, "lang string, text string")
    got = {
        r.lang: (r.total_grams, r.distinct_grams, r.distinct_ppm)
        for r in distinct_ngrams(df, group_col="lang", n=2).collect()
    }
    assert got["en"] == (5, 2, 2 * 10**6 // 5)
    assert got["zh"] == (2, 2, 10**6)
    assert "fr" not in got  # no grams → no row (explode semantics)
    with pytest.raises(ValueError, match="n must be"):
        distinct_ngrams(df, group_col="lang", n=0)


def _py_bleu(pairs, max_n=4):
    import math
    from collections import Counter

    m = [0] * (max_n + 1)
    c = [0] * (max_n + 1)
    cand_len = ref_len = 0
    for cand, ref in pairs:
        ct, rt = (cand or "").lower().split(), (ref or "").lower().split()
        cand_len += len(ct)
        ref_len += len(rt)
        for n in range(1, max_n + 1):
            cg = Counter(_py_grams(cand or "", n))
            rg = Counter(_py_grams(ref or "", n))
            m[n] += sum(min(k, rg[g]) for g, k in cg.items())
            c[n] += sum(cg.values())
    if cand_len <= 0 or any(m[n] <= 0 or c[n] <= 0 for n in range(1, max_n + 1)):
        bleu = 0
    else:
        s = sum(math.floor(math.log(m[n] / c[n]) * 10**6) for n in range(1, max_n + 1))
        bp = math.floor(min(0.0, 1.0 - ref_len / cand_len) * 10**6)
        bleu = math.floor(math.exp((bp + s / max_n) / 10**6) * 10**6)
    return (cand_len, ref_len, *m[1:], *c[1:], bleu)


def test_corpus_bleu_model_parity(spark):
    from nebula_importer_spark.operators.metrics import corpus_bleu

    rng = random.Random(23)
    vocab = ["the", "cat", "sat", "on", "mat", "dog", "ran"]
    pairs = []
    for _ in range(25):
        # candidates share long spans with their references (so 4-grams
        # match and BLEU is non-degenerate) but diverge at the tail
        cand = rng.choices(vocab, k=rng.randint(6, 15))
        ref = list(cand)
        for _ in range(rng.randint(0, 3)):
            ref[rng.randrange(len(ref))] = rng.choice(vocab)
        pairs.append((" ".join(cand), " ".join(ref)))
    df = spark.createDataFrame(pairs, "cand string, ref string")
    row = corpus_bleu(df).collect()[0]
    want = _py_bleu(pairs)
    got = (
        row.cand_len, row.ref_len,
        row.matched_1, row.matched_2, row.matched_3, row.matched_4,
        row.cand_grams_1, row.cand_grams_2, row.cand_grams_3, row.cand_grams_4,
        row.bleu_micro,
    )
    assert got == want
    assert 0 < row.bleu_micro < 10**6  # random overlap: neither 0 nor perfect

    # perfect corpus → BLEU exactly 1.0 (bp 0, all p_n = 1)
    same = spark.createDataFrame(
        [("a b c d e f", "a b c d e f")], "cand string, ref string"
    )
    assert corpus_bleu(same).collect()[0].bleu_micro == 10**6

    # any empty n-level (no 4-gram matches) → 0 by the stated convention
    short = spark.createDataFrame(
        [("a b", "a b")], "cand string, ref string"
    )
    assert corpus_bleu(short).collect()[0].bleu_micro == 0


def test_corpus_bleu_validation(spark):
    from nebula_importer_spark.operators.metrics import corpus_bleu

    df = spark.createDataFrame([("a", "b")], "cand string, ref string")
    with pytest.raises(ValueError, match="max_n"):
        corpus_bleu(df, max_n=0)
    with pytest.raises(ValueError, match="not in input"):
        corpus_bleu(df, cand_col="zz")


def test_mixed_language_profile(spark):
    from nebula_importer_spark.operators.text import mixed_language_profile

    en = "the cat and the dog went to the house in the morning and it was for"
    de = "der hund und die katze ist nicht mit ein auf der und das ist auf"
    rows = [
        (1, en + " " + en),            # 2+ chunks, all en
        (2, en + " " + de + " " + de), # mixed: en + de chunks, de majority
        (3, ""),                       # no tokens → no row
        (4, "zz qq ww"),               # one 'und' chunk
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_chunks, r.n_langs, r.major_lang, r.major_ppm, r.is_mixed)
        for r in mixed_language_profile(df, chunk_tokens=16).collect()
    }
    assert 3 not in got
    assert got[1][1] == 1 and got[1][2] == "en" and got[1][4] is False
    assert got[1][3] == 10**6
    assert got[2][4] is True and got[2][1] >= 2
    assert got[4] == (1, 1, "und", 10**6, False)
    # majority tie → lexicographically smallest language
    tie = spark.createDataFrame(
        [(9, en + " " + de)], "doc_id long, text string"
    )
    r = mixed_language_profile(tie, chunk_tokens=16).collect()[0]
    if r.n_langs == 2 and r.major_ppm == 500_000:
        assert r.major_lang == "de"  # de < en lexicographically

    import pytest

    with pytest.raises(ValueError, match="chunk_tokens"):
        mixed_language_profile(df, chunk_tokens=0)
