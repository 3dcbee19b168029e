"""Randomized cross-checks: the round-3 corpus-QA operators vs pure-Python
references over one batched DataFrame (seeded — deterministic; a single
Spark round-trip per test keeps the suite fast)."""

from __future__ import annotations

import math
import random
import re

import pytest
from pyspark.sql import functions as F

_TOK = re.compile(r"[^\t\n\f\r ]+")

_VOCAB = [
    "the", "a", "and", "tok", "x!", "y,z", "...", "merge", "spark",
    '"q"', "a&&b", "\\", "não", "naïve", "0x1f", "-3",
]


def _texts(n: int = 250) -> list[str | None]:
    rng = random.Random(42)
    out: list[str | None] = [
        " ".join(rng.choices(_VOCAB, k=rng.randint(0, 40))) for _ in range(n)
    ]
    out += ["", " ", "\t\n", "a  b", None, "solo"]
    return out


@pytest.fixture(scope="module")
def rand_docs(spark):
    rows = [(i, t) for i, t in enumerate(_texts())]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_dup_token_fraction_random(spark, rand_docs):
    from nebula_importer_spark.operators.text import dup_token_fraction

    got = {
        r.doc_id: r.f
        for r in rand_docs.select(
            "doc_id", dup_token_fraction("text").alias("f")
        ).collect()
    }
    for i, t in enumerate(_texts()):
        toks = _TOK.findall(t or "")
        want = 0.0 if not toks else (len(toks) - len(set(toks))) / len(toks)
        assert got[i] == pytest.approx(want), (i, t)


def test_top_ngram_stats_random(spark, rand_docs):
    from nebula_importer_spark.operators.text import top_ngram_stats

    got = {r.doc_id: r for r in top_ngram_stats(rand_docs, n=2).collect()}
    for i, t in enumerate(_texts()):
        toks = _TOK.findall(t or "")
        grams = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        if not grams:
            assert i not in got
            continue
        counts: dict[str, int] = {}
        for g in grams:
            counts[g] = counts.get(g, 0) + 1
        best = max(counts, key=lambda g: (counts[g], g))  # count, then max gram
        r = got[i]
        assert (r.top_gram, r.top_n) == (best, counts[best]), (i, t)
        assert r.top_gram_char_frac == pytest.approx(
            counts[best] * len(best) / max(len(t or ""), 1)
        )


def test_bm25_scores_random(spark, rand_docs):
    from nebula_importer_spark.operators.search import bm25_scores

    terms = ["the", "merge", "spark"]
    texts = _texts()
    tok_lists = [[w.lower() for w in _TOK.findall(t or "")] for t in texts]
    # \b<term>\b on lowered text == counting exact lowered tokens here only
    # because every vocab term is fully word-charactered; punctuation vocab
    # entries ("x!", '"q"') never equal a query term.
    n = len(texts)
    dls = [len(ts) for ts in tok_lists]
    avgdl = sum(dls) / n
    tfs = [{t: ts.count(t) for t in terms} for ts in tok_lists]
    dfs = {t: sum(1 for tf in tfs if tf[t] > 0) for t in terms}

    def score(i: int) -> float:
        s = 0.0
        for t in terms:
            tf = tfs[i][t]
            idf = math.log(1.0 + (n - dfs[t] + 0.5) / (dfs[t] + 0.5))
            s += idf * tf * 2.2 / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dls[i] / avgdl))
        return s

    got = {r.doc_id: r.score for r in bm25_scores(rand_docs, terms).collect()}
    for i in range(len(texts)):
        want = score(i)
        if want > 0:
            assert got[i] == pytest.approx(want), i
        else:
            assert i not in got


def test_ngram_overlap_random(spark, rand_docs):
    from nebula_importer_spark.operators.decontaminate import ngram_overlap

    texts = _texts()
    ev = rand_docs.filter(F.col("doc_id") % 25 == 0).select(
        F.col("doc_id").alias("eval_id"), "text"
    )
    co = rand_docs.filter(F.col("doc_id") % 25 != 0)
    got = {
        (r.doc_id, r.eval_id): r.n_overlap
        for r in ngram_overlap(co, ev, n=3).collect()
    }

    def grams(t: str | None) -> set[str]:
        toks = _TOK.findall(t or "")
        return {" ".join(toks[j : j + 3]) for j in range(len(toks) - 2)}

    want = {}
    for i, t in enumerate(texts):
        if i % 25 == 0:
            continue
        for e, te in enumerate(texts):
            if e % 25 != 0:
                continue
            ov = len(grams(t) & grams(te))
            if ov:
                want[(i, e)] = ov
    assert got == want
