"""rrf_fuse — Reciprocal Rank Fusion over bounded candidate lists.

Exercises the single surviving rrf_fuse API (operators/search.py):
(query_col?, id_col, n_systems, rrf_micro, best_rank) with integer
RRF_MICRO div (k + rank) contributions and the enforced max_rows
pre-truncate contract.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from nebula_importer_spark.operators.search import RRF_MICRO, bm25_scores, rrf_fuse


def _ref_rrf(rankings, k=60):
    """Independent Python model: rank by (score desc, id asc) per system,
    integer floor-div micro-unit contributions."""
    agg = {}
    for ranking in rankings:
        order = sorted(ranking, key=lambda t: (-t[1], t[0]))
        for rank, (i, _) in enumerate(order, start=1):
            n, s, best = agg.get(i, (0, 0, None))
            agg[i] = (
                n + 1,
                s + RRF_MICRO // (k + rank),
                rank if best is None else min(best, rank),
            )
    return sorted((i, n, s, b) for i, (n, s, b) in agg.items())


def _run(spark, rankings, **kw):
    dfs = [spark.createDataFrame(r, ["doc_id", "score"]) for r in rankings]
    rows = rrf_fuse(dfs, **kw).collect()
    return sorted(
        (r["doc_id"], r["n_systems"], r["rrf_micro"], r["best_rank"])
        for r in rows
    )


def test_two_legs_hand_case(spark):
    lex = [(1, 9.0), (2, 5.0), (3, 1.0)]
    sem = [(2, 0.99), (4, 0.80)]
    got = _run(spark, [lex, sem])
    assert got == _ref_rrf([lex, sem])
    by_id = {i: (n, s, b) for i, n, s, b in got}
    # doc 2 appears in both systems (ranks 2 and 1)
    assert by_id[2] == (2, RRF_MICRO // 62 + RRF_MICRO // 61, 1)
    assert by_id[4] == (1, RRF_MICRO // 62, 2)


def test_tie_breaks_to_min_id(spark):
    ranking = [(7, 1.0), (3, 1.0), (5, 1.0)]
    got = _run(spark, [ranking, ranking])
    assert got == _ref_rrf([ranking, ranking])
    assert [(i, b) for i, _, _, b in got] == [(3, 1), (5, 2), (7, 3)]


def test_three_legs_exact_integer(spark):
    rng = random.Random(11)
    rankings = [
        [(i, float(rng.randint(0, 50))) for i in rng.sample(range(30), 12)]
        for _ in range(3)
    ]
    for k in (1, 60):
        assert _run(spark, rankings, k=k) == _ref_rrf(rankings, k=k)


def test_validation(spark):
    df = spark.createDataFrame([(1, 1.0)], ["doc_id", "score"])
    with pytest.raises(ValueError, match="at least two"):
        rrf_fuse([])
    with pytest.raises(ValueError, match="at least two"):
        rrf_fuse([df])
    with pytest.raises(ValueError, match="k must be"):
        rrf_fuse([df, df], k=0)
    with pytest.raises(ValueError, match="max_rows"):
        rrf_fuse([df, df], max_rows=0)


def test_max_rows_guard_enforced(spark):
    """The pre-truncate contract raises at execution time when a global
    (no query_col) ranking exceeds max_rows — and passes exactly at the
    boundary."""
    from pyspark.errors import PySparkException

    wide = spark.range(0, 11).select(
        F.col("id").alias("doc_id"), (F.lit(1000) - F.col("id")).alias("score")
    )
    ok = rrf_fuse([wide, wide], max_rows=11)
    assert ok.count() == 11
    bad = rrf_fuse([wide, wide], max_rows=10)
    with pytest.raises(PySparkException, match="pre-truncate"):
        bad.collect()
    # max_rows=None disables the guard entirely
    assert rrf_fuse([wide, wide], max_rows=None).count() == 11


def test_hybrid_bm25_leg_end_to_end(spark):
    docs = spark.createDataFrame(
        [
            (1, "spark merges fast tables"),
            (2, "vector search with spark"),
            (3, "unrelated prose about cooking"),
        ],
        ["doc_id", "text"],
    )
    lex = bm25_scores(docs, ["spark", "vector"]).orderBy(
        "score", ascending=False
    ).limit(2)
    sem = spark.createDataFrame([(3, 0.9), (2, 0.8)], ["doc_id", "score"])
    out = {r["doc_id"]: r for r in rrf_fuse([lex, sem]).collect()}
    assert set(out) <= {1, 2, 3} and 2 in out
    assert out[2]["n_systems"] == 2


def test_rrf_fuse_exact_values_and_ties(spark):
    r1 = spark.createDataFrame(
        [(1, 9.0), (2, 8.0), (3, 7.0)], "doc_id long, score double"
    )
    r2 = spark.createDataFrame(
        [(3, 0.9), (1, 0.5), (4, 0.4)], "doc_id long, score double"
    )
    got = {
        r.doc_id: (r.n_systems, r.rrf_micro, r.best_rank)
        for r in rrf_fuse([r1, r2], k=60).collect()
    }
    assert got[1] == (2, 10**6 // 61 + 10**6 // 62, 1)
    assert got[3] == (2, 10**6 // 63 + 10**6 // 61, 1)
    assert got[2] == (1, 10**6 // 62, 2)
    assert got[4] == (1, 10**6 // 63, 3)
    # tied scores rank by id ascending — deterministic
    tie = spark.createDataFrame(
        [(7, 1.0), (5, 1.0)], "doc_id long, score double"
    )
    t = {r.doc_id: r.best_rank for r in rrf_fuse([tie, tie]).collect()}
    assert t == {5: 1, 7: 2}


def test_rrf_fuse_per_query_and_validation(spark):
    a = spark.createDataFrame(
        [("q1", 1, 2.0), ("q1", 2, 1.0), ("q2", 1, 5.0)],
        "q string, doc_id long, score double",
    )
    b = spark.createDataFrame(
        [("q1", 2, 9.0), ("q2", 3, 1.0)],
        "q string, doc_id long, score double",
    )
    got = {
        (r.q, r.doc_id): r.rrf_micro
        for r in rrf_fuse([a, b], query_col="q", k=60).collect()
    }
    # q1 doc2: rank 2 in a, rank 1 in b
    assert got[("q1", 2)] == 10**6 // 62 + 10**6 // 61
    assert got[("q2", 3)] == 10**6 // 61
    with pytest.raises(ValueError, match="at least two"):
        rrf_fuse([a])
    with pytest.raises(ValueError, match="k must be"):
        rrf_fuse([a, b], k=0)
    with pytest.raises(ValueError, match="not in ranking"):
        rrf_fuse([a, b.drop("score")])
