"""MMR diverse selection (operators/selection.py) vs an independent
pure-Python greedy reference, plus parameter edge cases."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from nebula_importer_spark.operators.selection import MICRO, mmr_topk


def _make_frames(spark, n_docs=30, n_queries=3, dim=8, seed=7):
    rng = random.Random(seed)
    docs = [
        (i, [rng.uniform(-1.0, 1.0) for _ in range(dim)])
        for i in range(n_docs)
    ]
    corpus = spark.createDataFrame(docs, "vec_id long, embedding array<double>")
    queries = spark.createDataFrame(
        [(1000 + i, [rng.uniform(-1.0, 1.0) for _ in range(dim)]) for i in range(n_queries)],
        "query_id long, query_vec array<double>",
    )
    return docs, queries, corpus


def _py_reference(docs, qrows, k, pool, lam6):
    """Independent greedy MMR: sequential-fold cosine, micro-unit ints."""

    def cos6(a, b):
        dot = 0.0
        for x, y in zip(a, b):
            dot += x * y
        na = nb = 0.0
        for x in a:
            na += x * x
        for y in b:
            nb += y * y
        return round((dot / (na**0.5 * nb**0.5)) * MICRO)

    out = []
    for qid, qv in qrows:
        rel = {i: cos6(qv, v) for i, v in docs if i != qid}
        ranked = sorted(rel, key=lambda d: (-rel[d], d))[:pool]
        sims = {
            (a, b): cos6(dict(docs)[a], dict(docs)[b])
            for a in ranked
            for b in ranked
            if a != b
        }
        picked = []
        for step in range(1, min(k, len(ranked)) + 1):
            best = None
            for d in ranked:
                if d in picked:
                    continue
                if step == 1:
                    sc = lam6 * rel[d]
                else:
                    sc = lam6 * rel[d] - (MICRO - lam6) * max(
                        sims[(d, p)] for p in picked
                    )
                if best is None or sc > best[1] or (sc == best[1] and d < best[0]):
                    best = (d, sc)
            picked.append(best[0])
            out.append((qid, step, best[0], best[1]))
    return sorted(out)


@pytest.mark.parametrize("lam6", [700_000, MICRO])
def test_mmr_matches_reference(spark, lam6):
    docs, queries, corpus = _make_frames(spark)
    got = sorted(
        tuple(r)
        for r in mmr_topk(corpus, queries, k=5, pool=10, lam6=lam6).collect()
    )
    qrows = [(r["query_id"], r["query_vec"]) for r in queries.collect()]
    want = _py_reference(docs, qrows, k=5, pool=10, lam6=lam6)
    assert got == want


def test_mmr_pure_relevance_equals_topk_order(spark):
    """lam6=MICRO degenerates to plain relevance ranking."""
    docs, queries, corpus = _make_frames(spark, n_queries=1)
    rows = mmr_topk(corpus, queries, k=4, pool=10, lam6=MICRO).collect()
    by_step = sorted(rows, key=lambda r: r["step"])
    scores = [r["mmr_scaled"] for r in by_step]
    assert scores == sorted(scores, reverse=True)


def test_mmr_k_exceeds_pool(spark):
    docs, queries, corpus = _make_frames(spark, n_docs=3, n_queries=1)
    rows = mmr_topk(corpus, queries, k=10, pool=2).collect()
    assert len(rows) == 2  # capped at pool size


def test_mmr_singleton_pool(spark):
    docs, queries, corpus = _make_frames(spark, n_docs=1, n_queries=1)
    rows = mmr_topk(corpus, queries, k=3, pool=5).collect()
    assert len(rows) == 1 and rows[0]["step"] == 1


def test_mmr_diversity_actually_fires(spark):
    """A near-duplicate of the top pick must lose to a diverse item."""
    base = [1.0, 0.0, 0.0, 0.0]
    near = [0.999, 0.01, 0.0, 0.0]
    diverse = [0.5, 0.8, 0.0, 0.0]
    corpus = spark.createDataFrame(
        [(0, base), (1, near), (2, diverse)],
        "vec_id long, embedding array<double>",
    )
    # query must differ from doc 0's vector: if they were equal, every
    # candidate's relevance would equal its similarity to the first pick
    # and the diversity margin would vanish identically
    queries = spark.createDataFrame(
        [(100, [1.0, 0.1, 0.0, 0.0])], "query_id long, query_vec array<double>"
    )
    rows = {r["step"]: r["doc"] for r in mmr_topk(corpus, queries, k=2, pool=3, lam6=500_000).collect()}
    # step 1: doc 1 is (barely) the most relevant; step 2: doc 0 is a
    # near-duplicate of the pick, so the diverse doc 2 must win despite
    # its much lower relevance
    assert rows[1] == 1 and rows[2] == 2


def test_mmr_rejects_bad_params(spark):
    docs, queries, corpus = _make_frames(spark, n_docs=2, n_queries=1)
    with pytest.raises(ValueError):
        mmr_topk(corpus, queries, lam6=MICRO + 1)
    with pytest.raises(ValueError):
        mmr_topk(corpus, queries, k=0)


# ---------------------------------------------------------------- pq_topk


def _pq_vectors():
    import numpy as np

    rng = np.random.RandomState(11)
    anchors = rng.uniform(-1, 1, size=(8, 16))
    rows = []
    for i in range(120):
        v = anchors[i % 8] + rng.uniform(-0.05, 0.05, 16)
        rows.append((i, [float(x) for x in v]))
    return rows


def test_pq_exact_when_corpus_is_codebook(spark):
    from pyspark.sql import functions as F

    from nebula_importer_spark.operators.similarity import pq_topk, quantize_vec

    rows = _pq_vectors()[:10]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = spark.createDataFrame(
        rows[:2], "query_id long, query_vec array<float>"
    )
    out = pq_topk(corpus, queries, k=1, m=4, n_codes=16)
    got = {r.query_id: (r.neighbor_id, r.adc_dist) for r in out.collect()}
    # every corpus vector IS a codebook entry: self-encoding is lossless,
    # so the query's own vector is its nearest neighbor at distance 0
    assert got[0] == (0, 0) and got[1] == (1, 0)


def test_pq_recall_on_clustered_corpus(spark):
    from nebula_importer_spark.operators.similarity import (
        brute_force_topk,
        pq_topk,
    )

    rows = _pq_vectors()
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = spark.createDataFrame(
        [(i, v) for i, v in rows[:5]], "query_id long, query_vec array<float>"
    )
    approx = pq_topk(corpus, queries, k=10, m=4, n_codes=16)
    exact = brute_force_topk(corpus, queries, k=10)
    a = {}
    for r in approx.collect():
        a.setdefault(r.query_id, set()).add(r.neighbor_id)
    e = {}
    for r in exact.collect():
        e.setdefault(r.query_id, set()).add(r.neighbor_id)
    recalls = [len(a[q] & e[q]) / len(e[q]) for q in e]
    assert sum(recalls) / len(recalls) >= 0.5, recalls


def test_pq_deterministic_and_validated(spark):
    import pytest

    from nebula_importer_spark.operators.similarity import pq_topk

    rows = _pq_vectors()[:30]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = spark.createDataFrame(
        rows[:2], "query_id long, query_vec array<float>"
    )
    r1 = sorted(map(tuple, pq_topk(corpus, queries, k=3).collect()))
    r2 = sorted(map(tuple, pq_topk(corpus, queries, k=3).collect()))
    assert r1 == r2
    with pytest.raises(ValueError):
        pq_topk(corpus, queries, k=3, m=5)  # 5 does not divide 16
    with pytest.raises(ValueError):
        pq_topk(corpus, queries, k=0)
    with pytest.raises(ValueError):
        pq_topk(corpus.select("vec_id"), queries, k=1)


def test_embedding_correlation_matches_numpy_on_quantized(spark):
    """Exact int64 sufficient statistics == numpy's on the SAME
    quantized values; perfect correlation / anti-correlation / dead
    dimension behave by definition."""
    import math
    import random

    from nebula_importer_spark.operators.similarity import (
        embedding_correlation,
    )

    rng = random.Random(3)
    rows = []
    for _ in range(200):
        a = rng.uniform(-1, 1)
        b = rng.uniform(-1, 1)
        # dims: [a, 2a (r=1), -a (r=-1), const (dead), independent b]
        rows.append(([a, 2 * a, -a, 0.5, b],))
    df = spark.createDataFrame(rows, "embedding array<float>")
    got = {(r.i, r.j): r for r in
           embedding_correlation(df, dim=5, quant=1000).collect()}
    assert len(got) == 15  # upper triangle of 5x5

    # python replica on the same floor-quantized values
    import numpy as np

    q = np.array([
        [math.floor(float(np.float32(v)) * 1000) for v in row[0]]
        for row in rows
    ], dtype=np.int64)
    n = q.shape[0]
    for (i, j), r in got.items():
        qi, qj = q[:, i - 1], q[:, j - 1]
        assert r.n == n
        assert r.sx == int(qi.sum()) and r.sy == int(qj.sum())
        assert r.sxy == int((qi * qj).sum())
    # r(1,2)=1 within quantization, r(1,3)=-1, dead dim 4 -> NULL
    assert got[(1, 2)].corr > 0.999
    assert got[(1, 3)].corr < -0.999
    assert got[(4, 4)].corr is None and got[(1, 4)].corr is None
    assert abs(got[(1, 5)].corr) < 0.2  # independent


def test_embedding_correlation_validation(spark):
    import pytest

    from nebula_importer_spark.operators.similarity import (
        embedding_correlation,
    )

    df = spark.createDataFrame([([1.0, 2.0],)], "embedding array<float>")
    with pytest.raises(ValueError, match="dim"):
        embedding_correlation(df, dim=0)
    with pytest.raises(ValueError, match="not in input"):
        embedding_correlation(df, "zz", dim=2)
    # wrong-length vectors are filtered, not errors
    assert embedding_correlation(df, dim=3).count() == 0


def test_kcenter_select_matches_python_greedy(spark):
    import random

    from nebula_importer_spark.operators.similarity import kcenter_select

    rng = random.Random(9)
    pts = [(i, [rng.uniform(-1, 1) for _ in range(4)]) for i in range(60)]
    df = spark.createDataFrame(pts, "vec_id long, embedding array<float>")
    got = [(r.rank, r.vec_id, r.dist_sq)
           for r in kcenter_select(
               df, "vec_id", "embedding", k=6, dim=4, quant=1000
           ).orderBy("rank").collect()]

    # python replica on the same float32-rounded, milli-quantized values
    import math

    import numpy as np

    q = {i: [math.floor(float(np.float32(v)) * 1000) for v in vec]
         for i, vec in pts}
    sel = [min(q)]
    dists = {}
    want = [(1, sel[0], None)]
    for rank in range(2, 7):
        c = q[sel[-1]]
        for i in q:
            if i in sel:
                continue
            d = sum((a - b) ** 2 for a, b in zip(q[i], c))
            dists[i] = min(dists.get(i, d), d)
        far = max(
            (i for i in dists if i not in sel),
            key=lambda i: (dists[i], -i),
        )
        want.append((rank, far, dists[far]))
        sel.append(far)
    assert got == want
    # farthest-first: selection distances are non-increasing
    ds = [d for _, _, d in got[1:]]
    assert ds == sorted(ds, reverse=True)


def test_kcenter_select_edges(spark):
    import pytest

    from nebula_importer_spark.operators.similarity import kcenter_select

    df = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [1.0, 1.0]), (3, None)],
        "vec_id long, embedding array<float>",
    )
    # k exceeds population: stops at 2 (null vector filtered)
    got = kcenter_select(df, "vec_id", "embedding", k=10, dim=2).collect()
    assert [(r.rank, r.vec_id) for r in got] == [(1, 1), (2, 2)]
    # empty input
    assert kcenter_select(
        df.filter("vec_id < 0"), "vec_id", "embedding", k=3, dim=2
    ).count() == 0
    with pytest.raises(ValueError, match="k must"):
        kcenter_select(df, "vec_id", "embedding", k=0, dim=2)


# --- pareto_skyline --------------------------------------------------------

from nebula_importer_spark.operators.selection import pareto_skyline  # noqa: E402


def test_skyline_hand_case(spark):
    # minimize price, maximize size
    rows = [
        (1, 10.0, 5),   # frontier
        (2, 10.0, 4),   # dominated by 1 (same price, smaller)
        (3, 8.0, 3),    # frontier (cheaper)
        (4, 12.0, 9),   # frontier (bigger)
        (5, 12.0, 9),   # full tie with 4: both kept
        (6, 13.0, 9),   # dominated by 4 (same size, dearer)
    ]
    df = spark.createDataFrame(rows, "id long, price double, size long")
    got = sorted(
        (r.id, r.price, r.size)
        for r in pareto_skyline(
            df, dims=[("price", "min"), ("size", "max")]
        ).collect()
    )
    assert got == [(1, 10.0, 5), (3, 8.0, 3), (4, 12.0, 9), (5, 12.0, 9)]


def test_skyline_null_dims_excluded(spark):
    df = spark.createDataFrame(
        [(1, 1.0, 1), (2, None, 99), (3, 0.5, None)],
        "id long, price double, size long",
    )
    got = sorted(
        r.id
        for r in pareto_skyline(
            df, dims=[("price", "min"), ("size", "max")]
        ).collect()
    )
    assert got == [1]


def test_skyline_three_dims_randomized_vs_model(spark):
    import random

    rng = random.Random(4242)
    rows = [
        (i, rng.randint(0, 9), rng.randint(0, 9), rng.randint(0, 9))
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "id long, a long, b long, c long")
    dims = [("a", "min"), ("b", "max"), ("c", "min")]
    got = sorted(
        (r.id, r.a, r.b, r.c)
        for r in pareto_skyline(df.repartition(7), dims=dims).collect()
    )
    def dom(b, a):
        (_, b1, b2, b3), (_, a1, a2, a3) = b, a
        le = b1 <= a1 and b2 >= a2 and b3 <= a3
        lt = b1 < a1 or b2 > a2 or b3 < a3
        return le and lt
    want = sorted(
        r for r in rows if not any(dom(s, r) for s in rows)
    )
    assert got == want


def test_skyline_tiny_chunk_matches_model(spark):
    import random

    rng = random.Random(7)
    rows = [(i, rng.randint(0, 5), rng.randint(0, 5)) for i in range(100)]
    df = spark.createDataFrame(rows, "id long, a long, b long")

    def dom(b, a):
        return b[1] <= a[1] and b[2] <= a[2] and (b[1] < a[1] or b[2] < a[2])

    want = sorted(r for r in rows if not any(dom(s, r) for s in rows))
    got = sorted(
        (r.id, r.a, r.b)
        for r in pareto_skyline(
            df.repartition(5),
            dims=[("a", "min"), ("b", "min")],
            chunk=3,
        ).collect()
    )
    assert got == want


def test_skyline_plan_is_broadcast_nlj_anti(spark):
    df = spark.createDataFrame(
        [(1, 1.0, 1)], "id long, price double, size long"
    )
    out = pareto_skyline(df, dims=[("price", "min"), ("size", "max")])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan and "LeftAnti" in plan


def test_skyline_validation(spark):
    df = spark.createDataFrame([(1, 1.0, 1)], "id long, a double, b long")
    with pytest.raises(ValueError):
        pareto_skyline(df, dims=[("a", "min")])
    with pytest.raises(ValueError):
        pareto_skyline(df, dims=[("a", "min"), ("nope", "max")])
    with pytest.raises(ValueError):
        pareto_skyline(df, dims=[("a", "min"), ("b", "best")])
    with pytest.raises(ValueError):
        pareto_skyline(df, dims=[("a", "min"), ("a", "max")])
    with pytest.raises(ValueError):
        pareto_skyline(df, dims=[("a", "min"), ("b", "max")], chunk=0)


# --- max_coverage_select ---------------------------------------------------

from nebula_importer_spark.operators.selection import (  # noqa: E402
    max_coverage_select,
)


def _greedy_model(docs, k, n):
    """Python greedy max-coverage on word n-grams (exact gram strings)."""
    def grams(text):
        toks = [t for t in text.split() if t]
        return {
            " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
        }

    g = {i: grams(t) for i, t in docs}
    covered, out, total = set(), [], 0
    for rank in range(1, k + 1):
        best = None
        for i in sorted(g):
            gain = len(g[i] - covered)
            if best is None or gain > best[1]:
                best = (i, gain)
        if best is None or best[1] == 0:
            break
        total += best[1]
        out.append((rank, best[0], best[1], total))
        covered |= g.pop(best[0])
    return out


def test_max_coverage_hand_case(spark):
    docs = [
        (1, "a b c d"),        # grams: {a b, b c, c d}
        (2, "a b c"),          # subset of 1
        (3, "x y z w"),        # disjoint
        (4, "c d e"),          # one new gram after 1
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = [tuple(r) for r in
           max_coverage_select(df, id_col="doc_id", text_col="text",
                               k=4, n=2).collect()]
    assert got == _greedy_model(docs, 4, 2)
    # doc 1 first (3 grams), doc 3 next (3 disjoint), doc 4 adds d e
    assert [g[1] for g in got][:3] == [1, 3, 4]


def test_max_coverage_stops_when_covered(spark):
    docs = [(1, "a b"), (2, "a b"), (3, "a b")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = [tuple(r) for r in
           max_coverage_select(df, id_col="doc_id", text_col="text",
                               k=3, n=2).collect()]
    # after doc 1 everything is covered: greedy ends, no 0-gain picks
    assert got == [(1, 1, 1, 1)]


def test_max_coverage_tie_breaks_min_id(spark):
    docs = [(5, "p q r"), (2, "x y z")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = [tuple(r) for r in
           max_coverage_select(df, id_col="doc_id", text_col="text",
                               k=2, n=2).collect()]
    assert [g[1] for g in got] == [2, 5]


def test_max_coverage_randomized_vs_model(spark):
    import random

    rng = random.Random(99)
    vocab = [f"w{i}" for i in range(30)]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 25))))
        for i in range(40)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = [tuple(r) for r in
           max_coverage_select(df.repartition(5), id_col="doc_id",
                               text_col="text", k=6, n=2).collect()]
    assert got == _greedy_model(docs, 6, 2)


def test_max_coverage_validation(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        max_coverage_select(df, id_col="doc_id", text_col="text", k=0)
    with pytest.raises(ValueError):
        max_coverage_select(df, id_col="doc_id", text_col="text", k=1, n=0)
    with pytest.raises(ValueError):
        max_coverage_select(df, id_col="nope", text_col="text", k=1)
