"""operators/metrics.py — exact distributed Mann-Whitney AUC."""

from __future__ import annotations

import random

import pytest

from nebula_importer_spark.operators.metrics import AUC_SCALE, exact_auc


def _auc_model(pairs: list[tuple[int, int]]) -> int:
    """Arbitrary-precision midrank AUC in pure Python (Fraction-exact)."""
    from fractions import Fraction

    scores = sorted({s for s, _ in pairs})
    below = {}
    tied = {}
    acc = 0
    for s in scores:
        n = sum(1 for x, _ in pairs if x == s)
        below[s] = acc
        tied[s] = n
        acc += n
    n_pos = sum(l for _, l in pairs)
    n_neg = len(pairs) - n_pos
    if n_pos == 0 or n_neg == 0:
        return None
    r = sum(
        Fraction(2 * below[s] + tied[s] + 1, 2) for s, l in pairs if l == 1
    )
    u = r - Fraction(n_pos * (n_pos + 1), 2)
    return (AUC_SCALE * u.numerator * 1) // (u.denominator * n_pos * n_neg)


def test_auc_perfect_and_reversed(spark):
    perfect = [(i, 1 if i >= 50 else 0) for i in range(100)]
    df = spark.createDataFrame(perfect, "score long, label int")
    assert exact_auc(df).collect()[0].auc_scaled == AUC_SCALE
    reverse = [(i, 1 if i < 50 else 0) for i in range(100)]
    df = spark.createDataFrame(reverse, "score long, label int")
    assert exact_auc(df).collect()[0].auc_scaled == 0


def test_auc_all_tied_is_half(spark):
    df = spark.createDataFrame(
        [(7, i % 2) for i in range(40)], "score long, label int"
    )
    assert exact_auc(df).collect()[0].auc_scaled == AUC_SCALE // 2


def test_auc_randomized_parity_with_ties(spark):
    rng = random.Random(42)
    for trial in range(3):
        pairs = [
            (rng.randint(-20, 20), rng.randint(0, 1)) for _ in range(500)
        ]
        df = spark.createDataFrame(pairs, "score long, label int")
        row = exact_auc(df, n_buckets=8).collect()[0]
        assert row.auc_scaled == _auc_model(pairs), trial
        assert row.n_pos == sum(l for _, l in pairs)
        assert row.n_scores == len({s for s, _ in pairs})


def test_auc_nulls_and_degenerate(spark):
    df = spark.createDataFrame(
        [(1, 1), (2, None), (None, 0), (3, 1)],
        "score long, label int",
    )
    row = exact_auc(df).collect()[0]
    assert row.n_null == 2 and row.n_pos == 2 and row.n_neg == 0
    assert row.auc_scaled is None  # no negatives: undefined, not 0.5


def test_auc_rejects_float_scores(spark):
    df = spark.createDataFrame([(1.0, 1)], "score double, label int")
    with pytest.raises(ValueError):
        exact_auc(df)
    with pytest.raises(ValueError):
        exact_auc(df, score_col="missing")


def test_auc_no_global_sort_in_plan(spark):
    df = spark.createDataFrame(
        [(i % 37, i % 2) for i in range(800)], "score long, label int"
    )
    plan = (
        exact_auc(df, n_buckets=16)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # rangepartitioning = a global sort exchange; the two-level prefix sum
    # must avoid it for the data-sized side (the <= n_buckets totals table
    # may sort — it is bucket-count-sized, not data-sized)
    assert "rangepartitioning(_s" not in plan


# ------------------------------------------------------------------ b_cubed


def _b3_model(rows):
    """Fraction-exact per-item B-cubed in pure Python."""
    from fractions import Fraction

    from nebula_importer_spark.operators.metrics import B3_SCALE

    rows = [(i, c, g) for i, c, g in rows if c is not None and g is not None]
    csz, gsz, cell = {}, {}, {}
    for _, c, g in rows:
        csz[c] = csz.get(c, 0) + 1
        gsz[g] = gsz.get(g, 0) + 1
        cell[(c, g)] = cell.get((c, g), 0) + 1
    n = len(rows)
    sp = sum(B3_SCALE * m * m // csz[c] for (c, g), m in cell.items())
    sr = sum(B3_SCALE * m * m // gsz[g] for (c, g), m in cell.items())
    p, r = sp // n, sr // n
    f1 = (2 * p * r) // (p + r) if p + r else None
    return p, r, f1


def test_b_cubed_perfect_clustering(spark):
    from nebula_importer_spark.operators.metrics import B3_SCALE, b_cubed

    rows = [(i, i % 5, i % 5) for i in range(50)]
    df = spark.createDataFrame(rows, "item long, cluster long, gold long")
    r = b_cubed(df).collect()[0]
    assert r.precision_s == B3_SCALE and r.recall_s == B3_SCALE
    assert r.f1_s == B3_SCALE and r.n_clusters == 5


def test_b_cubed_over_and_under_merge(spark):
    from nebula_importer_spark.operators.metrics import B3_SCALE, b_cubed

    # everything in one cluster vs 5 gold groups: recall 1, precision 1/5
    rows = [(i, 0, i % 5) for i in range(50)]
    df = spark.createDataFrame(rows, "item long, cluster long, gold long")
    r = b_cubed(df).collect()[0]
    assert r.recall_s == B3_SCALE and r.precision_s == B3_SCALE // 5
    # all-singleton clustering: precision 1, recall 1/10 (gold groups of 10)
    rows = [(i, i, i % 5) for i in range(50)]
    df = spark.createDataFrame(rows, "item long, cluster long, gold long")
    r = b_cubed(df).collect()[0]
    assert r.precision_s == B3_SCALE and r.recall_s == B3_SCALE // 10


def test_b_cubed_randomized_parity_and_nulls(spark):
    import random

    from nebula_importer_spark.operators.metrics import b_cubed

    rng = random.Random(3)
    rows = [
        (
            i,
            rng.randint(0, 6) if rng.random() > 0.05 else None,
            rng.randint(0, 4),
        )
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "item long, cluster long, gold long")
    r = b_cubed(df).collect()[0]
    p, rr, f1 = _b3_model(rows)
    assert (r.precision_s, r.recall_s, r.f1_s) == (p, rr, f1)
    assert r.n_null == sum(1 for _, c, g in rows if c is None or g is None)


def test_b_cubed_validation(spark):
    from nebula_importer_spark.operators.metrics import b_cubed

    df = spark.createDataFrame([(1, 1, 1)], "item long, cluster long, gold long")
    with pytest.raises(ValueError):
        b_cubed(df, cluster_col="missing")


# -------------------------------------------------------- retrieval_metrics


def _ret_model(ranked, truth, k):
    """Pure-Python twin of retrieval_metrics."""
    from nebula_importer_spark.operators.metrics import (
        RET_SCALE,
        ndcg_discounts,
    )

    disc = ndcg_discounts(k)
    prefix = [0]
    for d in disc:
        prefix.append(prefix[-1] + d)
    tset = {(q, d) for q, d in truth if q is not None and d is not None}
    nrel = {}
    for q, _ in tset:
        nrel[q] = nrel.get(q, 0) + 1
    out = {}
    qs = {q for q, _, _ in ranked}
    for q in qs:
        rows = [(r, d) for qq, d, r in ranked if qq == q and r <= k]
        hits = [(r, d) for r, d in rows if (q, d) in tset]
        nr = nrel.get(q, 0)
        dcg = sum(disc[r - 1] for r, _ in hits)
        idcg = prefix[min(nr, k)]
        out[q] = (
            len(rows),
            nr,
            len(hits),
            RET_SCALE * len(hits) // k,
            RET_SCALE * len(hits) // nr if nr else None,
            RET_SCALE * dcg // idcg if idcg else None,
        )
    return out


def test_retrieval_perfect_and_miss(spark):
    from nebula_importer_spark.operators.metrics import (
        RET_SCALE,
        retrieval_metrics,
    )

    ranked = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (2, 20, 1), (2, 21, 2)],
        "query_id long, doc_id long, rank long",
    )
    truth = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 99)], "query_id long, doc_id long"
    )
    r = {x.query_id: x for x in retrieval_metrics(ranked, truth, k=2).collect()}
    # query 1: both retrieved docs relevant, n_relevant=2 -> all metrics 1.0
    assert r[1].precision_ppm == RET_SCALE
    assert r[1].recall_ppm == RET_SCALE
    assert r[1].ndcg_ppm == RET_SCALE
    # query 2: zero hits but HAS a relevant doc -> exact zeros
    assert r[2].n_hits == 0 and r[2].recall_ppm == 0 and r[2].ndcg_ppm == 0


def test_retrieval_no_truth_is_null_not_zero(spark):
    from nebula_importer_spark.operators.metrics import retrieval_metrics

    ranked = spark.createDataFrame(
        [(5, 1, 1)], "query_id long, doc_id long, rank long"
    )
    truth = spark.createDataFrame([], "query_id long, doc_id long")
    r = retrieval_metrics(ranked, truth, k=3).collect()[0]
    assert r.recall_ppm is None and r.ndcg_ppm is None
    assert r.precision_ppm == 0


def test_retrieval_rank_order_matters_for_ndcg(spark):
    from nebula_importer_spark.operators.metrics import retrieval_metrics

    truth = spark.createDataFrame([(1, 10)], "query_id long, doc_id long")
    hit_first = spark.createDataFrame(
        [(1, 10, 1), (1, 99, 2)], "query_id long, doc_id long, rank long"
    )
    hit_last = spark.createDataFrame(
        [(1, 99, 1), (1, 10, 2)], "query_id long, doc_id long, rank long"
    )
    a = retrieval_metrics(hit_first, truth, k=2).collect()[0]
    b = retrieval_metrics(hit_last, truth, k=2).collect()[0]
    assert a.ndcg_ppm > b.ndcg_ppm
    # precision/recall are position-blind
    assert a.precision_ppm == b.precision_ppm and a.recall_ppm == b.recall_ppm


def test_retrieval_randomized_vs_model(spark):
    import random

    from nebula_importer_spark.operators.metrics import retrieval_metrics

    rng = random.Random(31)
    ranked = []
    for q in range(12):
        docs = rng.sample(range(100), 8)
        ranked += [(q, d, i + 1) for i, d in enumerate(docs)]
    truth = [(rng.randrange(12), rng.randrange(100)) for _ in range(80)]
    rdf = spark.createDataFrame(ranked, "query_id long, doc_id long, rank long")
    tdf = spark.createDataFrame(truth, "query_id long, doc_id long")
    for k in (3, 8):
        got = {
            r.query_id: (
                r.n_retrieved,
                r.n_relevant,
                r.n_hits,
                r.precision_ppm,
                r.recall_ppm,
                r.ndcg_ppm,
            )
            for r in retrieval_metrics(rdf, tdf, k=k).collect()
        }
        assert got == _ret_model(ranked, truth, k)


def test_retrieval_validation(spark):
    from nebula_importer_spark.operators.metrics import retrieval_metrics

    rdf = spark.createDataFrame([(1, 1, 1)], "query_id long, doc_id long, rank long")
    tdf = spark.createDataFrame([(1, 1)], "query_id long, doc_id long")
    with pytest.raises(ValueError, match="k must"):
        retrieval_metrics(rdf, tdf, k=0)
    with pytest.raises(ValueError, match="not in ranked"):
        retrieval_metrics(rdf.drop("rank"), tdf, k=2)
    with pytest.raises(ValueError, match="not in truth"):
        retrieval_metrics(rdf, tdf.drop("doc_id"), k=2)


# ------------------------------------------------------------- cohens_kappa


def _kappa_model(pairs):
    """Fraction-exact Cohen's kappa in pure Python (truncation-toward-zero
    quotients, matching the operator's explicit sign handling)."""
    from nebula_importer_spark.operators.metrics import KAPPA_SCALE

    pairs = [(a, b) for a, b in pairs if a is not None and b is not None]
    n = len(pairs)
    agree = sum(1 for a, b in pairs if a == b)
    ra, cb = {}, {}
    for a, b in pairs:
        ra[a] = ra.get(a, 0) + 1
        cb[b] = cb.get(b, 0) + 1
    pe = sum(ra[v] * cb.get(v, 0) for v in ra)
    po_s = KAPPA_SCALE * agree // n if n else None
    pe_s = KAPPA_SCALE * pe // (n * n) if n else None
    den = n * n - pe
    if den <= 0:
        kappa = None
    else:
        num = n * agree - pe
        mag = KAPPA_SCALE * abs(num) // den
        kappa = mag if num >= 0 else -mag
    return n, agree, po_s, pe_s, kappa


def test_kappa_perfect_and_independent(spark):
    from nebula_importer_spark.operators.metrics import KAPPA_SCALE, cohens_kappa

    perfect = spark.createDataFrame(
        [(i, "x" if i % 2 else "y", "x" if i % 2 else "y") for i in range(40)],
        "i long, a string, b string",
    )
    r = cohens_kappa(perfect, "a", "b").collect()[0]
    assert r.kappa_s == KAPPA_SCALE and r.po_s == KAPPA_SCALE

    # b constant while a varies: agreement equals chance -> kappa 0
    const_b = spark.createDataFrame(
        [(i, "x" if i % 2 else "y", "x") for i in range(40)],
        "i long, a string, b string",
    )
    r = cohens_kappa(const_b, "a", "b").collect()[0]
    assert r.kappa_s == 0


def test_kappa_negative_worse_than_chance(spark):
    from nebula_importer_spark.operators.metrics import cohens_kappa

    # perfectly ANTI-correlated binary labels -> kappa == -1e12
    df = spark.createDataFrame(
        [(i, i % 2, 1 - i % 2) for i in range(50)], "i long, a int, b int"
    )
    r = cohens_kappa(df, "a", "b").collect()[0]
    got = _kappa_model([(i % 2, 1 - i % 2) for i in range(50)])
    assert r.kappa_s == got[4] and r.kappa_s < 0


def test_kappa_degenerate_identical_constant_is_null(spark):
    from nebula_importer_spark.operators.metrics import cohens_kappa

    df = spark.createDataFrame([(i, "x", "x") for i in range(9)], "i long, a string, b string")
    r = cohens_kappa(df, "a", "b").collect()[0]
    assert r.kappa_s is None  # denominator 0: undefined, never a fake 1.0


def test_kappa_nulls_counted_not_scored(spark):
    from nebula_importer_spark.operators.metrics import cohens_kappa

    df = spark.createDataFrame(
        [(1, "x", "x"), (2, None, "x"), (3, "y", None)],
        "i long, a string, b string",
    )
    r = cohens_kappa(df, "a", "b").collect()[0]
    assert r.n_items == 1 and r.n_null == 2


def test_kappa_randomized_vs_model(spark):
    import random

    from nebula_importer_spark.operators.metrics import cohens_kappa

    rng = random.Random(47)
    pairs = [
        (rng.choice("abcd"), rng.choice("abc")) for _ in range(600)
    ]
    df = spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(pairs)],
        "i long, a string, b string",
    )
    r = cohens_kappa(df, "a", "b").collect()[0]
    n, agree, po, pe, kappa = _kappa_model(pairs)
    assert (r.n_items, r.n_agree, r.po_s, r.pe_s, r.kappa_s) == (
        n, agree, po, pe, kappa,
    )


def test_kappa_validation(spark):
    from nebula_importer_spark.operators.metrics import cohens_kappa

    df = spark.createDataFrame([(1, "x", "y")], "i long, a string, b string")
    with pytest.raises(ValueError, match="not in input"):
        cohens_kappa(df, "missing", "b")
    with pytest.raises(ValueError, match="must differ"):
        cohens_kappa(df, "a", "a")


# -------------------------------------------------------- calibration_report


def test_calibration_perfect_bins(spark):
    from nebula_importer_spark.operators.metrics import calibration_report

    # scores exactly match realized rates in two bins
    rows = []
    # bin 1 (scores ~150000): 20 rows, 3 positives, each score 150000
    rows += [(150_000, 1 if i < 3 else 0) for i in range(20)]
    # bin 9 (scores 950000): 10 rows, 9 positives but conf says 950000
    rows += [(950_000, 1 if i < 9 else 0) for i in range(10)]
    df = spark.createDataFrame(rows, "score long, label int")
    r = {x.bin: x for x in calibration_report(df, score_col="score", label_col="label").collect()}
    b1, b9 = r[1], r[9]
    assert (b1.n, b1.n_pos, b1.conf_s, b1.acc_s) == (20, 3, 150_000, 150_000)
    assert b1.gap_abs == 0
    # bin 9: claimed 950000, realized 900000 -> gap = |9500000 - 9000000|
    assert (b9.n, b9.n_pos, b9.conf_s, b9.acc_s) == (10, 9, 950_000, 900_000)
    assert b9.gap_abs == abs(10 * 950_000 - 1_000_000 * 9)


def test_calibration_null_bucket_and_edges(spark):
    from nebula_importer_spark.operators.metrics import calibration_report

    df = spark.createDataFrame(
        [(0, 0), (1_000_000, 1), (None, 1), (500_000, None)],
        "score long, label int",
    )
    r = {x.bin: x for x in calibration_report(df, score_col="score", label_col="label").collect()}
    assert r[-1].n == 2 and r[-1].conf_s is None and r[-1].gap_abs is None
    assert r[0].n == 1  # score 0 -> first bin
    assert r[9].n == 1  # score == scale clamps into the LAST bin


def test_calibration_randomized_vs_model(spark):
    import random

    from nebula_importer_spark.operators.metrics import calibration_report

    rng = random.Random(11)
    rows = [
        (rng.randrange(1_000_001), rng.randrange(2)) for _ in range(800)
    ]
    df = spark.createDataFrame(rows, "score long, label int")
    n_bins, scale = 10, 1_000_000
    model = {}
    for s, y in rows:
        b = min(n_bins - 1, s * n_bins // scale)
        n, np_, ss = model.get(b, (0, 0, 0))
        model[b] = (n + 1, np_ + y, ss + s)
    want = {
        b: (n, np_, ss // n, scale * np_ // n, abs(ss - scale * np_))
        for b, (n, np_, ss) in model.items()
    }
    got = {
        r.bin: (r.n, r.n_pos, r.conf_s, r.acc_s, r.gap_abs)
        for r in calibration_report(df, score_col="score", label_col="label").collect()
    }
    assert got == want
    # scalar ECE assembles from the terms with one floor division
    ece = sum(g[4] for g in want.values()) // len(rows)
    assert 0 <= ece <= scale


def test_calibration_validation(spark):
    from nebula_importer_spark.operators.metrics import calibration_report

    df = spark.createDataFrame([(0.5, 1)], "score double, label int")
    with pytest.raises(ValueError, match="must be integral"):
        calibration_report(df, score_col="score", label_col="label")
    good = spark.createDataFrame([(5, 1)], "score long, label int")
    with pytest.raises(ValueError, match="n_bins"):
        calibration_report(good, score_col="score", label_col="label", n_bins=0)
    with pytest.raises(ValueError, match="not in input"):
        calibration_report(good, score_col="missing", label_col="label")


def _py_bt(duels, n_rounds=6, scale=1_000_000):
    """Integer-recurrence model of bradley_terry (dicts, Python ints)."""
    from collections import defaultdict

    def tdiv(a, b):
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b > 0) else -q

    n = defaultdict(int)
    wi = defaultdict(int)
    for a, b, wa, wb in duels:
        n[(a, b)] += wa + wb
        n[(b, a)] += wa + wb
        wi[a] += wa
        wi[b] += wb
    n = {k: v for k, v in n.items() if v > 0}
    items = sorted({i for i, _ in n})
    wins = {i: wi[i] for i in items}
    nm = {i: sum(v for (a, _), v in n.items() if a == i) for i in items}
    w = {i: scale for i in items}
    for _ in range(n_rounds):
        d = defaultdict(int)
        for (i, j), nij in n.items():
            d[i] += tdiv(nij * 10**12, max(w[i] + w[j], 1))
        w = {
            i: tdiv(wins[i] * 10**12, d[i]) if d[i] > 0 else 0
            for i in items
        }
    tot = sum(w.values())
    return {
        i: {
            "n_wins": wins[i],
            "n_matches": nm[i],
            "w_micro": w[i],
            "score_ppm": tdiv(w[i] * 10**6, tot) if tot > 0 else None,
        }
        for i in items
    }


def test_bradley_terry_orders_by_strength(spark):
    from nebula_importer_spark.operators.metrics import bradley_terry

    # a beats b 9:1, b beats c 9:1, a beats c 9:1 — strict order a>b>c
    duels = [("a", "b", 9, 1), ("b", "c", 9, 1), ("a", "c", 9, 1)]
    df = spark.createDataFrame(
        duels, "item_a string, item_b string, wins_a long, wins_b long"
    )
    got = {r["item"]: r.asDict() for r in bradley_terry(df).collect()}
    assert got["a"]["w_micro"] > got["b"]["w_micro"] > got["c"]["w_micro"]
    assert got["a"]["n_wins"] == 18 and got["a"]["n_matches"] == 20
    expect = _py_bt(duels)
    for k, e in expect.items():
        for f, v in e.items():
            assert got[k][f] == v, (k, f, got[k][f], v)


def test_bradley_terry_symmetric_is_uniform(spark):
    from nebula_importer_spark.operators.metrics import bradley_terry

    duels = [("a", "b", 5, 5), ("b", "c", 5, 5), ("a", "c", 5, 5)]
    df = spark.createDataFrame(
        duels, "item_a string, item_b string, wins_a long, wins_b long"
    )
    rows = bradley_terry(df).collect()
    assert len({r["w_micro"] for r in rows}) == 1
    assert all(r["score_ppm"] == 333333 for r in rows)


def test_bradley_terry_never_wins_and_reversed_dupes(spark):
    from nebula_importer_spark.operators.metrics import bradley_terry

    # loser never wins -> strength 0; (b,a) row merges with (a,b)
    duels = [("a", "b", 3, 0), ("b", "a", 0, 2), ("a", "c", 1, 1)]
    df = spark.createDataFrame(
        duels, "item_a string, item_b string, wins_a long, wins_b long"
    )
    got = {r["item"]: r.asDict() for r in bradley_terry(df).collect()}
    assert got["b"]["w_micro"] == 0 and got["b"]["n_matches"] == 5
    assert got["a"]["n_wins"] == 6
    expect = _py_bt(duels)
    for k, e in expect.items():
        for f, v in e.items():
            assert got[k][f] == v, (k, f)


def test_bradley_terry_random_parity(spark):
    import random

    from nebula_importer_spark.operators.metrics import bradley_terry

    rng = random.Random(99)
    items = [f"i{x}" for x in range(8)]
    duels = []
    for _ in range(40):
        a, b = rng.sample(items, 2)
        duels.append((a, b, rng.randrange(0, 6), rng.randrange(0, 6)))
    df = spark.createDataFrame(
        duels, "item_a string, item_b string, wins_a long, wins_b long"
    ).repartition(5)
    got = {r["item"]: r.asDict() for r in bradley_terry(df).collect()}
    expect = _py_bt(duels)
    assert set(got) == set(expect)
    for k, e in expect.items():
        for f, v in e.items():
            assert got[k][f] == v, (k, f, got[k][f], v)


def test_bradley_terry_validation(spark):
    from nebula_importer_spark.operators.metrics import bradley_terry

    ok = spark.createDataFrame(
        [("a", "b", 1, 0)],
        "item_a string, item_b string, wins_a long, wins_b long",
    )
    with pytest.raises(ValueError, match="not in input"):
        bradley_terry(ok, item_a="zzz")
    with pytest.raises(ValueError, match="n_rounds"):
        bradley_terry(ok, n_rounds=0)
    with pytest.raises(ValueError, match="scale"):
        bradley_terry(ok, scale=0)
    self_duel = spark.createDataFrame(
        [("a", "a", 1, 0)],
        "item_a string, item_b string, wins_a long, wins_b long",
    )
    with pytest.raises(ValueError, match="distinct items"):
        bradley_terry(self_duel)
    neg = spark.createDataFrame(
        [("a", "b", -1, 0)],
        "item_a string, item_b string, wins_a long, wins_b long",
    )
    with pytest.raises(ValueError, match="wins >= 0"):
        bradley_terry(neg)


def _py_isotonic(pairs, n_cells, scale=10**6):
    """Reference: classic PAV with exact Fractions over the same cells,
    fit re-quantized exactly like the operator (10^18 scaled div, then
    div to micro)."""
    from fractions import Fraction

    pts = [(x, y) for x, y in pairs if x is not None and y is not None]
    if not pts:
        return []
    mn = min(x for x, _ in pts)
    mx = max(x for x, _ in pts)
    span = mx - mn + 1
    cells = {}
    for x, y in pts:
        c = (x - mn) * n_cells // span
        st = cells.setdefault(c, [0, 0, x, x])
        st[0] += 1
        st[1] += y
        st[2] = min(st[2], x)
        st[3] = max(st[3], x)
    order = sorted(cells)
    # PAV pooling
    blocks = [
        [cells[c][1], cells[c][0], [i]] for i, c in enumerate(order)
    ]
    i = 0
    merged = True
    while merged:
        merged = False
        j = 0
        while j + 1 < len(blocks):
            a, b = blocks[j], blocks[j + 1]
            if Fraction(a[0], a[1]) > Fraction(b[0], b[1]):
                blocks[j] = [a[0] + b[0], a[1] + b[1], a[2] + b[2]]
                del blocks[j + 1]
                merged = True
                if j > 0:
                    j -= 1
            else:
                j += 1
    out = []
    for s, n, idxs in blocks:
        scaled = (s * 10**18) // n  # s >= 0 here
        fitm = scaled // (10**18 // scale)
        for i in idxs:
            c = order[i]
            st = cells[c]
            out.append(
                (
                    i,
                    st[2],
                    st[3],
                    st[0],
                    (st[1] * scale) // st[0],
                    fitm,
                )
            )
    return sorted(out)


def test_isotonic_already_monotone_is_identity(spark):
    from nebula_importer_spark.operators.metrics import isotonic_calibration

    pairs = [(0, 0), (0, 0), (10, 0), (10, 1), (20, 1), (20, 1)]
    df = spark.createDataFrame(pairs, "s long, y long")
    rows = isotonic_calibration(
        df, score_col="s", y_col="y", n_cells=4
    ).collect()
    fits = [r.fit_micro for r in rows]
    means = [r.mean_micro for r in rows]
    assert fits == means == [0, 500000, 1000000]


def test_isotonic_pools_violators(spark):
    from nebula_importer_spark.operators.metrics import isotonic_calibration

    # middle cell dips: (1.0, 0.0, 1.0) -> pooled middle pair or overall
    pairs = [(0, 1), (10, 0), (20, 1)]
    df = spark.createDataFrame(pairs, "s long, y long")
    rows = isotonic_calibration(
        df, score_col="s", y_col="y", n_cells=3
    ).collect()
    got = [(r.cell, r.n_rows, r.mean_micro, r.fit_micro) for r in rows]
    assert got == [
        (0, 1, 1000000, 500000),
        (1, 1, 0, 500000),
        (2, 1, 1000000, 1000000),
    ]
    expect = _py_isotonic(pairs, 3)
    full = sorted(
        (r.cell, r.score_lo, r.score_hi, r.n_rows, r.mean_micro,
         r.fit_micro)
        for r in rows
    )
    assert full == expect


def test_isotonic_random_parity_and_monotone(spark):
    import random

    from nebula_importer_spark.operators.metrics import isotonic_calibration

    rng = random.Random(31337)
    for trial in range(3):
        pairs = [
            (rng.randrange(0, 500), rng.randrange(0, 2))
            for _ in range(300)
        ]
        df = spark.createDataFrame(pairs, "s long, y long").repartition(5)
        rows = isotonic_calibration(
            df, score_col="s", y_col="y", n_cells=16
        ).collect()
        got = sorted(
            (r.cell, r.score_lo, r.score_hi, r.n_rows, r.mean_micro,
             r.fit_micro)
            for r in rows
        )
        assert got == _py_isotonic(pairs, 16), f"trial {trial}"
        fits = [g[5] for g in got]
        assert fits == sorted(fits), f"trial {trial}: not monotone"


def test_isotonic_nulls_empty_validation(spark):
    from nebula_importer_spark.operators.metrics import isotonic_calibration

    df = spark.createDataFrame(
        [(1, 1), (None, 1), (2, None)], "s long, y long"
    )
    rows = isotonic_calibration(
        df, score_col="s", y_col="y", n_cells=4
    ).collect()
    assert len(rows) == 1 and rows[0].n_rows == 1
    empty = spark.createDataFrame([(None, None)], "s long, y long")
    assert (
        isotonic_calibration(
            empty, score_col="s", y_col="y", n_cells=4
        ).count()
        == 0
    )
    f = spark.createDataFrame([(1.5, 1)], "s double, y long")
    with pytest.raises(ValueError, match="integral"):
        isotonic_calibration(f, score_col="s", y_col="y")
    with pytest.raises(ValueError, match="not in input"):
        isotonic_calibration(f, score_col="zzz", y_col="y")
    ok = spark.createDataFrame([(1, 1)], "s long, y long")
    with pytest.raises(ValueError, match="n_cells"):
        isotonic_calibration(ok, score_col="s", y_col="y", n_cells=0)


def test_did_textbook_effect(spark):
    from nebula_importer_spark.operators.metrics import diff_in_diff

    # control moves +1, treated moves +3 -> DiD = +2
    rows = (
        [(0, 0, 10)] * 4 + [(0, 1, 11)] * 4
        + [(1, 0, 20)] * 4 + [(1, 1, 23)] * 4
    )
    df = spark.createDataFrame(rows, "treated long, post long, outcome long")
    r = diff_in_diff(df).collect()[0]
    assert r.mean_00_micro == 10_000_000 and r.mean_01_micro == 11_000_000
    assert r.mean_10_micro == 20_000_000 and r.mean_11_micro == 23_000_000
    assert r.did_micro == 2_000_000
    assert r.n_dropped == 0


def test_did_empty_cell_and_drops(spark):
    from nebula_importer_spark.operators.metrics import diff_in_diff

    rows = [(0, 0, 1), (0, 1, 2), (1, 0, 3), (None, 1, 9), (1, 1, None)]
    df = spark.createDataFrame(rows, "treated long, post long, outcome long")
    r = diff_in_diff(df).collect()[0]
    assert r.n_11 == 0 and r.did_micro is None  # undefined design
    assert r.n_dropped == 2
    assert r.mean_10_micro == 3_000_000


def test_did_random_parity_and_validation(spark):
    import random

    from nebula_importer_spark.operators.metrics import diff_in_diff

    rng = random.Random(515)
    rows = [
        (rng.randrange(2), rng.randrange(2), rng.randrange(-50, 200))
        for _ in range(400)
    ]
    df = spark.createDataFrame(
        rows, "treated long, post long, outcome long"
    ).repartition(5)
    r = diff_in_diff(df).collect()[0]

    def tdiv(a, b):
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b > 0) else -q

    m = {}
    for gi in (0, 1):
        for pi in (0, 1):
            cell = [y for g, p, y in rows if g == gi and p == pi]
            m[(gi, pi)] = tdiv(sum(cell) * 10**6, len(cell))
            assert r[f"n_{gi}{pi}"] == len(cell)
            assert r[f"mean_{gi}{pi}_micro"] == m[(gi, pi)]
    assert r.did_micro == (m[(1, 1)] - m[(1, 0)]) - (
        m[(0, 1)] - m[(0, 0)]
    )
    bad = spark.createDataFrame(
        [(2, 0, 1)], "treated long, post long, outcome long"
    )
    with pytest.raises(ValueError, match="0 or 1"):
        diff_in_diff(bad)
    with pytest.raises(ValueError, match="not in input"):
        diff_in_diff(bad, group_col="zzz")


def _py_stump(rows, features, n_cells=32, scale=10**6):
    """Model: same cells, same rational order via (whole, frac)."""
    from collections import defaultdict

    labeled = [r for r in rows if r[-1] is not None]
    cand = []
    for fi, f in enumerate(features):
        vals = [(r[fi], r[-1]) for r in labeled if r[fi] is not None]
        if not vals:
            continue
        mn = min(x for x, _ in vals)
        mx = max(x for x, _ in vals)
        span = mx - mn + 1
        cells = defaultdict(lambda: [0, 0, None])
        for x, y in vals:
            c = (x - mn) * n_cells // span
            st = cells[c]
            st[0] += 1
            st[1] += y
            st[2] = x if st[2] is None else max(st[2], x)
        order = sorted(cells)
        nt = sum(cells[c][0] for c in order)
        pt = sum(cells[c][1] for c in order)
        nl = pl = 0
        for c in order:
            nl += cells[c][0]
            pl += cells[c][1]
            if nl == 0 or nl == nt:
                continue
            nr, pr = nt - nl, pt - pl
            num = 2 * pl * (nl - pl) * nr + 2 * pr * (nr - pr) * nl
            den = nl * nr * nt
            wh, r = divmod(num, den)
            fr = r * 10**18 // den
            cand.append(
                (wh, fr, f, c,
                 (f, cells[c][2], nl, pl, nr, pr,
                  wh * scale + fr // (10**18 // scale),
                  (2 * pt * (nt - pt) * scale) // (nt * nt)))
            )
    cand.sort()
    return cand[0][4]


def test_stump_perfect_separator(spark):
    from nebula_importer_spark.operators.metrics import gini_stump

    # f1 separates perfectly at 10; f2 is noise
    rows = [(i, 7, 0) for i in range(10)] + [
        (100 + i, 7, 1) for i in range(10)
    ]
    df = spark.createDataFrame(rows, "f1 long, f2 long, label long")
    r = gini_stump(df, feature_cols=["f1", "f2"]).collect()[0]
    assert r.feature == "f1"
    assert r.gini_micro == 0
    assert r.n_left == 10 and r.pos_left == 0
    assert r.n_right == 10 and r.pos_right == 10
    assert r.split_value == 9
    assert r.parent_gini_micro == 500000


def test_stump_random_parity_and_nulls(spark):
    import random

    from nebula_importer_spark.operators.metrics import gini_stump

    rng = random.Random(606060)
    rows = []
    for _ in range(400):
        a = rng.randrange(0, 100)
        b = rng.randrange(0, 50)
        # label correlated with a, noisy
        y = 1 if (a + rng.randrange(0, 40)) > 70 else 0
        if rng.random() < 0.03:
            a = None
        rows.append((a, b, y))
    df = spark.createDataFrame(
        rows, "fa long, fb long, label long"
    ).repartition(5)
    r = gini_stump(df, feature_cols=["fa", "fb"], n_cells=16).collect()[0]
    got = (
        r.feature, r.split_value, r.n_left, r.pos_left, r.n_right,
        r.pos_right, r.gini_micro, r.parent_gini_micro,
    )
    assert got == _py_stump(rows, ["fa", "fb"], n_cells=16)
    assert r.feature == "fa"  # the informative feature wins


def test_stump_validation(spark):
    from nebula_importer_spark.operators.metrics import gini_stump

    df = spark.createDataFrame(
        [(1, 2.0, 1)], "a long, b double, label long"
    )
    with pytest.raises(ValueError, match="feature_cols"):
        gini_stump(df, feature_cols=[])
    with pytest.raises(ValueError, match="not in input"):
        gini_stump(df, feature_cols=["zzz"])
    with pytest.raises(ValueError, match="integral"):
        gini_stump(df, feature_cols=["b"])
    with pytest.raises(ValueError, match="n_cells"):
        gini_stump(df, feature_cols=["a"], n_cells=1)
    bad = spark.createDataFrame([(1, 2)], "a long, label long")
    with pytest.raises(ValueError, match="0 or 1"):
        gini_stump(bad, feature_cols=["a"])


def _py_confusion(pairs, scale=10**6):
    from collections import Counter

    lab = Counter(l for l, _ in pairs)
    prd = Counter(p for _, p in pairs)
    diag = Counter(l for l, p in pairs if l == p)
    classes = sorted(set(lab) | set(prd))
    out = {}
    for c in classes:
        tp = diag.get(c, 0)
        fp = prd.get(c, 0) - tp
        fn = lab.get(c, 0) - tp
        out[c] = (
            lab.get(c, 0), tp, fp, fn,
            tp * scale // (tp + fp) if tp + fp else None,
            tp * scale // (tp + fn) if tp + fn else None,
            2 * tp * scale // (2 * tp + fp + fn) if 2 * tp + fp + fn else None,
        )
    n = len(pairs)
    stp = sum(diag.values())
    sfp = sum(prd.values()) - stp
    sfn = sum(lab.values()) - stp
    out["<micro>"] = (
        n, stp, sfp, sfn,
        stp * scale // (stp + sfp), stp * scale // (stp + sfn),
        2 * stp * scale // (2 * stp + sfp + sfn),
    )
    k = len(classes)
    out["<macro>"] = (
        n, None, None, None,
        sum(out[c][4] or 0 for c in classes) // k,
        sum(out[c][5] or 0 for c in classes) // k,
        sum(out[c][6] or 0 for c in classes) // k,
    )
    return out


def test_confusion_report_random_parity(spark):
    import random

    from nebula_importer_spark.operators.metrics import confusion_report

    rng = random.Random(99)
    langs = ["en", "de", "fr", "zh"]
    rows = []
    for i in range(500):
        l = rng.choice(langs)
        # 'zh' never predicted (pred 'und' instead); 'xx' hallucinated
        p = l if rng.random() < 0.7 else rng.choice(["en", "de", "und", "xx"])
        if p == "zh":
            p = "und"
        if rng.random() < 0.02:
            l = None
        rows.append((l, p, i))
    df = spark.createDataFrame(
        rows, "label string, pred string, i long"
    ).repartition(6)
    got = {
        r["class"]: (
            r.support, r.tp, r.fp, r.fn,
            r.precision_ppm, r.recall_ppm, r.f1_ppm,
        )
        for r in confusion_report(df).collect()
    }
    want = _py_confusion([(l, p) for l, p, _ in rows if l is not None])
    assert got == want
    # 'zh' never predicted: zero tp, NULL precision, defined zero recall
    assert got["zh"][1] == 0 and got["zh"][4] is None and got["zh"][5] == 0
    # hallucinated 'xx': zero support, NULL recall
    assert got["xx"][0] == 0 and got["xx"][5] is None
    # micro precision == recall == accuracy for single-label rows
    assert got["<micro>"][4] == got["<micro>"][5]


def test_confusion_report_validation(spark):
    from nebula_importer_spark.operators.metrics import confusion_report

    df = spark.createDataFrame([("a", "a")], "label string, pred string")
    with pytest.raises(ValueError, match="not in input"):
        confusion_report(df, label_col="zz")
    with pytest.raises(ValueError, match="must differ"):
        confusion_report(df, label_col="label", pred_col="label")
    with pytest.raises(ValueError, match="scale"):
        confusion_report(df, scale=0)


def test_mcnemar_known_and_parity(spark):
    import random

    from nebula_importer_spark.operators.metrics import mcnemar_test

    # classic textbook cell counts: n10=20, n01=5 -> chi2 = 225/25 = 9
    rows = (
        [("x", "x", "x")] * 30       # both correct
        + [("x", "x", "y")] * 20     # only A correct
        + [("x", "y", "x")] * 5      # only B correct
        + [("x", "y", "y")] * 10     # both wrong
    )
    df = spark.createDataFrame(
        rows, "label string, pred_a string, pred_b string"
    ).repartition(4)
    r = mcnemar_test(df).collect()[0]
    assert (r.n, r.n11, r.n10, r.n01, r.n00) == (65, 30, 20, 5, 10)
    assert r.chi2_micro == 9_000_000
    assert r.chi2_corrected_micro == (14 * 14 * 10**6) // 25

    rng = random.Random(17)
    rows2 = []
    for i in range(400):
        l = rng.choice(["p", "q"])
        a = l if rng.random() < 0.8 else ("p" if l == "q" else "q")
        b = l if rng.random() < 0.6 else ("p" if l == "q" else "q")
        if rng.random() < 0.02:
            b = None
        rows2.append((l, a, b))
    df2 = spark.createDataFrame(
        rows2, "label string, pred_a string, pred_b string"
    )
    r2 = mcnemar_test(df2).collect()[0]
    kept = [(l, a, b) for l, a, b in rows2 if b is not None]
    b_ = sum(1 for l, a, b in kept if a == l and b != l)
    c_ = sum(1 for l, a, b in kept if a != l and b == l)
    assert (r2.n, r2.n10, r2.n01) == (len(kept), b_, c_)
    assert r2.chi2_micro == (b_ - c_) ** 2 * 10**6 // (b_ + c_)


def test_mcnemar_degenerate_and_validation(spark):
    from nebula_importer_spark.operators.metrics import mcnemar_test

    # no discordant pairs: NULL statistic, not 0
    rows = [("x", "x", "x")] * 3 + [("x", "y", "y")] * 2
    df = spark.createDataFrame(
        rows, "label string, pred_a string, pred_b string"
    )
    r = mcnemar_test(df).collect()[0]
    assert (r.n10, r.n01) == (0, 0)
    assert r.chi2_micro is None and r.chi2_corrected_micro is None
    # empty input: one all-zero row with NULL statistics
    empty = spark.createDataFrame(
        [], "label string, pred_a string, pred_b string"
    )
    re = mcnemar_test(empty).collect()[0]
    assert (re.n, re.n11, re.chi2_micro) == (0, 0, None)
    with pytest.raises(ValueError, match="not in input"):
        mcnemar_test(df, pred_a_col="zz")
    with pytest.raises(ValueError, match="distinct"):
        mcnemar_test(df, pred_a_col="pred_b", pred_b_col="pred_b")


def _py_alpha(ratings, scale=10**6):
    """Independent model: explicit coincidence-matrix formulation
    (Krippendorff 2011), exact fractions — NOT the lcm device."""
    from collections import Counter, defaultdict
    from fractions import Fraction

    by_item = defaultdict(list)
    for u, v in ratings:
        if u is not None and v is not None:
            by_item[u].append(v)
    pair = {u: vs for u, vs in by_item.items() if len(vs) >= 2}
    n_items = len(by_item)
    n_unpair = n_items - len(pair)
    if not pair:
        return (n_items, n_unpair, 0, 0, None)
    n = sum(len(vs) for vs in pair.values())
    marg = Counter(v for vs in pair.values() for v in vs)
    d_o = Fraction(0)
    for vs in pair.values():
        m = len(vs)
        cnt = Counter(vs)
        # off-diagonal coincidences within the unit
        d_o += Fraction(m * m - sum(o * o for o in cnt.values()), m - 1)
    d_e = Fraction(sum(nc * (n - nc) for nc in marg.values()), n - 1)
    if d_e == 0:
        return (n_items, n_unpair, n, len(marg), None)
    alpha = 1 - d_o / d_e
    micro = (alpha.numerator * scale) // alpha.denominator
    return (n_items, n_unpair, n, len(marg), micro)


def test_krippendorff_known_case(spark):
    from nebula_importer_spark.operators.metrics import krippendorff_alpha

    def alpha_of(rows):
        df = spark.createDataFrame(rows, "item string, value string")
        return krippendorff_alpha(df).collect()[0].alpha_micro

    # hand-derived closed cases (D_o, D_e worked by the coincidence
    # formulation): perfect agreement -> 1; u2 split (x,y) against a
    # 3x/1y marginal -> D_o = D_e = 2 -> exactly 0; crossed
    # disagreement -> D_o = 4, D_e = 8/3 -> alpha = -1/2
    assert alpha_of(
        [("a", "x"), ("a", "x"), ("b", "y"), ("b", "y")]
    ) == 1_000_000
    assert alpha_of(
        [("a", "x"), ("a", "x"), ("b", "x"), ("b", "y")]
    ) == 0
    assert alpha_of(
        [("a", "x"), ("a", "y"), ("b", "y"), ("b", "x")]
    ) == -500_000
    # varying panel sizes (1..4 raters, missing values): parity with the
    # independent exact-Fraction coincidence model
    data = {
        1: ["a", "a", "a"], 2: ["b", "b", "b"], 3: ["c", "c", "c"],
        4: ["c", "c", "c"], 5: ["b", "b", "b"], 6: ["a", "b", "c", "d"],
        7: ["d", "d", "d", "d"], 8: ["a", "a", "b", "a"],
        9: ["b", "b", "b", "b"], 10: ["e", "e", "e"],
        11: ["a", "a", "a"], 12: ["c"],
    }
    rows = [(str(u), v) for u, vs in data.items() for v in vs]
    df = spark.createDataFrame(rows, "item string, value string")
    r = krippendorff_alpha(df).collect()[0]
    got = (r.n_items, r.n_unpairable, r.n, r.n_values, r.alpha_micro)
    assert got == _py_alpha(rows)
    assert r.n_unpairable == 1 and r.alpha_micro > 700_000


def test_krippendorff_random_parity_and_edges(spark):
    import random

    from nebula_importer_spark.operators.metrics import krippendorff_alpha

    rng = random.Random(311)
    rows = []
    for u in range(120):
        m = rng.randrange(1, 7)  # includes unpairable singletons
        base = rng.choice(["x", "y", "z"])
        for _ in range(m):
            v = base if rng.random() < 0.6 else rng.choice(["x", "y", "z"])
            rows.append((f"u{u}", v))
    if True:
        rows.append((None, "x"))
        rows.append(("u0", None))
    df = spark.createDataFrame(rows, "item string, value string").repartition(6)
    r = krippendorff_alpha(df).collect()[0]
    got = (r.n_items, r.n_unpairable, r.n, r.n_values, r.alpha_micro)
    assert got == _py_alpha(rows)
    # perfect agreement but single value: expected disagreement 0 -> NULL
    same = spark.createDataFrame(
        [("a", "x"), ("a", "x"), ("b", "x"), ("b", "x")],
        "item string, value string",
    )
    rs = krippendorff_alpha(same).collect()[0]
    assert rs.alpha_micro is None and rs.n == 4
    # all unpairable: NULL with counts
    single = spark.createDataFrame(
        [("a", "x"), ("b", "y")], "item string, value string"
    )
    ru = krippendorff_alpha(single).collect()[0]
    assert (ru.n_items, ru.n_unpairable, ru.n, ru.alpha_micro) == (
        2, 2, 0, None,
    )
    # systematic disagreement: alpha < 0 (negative-safe floor)
    disagree = spark.createDataFrame(
        [("a", "x"), ("a", "y"), ("b", "x"), ("b", "y")],
        "item string, value string",
    )
    rd = krippendorff_alpha(disagree).collect()[0]
    assert rd.alpha_micro == _py_alpha(
        [("a", "x"), ("a", "y"), ("b", "x"), ("b", "y")]
    )[4]
    assert rd.alpha_micro < 0


def test_krippendorff_validation(spark):
    from nebula_importer_spark.operators.metrics import krippendorff_alpha

    df = spark.createDataFrame([("a", "x")], "item string, value string")
    with pytest.raises(ValueError, match="not in input"):
        krippendorff_alpha(df, item_col="zz")
    with pytest.raises(ValueError, match="must differ"):
        krippendorff_alpha(df, item_col="item", value_col="item")
    with pytest.raises(ValueError, match="max_raters"):
        krippendorff_alpha(df, max_raters=1)
    big = spark.createDataFrame(
        [("a", str(i)) for i in range(5)], "item string, value string"
    )
    with pytest.raises(ValueError, match="max_raters=3"):
        krippendorff_alpha(big, max_raters=3)


def _py_rbo(rows, systems=("a", "b"), p=(9, 10), k=20, scale=10**6):
    from collections import defaultdict

    pn, pd_ = p
    pref = defaultdict(dict)  # (q, s) -> {item: rank}
    for q, s, r, i in rows:
        if None in (q, s, r, i) or s not in systems or not 1 <= r <= k:
            continue
        pref[(q, s)][i] = r
    queries = sorted({q for q, _ in pref})
    out = {}
    for q in queries:
        A = pref.get((q, systems[0]), {})
        B = pref.get((q, systems[1]), {})
        md = [max(A[i], B[i]) for i in set(A) & set(B)]
        rbo = 0
        xk = 0
        for d in range(1, k + 1):
            x = sum(1 for m in md if m <= d)
            if x == 0:
                continue
            wnum = (pd_ - pn) * pn ** (d - 1)
            wden = pd_**d * d
            rbo += wnum * x * scale // wden
            if d == k:
                xk = x
        out[q] = (len(A), len(B), xk, rbo)
    return out


def test_rbo_closed_cases(spark):
    from nebula_importer_spark.operators.metrics import rbo_overlap

    # identical rankings: every term exact -> Σ floor((1/10)·9^(d-1)·d·1e6/(10^d·d))
    rows = [("q1", s, r, f"doc{r}") for s in ("a", "b") for r in range(1, 21)]
    # disjoint rankings: rbo exactly 0
    rows += [("q2", "a", r, f"x{r}") for r in range(1, 21)]
    rows += [("q2", "b", r, f"y{r}") for r in range(1, 21)]
    # reversed top-4 only (k prefix subset)
    rows += [("q3", "a", r, f"z{r}") for r in range(1, 5)]
    rows += [("q3", "b", r, f"z{5 - r}") for r in range(1, 5)]
    df = spark.createDataFrame(
        rows, "query string, system string, rank long, item string"
    ).repartition(5)
    got = {
        r.query: (r.n_a, r.n_b, r.overlap_at_k, r.rbo_micro)
        for r in rbo_overlap(df).collect()
    }
    want = _py_rbo(rows)
    assert got == want
    exp_ident = sum(
        9 ** (d - 1) * d * 10**6 // (10**d * d) for d in range(1, 21)
    )
    assert got["q1"] == (20, 20, 20, exp_ident)
    assert 870_000 < exp_ident < 879_000  # ~ 1 - 0.9^20
    assert got["q2"] == (20, 20, 0, 0)
    # reversed lists share all items: overlap grows late, rbo well below 1
    assert got["q3"][2] == 4 and 0 < got["q3"][3] < exp_ident


def test_rbo_random_parity(spark):
    import random

    from nebula_importer_spark.operators.metrics import rbo_overlap

    rng = random.Random(77)
    rows = []
    for q in range(12):
        pool = [f"d{q}_{i}" for i in range(30)]
        for s in ("a", "b"):
            picks = rng.sample(pool, rng.randrange(5, 21))
            rows += [(f"q{q}", s, r + 1, it) for r, it in enumerate(picks)]
    rows.append(("q0", "c", 1, "ignored"))  # third system ignored
    rows.append((None, "a", 1, "nullq"))
    df = spark.createDataFrame(
        rows, "query string, system string, rank long, item string"
    ).repartition(7)
    got = {
        r.query: (r.n_a, r.n_b, r.overlap_at_k, r.rbo_micro)
        for r in rbo_overlap(df, k=15).collect()
    }
    assert got == _py_rbo(rows, k=15)


def test_rbo_validation(spark):
    from nebula_importer_spark.operators.metrics import rbo_overlap

    ok = spark.createDataFrame(
        [("q", "a", 1, "x")], "query string, system string, rank long, item string"
    )
    with pytest.raises(ValueError, match="p must"):
        rbo_overlap(ok, p=(10, 10))
    with pytest.raises(ValueError, match="k must"):
        rbo_overlap(ok, k=0)
    with pytest.raises(ValueError, match="systems must differ"):
        rbo_overlap(ok, systems=("a", "a"))
    with pytest.raises(ValueError, match="not in input"):
        rbo_overlap(ok, rank_col="zz")
    dup_rank = spark.createDataFrame(
        [("q", "a", 1, "x"), ("q", "a", 1, "y")],
        "query string, system string, rank long, item string",
    )
    with pytest.raises(ValueError, match="duplicate rank"):
        rbo_overlap(dup_rank)
    dup_item = spark.createDataFrame(
        [("q", "a", 1, "x"), ("q", "a", 2, "x")],
        "query string, system string, rank long, item string",
    )
    with pytest.raises(ValueError, match="duplicate item"):
        rbo_overlap(dup_item)


def _py_ap(ranked, truth, k, scale=10**6):
    from collections import defaultdict

    tset = set()
    for q, d in truth:
        if q is not None and d is not None:
            tset.add((q, d))
    nrel = defaultdict(int)
    for q, d in tset:
        nrel[q] += 1
    byq = defaultdict(list)
    for q, d, r in ranked:
        if q is None or d is None or not 1 <= r <= k:
            continue
        byq[q].append((r, d))
    out = {}
    for q, rows in byq.items():
        rows.sort()
        h = 0
        s = 0
        nh = 0
        for r, d in rows:
            if (q, d) in tset:
                h += 1
                nh += 1
                s += h * scale // r
        out[q] = (
            len(rows),
            nrel.get(q, 0),
            nh,
            s // nrel[q] if nrel.get(q) else None,
        )
    return out


def test_average_precision_closed_and_parity(spark):
    import random

    from nebula_importer_spark.operators.metrics import average_precision

    # hand case: hits at ranks 1 and 3 of R=2 -> AP = (1 + 2/3)/2
    ranked = spark.createDataFrame(
        [("q", f"d{r}", r) for r in range(1, 6)],
        "query_id string, doc_id string, rank long",
    )
    truth = spark.createDataFrame(
        [("q", "d1"), ("q", "d3")], "query_id string, doc_id string"
    )
    r = average_precision(ranked, truth, k=5).collect()[0]
    assert r.ap_micro == (10**6 + 2 * 10**6 // 3) // 2
    assert (r.n_ranked, r.n_rel, r.n_hits) == (5, 2, 2)

    rng = random.Random(13)
    ranked_rows, truth_rows = [], []
    for q in range(10):
        docs = rng.sample(range(50), 20)
        ranked_rows += [(f"q{q}", f"d{d}", i + 1) for i, d in enumerate(docs)]
        truth_rows += [(f"q{q}", f"d{d}") for d in rng.sample(range(50), 8)]
    truth_rows.append(("q0", truth_rows[0][1]))  # dup truth pair
    ranked_rows.append(("q9", "dX", 99))  # beyond k: ignored
    rdf = spark.createDataFrame(
        ranked_rows, "query_id string, doc_id string, rank long"
    ).repartition(5)
    tdf = spark.createDataFrame(
        truth_rows, "query_id string, doc_id string"
    )
    got = {
        r.query_id: (r.n_ranked, r.n_rel, r.n_hits, r.ap_micro)
        for r in average_precision(rdf, tdf, k=15).collect()
    }
    assert got == _py_ap(ranked_rows, truth_rows, 15)


def test_average_precision_no_truth_and_validation(spark):
    from nebula_importer_spark.operators.metrics import average_precision

    ranked = spark.createDataFrame(
        [("q", "d1", 1)], "query_id string, doc_id string, rank long"
    )
    empty_truth = spark.createDataFrame(
        [], "query_id string, doc_id string"
    )
    r = average_precision(ranked, empty_truth, k=3).collect()[0]
    assert r.ap_micro is None and r.n_rel == 0  # undefined, not 0
    with pytest.raises(ValueError, match="k must"):
        average_precision(ranked, empty_truth, k=0)
    with pytest.raises(ValueError, match="not in ranked"):
        average_precision(ranked, empty_truth, k=3, rank_col="zz")
    bad = spark.createDataFrame([("q",)], "query_id string")
    with pytest.raises(ValueError, match="not in truth"):
        average_precision(ranked, bad, k=3)


def _py_regr(pairs, scale=10**6):
    pairs = [(y, p) for y, p in pairs if y is not None and p is not None]
    n = len(pairs)
    if n == 0:
        return None
    es = [p - y for y, p in pairs]
    sae = sum(abs(e) for e in es)
    se = sum(es)
    see = sum(e * e for e in es)
    sy = sum(y for y, _ in pairs)
    syy = sum(y * y for y, _ in pairs)
    sst = n * syy - sy * sy
    r2 = None if sst == 0 else ((sst - n * see) * 1000) // sst
    return (
        n,
        sae * scale // n,
        (se * scale) // n,  # python floor == pmod device
        see * scale // n,
        r2,
    )


def test_regression_report_closed_and_parity(spark):
    import random

    from nebula_importer_spark.operators.metrics import regression_report

    # perfect predictor: zero errors, R2 exactly 1
    perfect = spark.createDataFrame(
        [(i, i) for i in range(10)], "label long, pred long"
    )
    r = regression_report(perfect).collect()[0]
    assert (r.mae_micro, r.bias_micro, r.mse_micro, r.r2_milli) == (
        0, 0, 0, 1000,
    )
    # mean predictor: R2 exactly 0
    ys = [0, 2, 4, 6]  # mean 3
    meanp = spark.createDataFrame(
        [(y, 3) for y in ys], "label long, pred long"
    )
    rm = regression_report(meanp).collect()[0]
    assert rm.r2_milli == 0
    # systematic under-prediction: negative bias visible, MAE == |bias|
    under = spark.createDataFrame(
        [(i, i - 5) for i in range(20)], "label long, pred long"
    )
    ru = regression_report(under).collect()[0]
    assert ru.bias_micro == -5 * 10**6 and ru.mae_micro == 5 * 10**6
    # constant target: SST 0 -> NULL R2
    const = spark.createDataFrame(
        [(7, 6), (7, 8)], "label long, pred long"
    )
    assert regression_report(const).collect()[0].r2_milli is None

    rng = random.Random(61)
    rows = []
    for _ in range(500):
        y = rng.randrange(-50, 200)
        p = y + rng.randrange(-30, 31)
        if rng.random() < 0.02:
            p = None
        rows.append((y, p))
    df = spark.createDataFrame(rows, "label long, pred long").repartition(7)
    g = regression_report(df).collect()[0]
    assert (
        g.n, g.mae_micro, g.bias_micro, g.mse_micro, g.r2_milli,
    ) == _py_regr(rows)


def test_regression_report_validation(spark):
    from nebula_importer_spark.operators.metrics import regression_report

    df = spark.createDataFrame([(1, 2.0)], "label long, p double")
    with pytest.raises(ValueError, match="not in input"):
        regression_report(df, pred_col="zz")
    with pytest.raises(ValueError, match="integral"):
        regression_report(df, pred_col="p")
    with pytest.raises(ValueError, match="must differ"):
        regression_report(df, pred_col="label")
    empty = spark.createDataFrame([], "label long, pred long")
    r = regression_report(empty).collect()[0]
    assert r.n == 0 and r.mae_micro is None and r.r2_milli is None


def _py_spearman(pairs):
    import math

    xs = [p[0] for p in pairs]
    ys = [p[1] for p in pairs]

    def ranks2(vals):
        out = []
        for v in vals:
            below = sum(1 for u in vals if u < v)
            tied = sum(1 for u in vals if u == v)
            out.append(2 * below + tied + 1)
        return out

    rx, ry = ranks2(xs), ranks2(ys)
    n = len(pairs)
    sx, sy = sum(rx), sum(ry)
    sxx = sum(r * r for r in rx)
    syy = sum(r * r for r in ry)
    sxy = sum(a * b for a, b in zip(rx, ry))
    num = n * sxy - sx * sy
    dx, dy = n * sxx - sx * sx, n * syy - sy * sy
    if dx <= 0 or dy <= 0:
        return None
    return round(num / (math.sqrt(dx) * math.sqrt(dy)), 6)


def test_spearman_random_parity(spark):
    import random

    from nebula_importer_spark.operators.metrics import spearman_corr

    rng = random.Random(31)
    pairs = [
        (rng.randint(0, 40), rng.randint(0, 40)) for _ in range(300)
    ] + [(7, 7)] * 20  # heavy tie block
    df = spark.createDataFrame(pairs, "x long, y long")
    r = spearman_corr(df, "x", "y").collect()[0]
    assert r.n == 320 and r.n_null == 0
    assert r.rho == _py_spearman(pairs)


def test_spearman_monotone_and_degenerate(spark):
    from nebula_importer_spark.operators.metrics import spearman_corr

    up = spark.createDataFrame(
        [(i, i * i) for i in range(50)], "x long, y long"
    )
    assert spearman_corr(up, "x", "y").collect()[0].rho == 1.0
    down = spark.createDataFrame(
        [(i, -3 * i) for i in range(50)], "x long, y long"
    )
    assert spearman_corr(down, "x", "y").collect()[0].rho == -1.0
    const = spark.createDataFrame(
        [(i, 5) for i in range(10)] + [(None, 1)], "x long, y long"
    )
    r = spearman_corr(const, "x", "y").collect()[0]
    assert r.rho is None and r.n_null == 1 and r.n == 10


def test_spearman_validation(spark):
    import pytest

    from nebula_importer_spark.operators.metrics import spearman_corr

    df = spark.createDataFrame([(1, 0.5)], "x long, y double")
    with pytest.raises(ValueError, match="integral"):
        spearman_corr(df, "x", "y")
    with pytest.raises(ValueError, match="not in input"):
        spearman_corr(df, "zz", "x")
