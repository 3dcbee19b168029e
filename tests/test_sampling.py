"""Deterministic sampling operators: realized rates, exact-k strata,
layout-independence (the property rand() cannot give), and the plan
shapes that make them scale (no shuffle for the mix; map-side
WindowGroupLimit for the stratified sample)."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from nebula_importer_spark.operators.sampling import (
    hash_threshold,
    stratified_topk_sample,
    weighted_domain_sample,
)


def _docs(spark, n=4000, domains=4):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("src"), (F.col("id") % domains).cast("string")).alias(
            "source"
        ),
    )


def test_hash_threshold_bounds():
    assert hash_threshold(0.0) == "0" * 32
    assert hash_threshold(1.0) == "g"  # above every hex digest
    assert hash_threshold(0.5).startswith("80000000")
    with pytest.raises(ValueError):
        hash_threshold(1.5)


def test_mix_realized_rates(spark):
    df = _docs(spark)
    out = weighted_domain_sample(
        df, "source", "doc_id", {"src0": 1.0, "src1": 0.5, "src2": 0.1}
    )
    by = {r["source"]: r["n"] for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert "src3" not in by  # unlisted domain dropped (mix is a whitelist)
    assert by["src0"] == 1000  # rate 1.0 keeps everything
    assert 400 <= by["src1"] <= 600  # 1000 Bernoulli(0.5) draws
    assert 50 <= by["src2"] <= 160  # 1000 Bernoulli(0.1) draws


def test_mix_deterministic_across_layout(spark):
    df = _docs(spark, n=1000)
    w = {"src1": 0.4, "src2": 0.7}
    a = weighted_domain_sample(df, "source", "doc_id", w)
    b = weighted_domain_sample(df.repartition(13), "source", "doc_id", w)
    assert sorted(r["doc_id"] for r in a.collect()) == sorted(
        r["doc_id"] for r in b.collect()
    )


def test_mix_plan_has_no_exchange(spark):
    out = weighted_domain_sample(_docs(spark), "source", "doc_id", {"src0": 0.5})
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    assert ") Exchange" not in buf.getvalue()


def test_stratified_exact_k_and_deterministic(spark):
    df = _docs(spark, n=2000)
    out = stratified_topk_sample(df, "source", "doc_id", k=25)
    counts = {r["source"]: r["n"] for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert counts == {f"src{i}": 25 for i in range(4)}
    again = stratified_topk_sample(df.repartition(7), "source", "doc_id", k=25)
    assert sorted(r["doc_id"] for r in out.collect()) == sorted(
        r["doc_id"] for r in again.collect()
    )
    # small stratum: min(k, |stratum|) rows, never an error
    tiny = stratified_topk_sample(df.limit(3), "source", "doc_id", k=25)
    assert tiny.count() == 3


def test_stratified_plan_uses_window_group_limit(spark):
    out = stratified_topk_sample(_docs(spark), "source", "doc_id", k=5)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    # rank filter must run map-side BEFORE the one shuffle on the stratum
    assert "WindowGroupLimit" in plan, plan
    assert plan.count(") Exchange") == 1, plan


def _py_grouped_split(rows, weights=(0.9, 0.05, 0.05),
                      names=("train", "val", "test"), salt="split"):
    import hashlib

    from nebula_importer_spark.operators.sampling import hash_threshold

    thrs = []
    cum = 0.0
    for w in weights[:-1]:
        cum += w
        thrs.append(hash_threshold(cum))
    out = {}
    for did, grp in rows:
        key = hashlib.md5((salt + str(grp)).encode()).hexdigest()
        split = names[-1]
        for thr, nm in zip(thrs, names[:-1]):
            if key < thr:
                split = nm
                break
        out[did] = (str(grp), split)
    return out


def test_grouped_split_matches_reference_and_no_leakage(spark):
    from nebula_importer_spark.operators.sampling import grouped_split

    rows = [(i, f"g{i % 37}") for i in range(600)]
    df = spark.createDataFrame(rows, "doc_id long, dup_group string")
    got = {
        r["doc_id"]: (r["split_group"], r["split"])
        for r in grouped_split(df, group_col="dup_group").collect()
    }
    assert got == _py_grouped_split(rows)
    # leakage property: every member of a group shares one split
    by_group: dict = {}
    for _, (g, s) in got.items():
        by_group.setdefault(g, set()).add(s)
    assert all(len(v) == 1 for v in by_group.values())
    # all three splits realized over 37 groups at 0.9/0.05/0.05... not
    # guaranteed for the tails; assert train dominates instead
    splits = [s for _, s in got.values()]
    assert splits.count("train") > len(splits) * 0.6


def test_grouped_split_null_group_sentinel(spark):
    """NULL groups hash under the '\\0null' sentinel — deterministic and
    identical to the DuckDB oracle's COALESCE(chr(0)||'null') twin (a
    NULL would otherwise NULL-propagate to the fallback split on one
    side only, a guaranteed gate mismatch)."""
    import hashlib

    from nebula_importer_spark.operators.sampling import grouped_split

    df = spark.createDataFrame(
        [(1, None), (2, None), (3, "g")], "doc_id long, dup_group string"
    )
    got = {r["doc_id"]: r["split"]
           for r in grouped_split(df, group_col="dup_group").collect()}
    key = hashlib.md5(("split" + "\x00null").encode()).hexdigest()
    assert key.startswith("075e6883")  # the value the oracle twin hashes
    assert got[1] == got[2] == "train"  # 075e... < e666... threshold


def test_grouped_split_side_table_and_singleton_fallback(spark):
    from nebula_importer_spark.operators.sampling import grouped_split

    docs = spark.createDataFrame([(i,) for i in range(50)], "doc_id long")
    # only even ids are grouped; odd ids must fall back to themselves
    groups = spark.createDataFrame(
        [(i, f"c{i % 5}") for i in range(0, 50, 2)], "doc_id long, comp string"
    )
    out = {
        r["doc_id"]: (r["split_group"], r["split"])
        for r in grouped_split(docs, groups=groups).collect()
    }
    assert len(out) == 50  # nobody dropped
    ref_rows = [(i, f"c{i % 5}" if i % 2 == 0 else str(i)) for i in range(50)]
    assert out == _py_grouped_split(ref_rows)


def test_grouped_split_map_only_plan(spark):
    from nebula_importer_spark.operators.sampling import grouped_split

    df = spark.createDataFrame([(1, "g")], "doc_id long, dup_group string")
    plan = (
        grouped_split(df, group_col="dup_group")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan  # pure expression — zero shuffles


def test_grouped_split_validation(spark):
    from nebula_importer_spark.operators.sampling import grouped_split

    df = spark.createDataFrame([(1, "g")], "doc_id long, dup_group string")
    with pytest.raises(ValueError, match="sum to 1"):
        grouped_split(df, group_col="dup_group", weights=(0.5, 0.2, 0.2))
    with pytest.raises(ValueError, match="exactly one"):
        grouped_split(df)
    with pytest.raises(ValueError, match="distinct"):
        grouped_split(
            df, group_col="dup_group",
            weights=(0.5, 0.5), names=("train", "train"),
        )


def test_score_ntiles_matches_sql_ntile_semantics(spark):
    from nebula_importer_spark.operators.sampling import score_ntiles

    # 10 rows, 3 tiles → sizes 4, 3, 3 with the remainder up front
    rows = [(i, float(100 - i)) for i in range(10)]  # id 0 has the best score
    df = spark.createDataFrame(rows, "doc_id long, q double")
    got = {r["doc_id"]: r["tile"] for r in score_ntiles(df, score_col="q", id_col="doc_id", n_tiles=3).collect()}
    assert got == {0: 1, 1: 1, 2: 1, 3: 1, 4: 2, 5: 2, 6: 2, 7: 3, 8: 3, 9: 3}


def test_score_ntiles_tie_break_and_bucket_invariance(spark):
    from nebula_importer_spark.operators.sampling import score_ntiles

    rows = [(i, 0.5) for i in range(6)]  # all tied → id order decides
    df = spark.createDataFrame(rows, "doc_id long, q double")
    for scale in (1, 7, 1000):
        got = {
            r["doc_id"]: r["tile"]
            for r in score_ntiles(
                df, score_col="q", id_col="doc_id", n_tiles=2, bucket_scale=scale
            ).collect()
        }
        assert got == {0: 1, 1: 1, 2: 1, 3: 2, 4: 2, 5: 2}


def test_score_ntiles_no_global_single_partition_sort(spark):
    """The plan must partition the ranking window by the range bucket —
    a plain ntile() would plan a single-partition WindowExec."""
    import contextlib, io, re

    from nebula_importer_spark.operators.sampling import score_ntiles

    df = spark.createDataFrame([(i, float(i % 17)) for i in range(100)], "doc_id long, q double")
    out = score_ntiles(df, score_col="q", id_col="doc_id")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    # the row_number window over the data must be partitioned by _b (its
    # windowspecdefinition's first argument is the partition column); the
    # only unpartitioned windows run over the tiny bucket-counts table.
    # A regressed global ranking would plan
    # row_number() windowspecdefinition(<order>, <frame>) with no _b.
    assert re.search(r"row_number\(\) windowspecdefinition\(_b#\d+", plan)
    got = {r["doc_id"] for r in out.collect()}
    assert len(got) == 100


def test_weighted_sample_matches_reference_formula(spark):
    """Efraimidis–Spirakis: top-k by ln(u)/w with u = (md5-52bit+1)/2^52 —
    the Python reference computes the identical formula; 52 bits keep the
    uniform exact in a double so both sides order identically."""
    import hashlib
    import math

    from nebula_importer_spark.operators.sampling import weighted_sample

    rows = [(i, (i * 37) % 211 + 1) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, w long")

    def key(i, w):
        u = (int(hashlib.md5(f"ws{i}".encode()).hexdigest()[:13], 16) + 1) / 2**52
        return math.log(u) / w

    want = sorted(rows, key=lambda r: key(*r), reverse=True)[:25]
    got = weighted_sample(df, k=25, weight_col="w").collect()
    assert sorted((r.doc_id, r.w) for r in got) == sorted(want)


def test_weighted_sample_excludes_bad_weights_and_validates_k(spark):
    import pytest

    from nebula_importer_spark.operators.sampling import weighted_sample

    df = spark.createDataFrame(
        [(1, 10), (2, 0), (3, -5), (4, None), (5, 3)],
        "doc_id long, w long",
    )
    got = {r.doc_id for r in weighted_sample(df, k=10, weight_col="w").collect()}
    assert got == {1, 5}  # zero/negative/NULL weights can never be drawn
    with pytest.raises(ValueError, match="k must be"):
        weighted_sample(df, k=0, weight_col="w")


def test_weighted_sample_plans_takeordered_not_global_sort(spark):
    """The top-k must plan as TakeOrderedAndProject (per-partition local
    top-k, driver merges k candidates) — a global Sort+Limit would shuffle
    the whole table at scale."""
    import contextlib
    import io

    from nebula_importer_spark.operators.sampling import weighted_sample

    df = spark.createDataFrame([(i, i + 1) for i in range(50)], "doc_id long, w long")
    out = weighted_sample(df, k=5, weight_col="w")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    assert "TakeOrderedAndProject" in buf.getvalue()


def _py_apportion(pairs, budget):
    tot = sum(w for _, w in pairs)
    if tot == 0:
        return {k: 0 for k, _ in pairs}
    fl = {k: budget * w // tot for k, w in pairs}
    rem = {k: budget * w % tot for k, w in pairs}
    left = budget - sum(fl.values())
    order = sorted(pairs, key=lambda kw: (-rem[kw[0]], kw[0]))
    for k, _ in order[:left]:
        fl[k] += 1
    return fl


def test_apportion_exact_and_sums(spark):
    from nebula_importer_spark.operators.sampling import apportion_budget

    df = spark.createDataFrame(
        [("en", 60), ("de", 25), ("fr", 15)], "key string, weight long"
    )
    got = {
        r["key"]: r["alloc"]
        for r in apportion_budget(df, budget=10).collect()
    }
    assert got == {"en": 6, "de": 3, "fr": 1}  # remainders 0, 5, 5 -> de
    assert sum(got.values()) == 10


def test_apportion_tie_and_zero_weight(spark):
    from nebula_importer_spark.operators.sampling import apportion_budget

    df = spark.createDataFrame(
        [("a", 1), ("b", 1), ("c", 1), ("z", 0)], "key string, weight long"
    )
    got = {
        r["key"]: r["alloc"]
        for r in apportion_budget(df, budget=2).collect()
    }
    # remainders tie at 2/3 -> key ASC: a, b get the seats
    assert got == {"a": 1, "b": 1, "c": 0, "z": 0}


def test_apportion_degenerate_and_random_parity(spark):
    import random

    from nebula_importer_spark.operators.sampling import apportion_budget

    zero = spark.createDataFrame(
        [("a", 0), ("b", 0)], "key string, weight long"
    )
    got0 = {
        r["key"]: r["alloc"]
        for r in apportion_budget(zero, budget=7).collect()
    }
    assert got0 == {"a": 0, "b": 0}

    rng = random.Random(12)
    for _ in range(3):
        pairs = [
            (f"k{i:02d}", rng.randrange(0, 50)) for i in range(12)
        ]
        budget = rng.randrange(0, 200)
        df = spark.createDataFrame(
            pairs, "key string, weight long"
        ).repartition(4)
        got = {
            r["key"]: r["alloc"]
            for r in apportion_budget(df, budget=budget).collect()
        }
        expect = _py_apportion(pairs, budget)
        assert got == expect
        if sum(w for _, w in pairs) > 0:
            assert sum(got.values()) == budget


def test_apportion_validation(spark):
    from nebula_importer_spark.operators.sampling import apportion_budget

    df = spark.createDataFrame([("a", 1)], "key string, weight long")
    with pytest.raises(ValueError, match="not in input"):
        apportion_budget(df, budget=1, key_col="zzz")
    with pytest.raises(ValueError, match="budget"):
        apportion_budget(df, budget=-1)
    neg = spark.createDataFrame([("a", -1)], "key string, weight long")
    with pytest.raises(ValueError, match="weights >= 0"):
        apportion_budget(neg, budget=1)
    nul = spark.createDataFrame([(None, 1)], "key string, weight long")
    with pytest.raises(ValueError, match="non-null"):
        apportion_budget(nul, budget=1)


def _py_temp_alloc(sizes, budget, half=True):
    import math

    w = {k: math.isqrt(n) if half else n for k, n in sizes.items()}
    tw = sum(w.values())
    if tw == 0:
        return {k: 0 for k in sizes}
    fl = {k: budget * wv // tw for k, wv in w.items()}
    rem = {k: budget * wv % tw for k, wv in w.items()}
    left = budget - sum(fl.values())
    order = sorted(sizes, key=lambda k: (-rem[k], k))
    for k in order[:left]:
        fl[k] += 1
    return fl


def test_temperature_sample_allocation_and_determinism(spark):
    from nebula_importer_spark.operators.sampling import temperature_sample

    rows = []
    sizes = {"big": 900, "mid": 100, "tiny": 9}
    i = 0
    for dom, n in sizes.items():
        for _ in range(n):
            rows.append((dom, i))
            i += 1
    rows.append((None, i))
    rows.append(("big", None))
    df = spark.createDataFrame(rows, "source string, doc_id long").repartition(6)

    got = temperature_sample(
        df, domain_col="source", id_col="doc_id", budget=120
    )
    by_dom = {
        r["source"]: r["n"]
        for r in got.groupBy("source").agg(
            __import__("pyspark.sql.functions", fromlist=["F"]).count("*").alias("n")
        ).collect()
    }
    want = _py_temp_alloc(sizes, 120, half=True)
    assert by_dom == {k: v for k, v in want.items() if v > 0}
    # sqrt flattening: big/tiny sample ratio tracks sqrt(900/9)=10 (up to
    # Hamilton remainder seats), nowhere near the raw 100:1
    assert 8 <= want["big"] / want["tiny"] <= 12
    # proportional mode restores the raw ratio
    prop = _py_temp_alloc(sizes, 120, half=False)
    got_prop = temperature_sample(
        df, domain_col="source", id_col="doc_id", budget=120,
        alpha_half=False,
    )
    by_prop = {
        r["source"]: r["n"]
        for r in got_prop.groupBy("source").count()
        .withColumnRenamed("count", "n").collect()
    }
    assert by_prop == {k: v for k, v in prop.items() if v > 0}
    # deterministic: same call, same rows
    a = sorted(r.doc_id for r in got.collect())
    b = sorted(
        r.doc_id
        for r in temperature_sample(
            df, domain_col="source", id_col="doc_id", budget=120
        ).collect()
    )
    assert a == b
    # under-full domain: alloc capped by size, not reassigned
    skew = spark.createDataFrame(
        [("a", i) for i in range(100)] + [("b", 200 + i) for i in range(2)],
        "source string, doc_id long",
    )
    g2 = temperature_sample(
        skew, domain_col="source", id_col="doc_id", budget=50
    )
    cnt = {r["source"]: r["count"] for r in g2.groupBy("source").count().collect()}
    assert cnt["b"] == 2  # wanted more than 2, capped at domain size


def test_temperature_sample_validation(spark):
    import pytest

    from nebula_importer_spark.operators.sampling import temperature_sample

    df = spark.createDataFrame([("a", 1)], "source string, doc_id long")
    with pytest.raises(ValueError, match="budget"):
        temperature_sample(df, domain_col="source", id_col="doc_id", budget=0)
    with pytest.raises(ValueError, match="not in input"):
        temperature_sample(df, domain_col="zz", id_col="doc_id", budget=5)


def test_systematic_sample_python_parity(spark):
    import hashlib
    import random

    from nebula_importer_spark.operators.sampling import systematic_sample

    rng = random.Random(3)
    rows = [(i, rng.randint(0, 100)) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    k = 50
    got = {
        r.doc_id: r.n_picks for r in systematic_sample(df, k).collect()
    }

    # independent reference: explicit probe walk over the md5-ordered line
    order = sorted(
        rows, key=lambda r: (hashlib.md5(f"sys{r[0]}".encode()).hexdigest(), r[0])
    )
    W = sum(w for _, w in rows)
    probes = [((2 * i + 1) * W) // (2 * k) for i in range(k)]
    want, c = {}, 0
    for did, w in order:
        n = sum(1 for p in probes if c <= p < c + w)
        if n:
            want[did] = n
        c += w
    assert got == want
    assert sum(got.values()) == k


def test_systematic_sample_heavy_and_validation(spark):
    import pytest

    from nebula_importer_spark.operators.sampling import systematic_sample

    rows = [(i, 1) for i in range(10)] + [(99, 990)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    got = {r.doc_id: r.n_picks for r in systematic_sample(df, 100).collect()}
    # heavy row holds 99% of the mass -> 99 picks
    assert got[99] == 99
    assert sum(got.values()) == 100
    with pytest.raises(ValueError, match="k must be"):
        systematic_sample(df, 0)
    with pytest.raises(ValueError, match="not in input"):
        systematic_sample(df, 5, weight_col="zz")
    neg = spark.createDataFrame([(1, -4)], "doc_id long, n_tokens long")
    with pytest.raises(Exception, match="negative weight"):
        systematic_sample(neg, 5).collect()


def test_temporal_split_exact_counts_and_embargo(spark):
    import datetime as dt

    from nebula_importer_spark.operators.sampling import temporal_split

    base = dt.datetime(2026, 1, 1)
    rows = [(i, base + dt.timedelta(hours=i)) for i in range(100)]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp")
    out = temporal_split(df, test_ppm=200_000, embargo_sec=5 * 3600).collect()
    got = {r.event_id: r.split for r in out}
    from collections import Counter

    c = Counter(got.values())
    assert c == {"train": 75, "test": 20, "embargo": 5}
    # boundary pinning: row at the cut itself is NOT test
    cut = out[0].cut_epoch
    at_cut = [r for r in out if r.epoch == cut]
    assert at_cut and all(r.split != "test" for r in at_cut)
    # no train row inside the embargo window
    assert all(
        r.epoch <= cut - 5 * 3600 for r in out if r.split == "train"
    )


def test_temporal_split_tied_timestamps(spark):
    import datetime as dt

    from nebula_importer_spark.operators.sampling import temporal_split

    base = dt.datetime(2026, 1, 1)
    # 10 rows all at the same instant: cut lands on that epoch; ties go
    # to the train side, so nothing is test
    rows = [(i, base) for i in range(10)]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp")
    out = temporal_split(df, test_ppm=300_000).collect()
    assert all(r.split == "train" for r in out)


def test_temporal_split_validation(spark):
    import pytest

    from nebula_importer_spark.operators.sampling import temporal_split

    df = spark.createDataFrame([(1,)], "event_id long").withColumn(
        "ts", __import__("pyspark.sql.functions", fromlist=["F"]).current_timestamp()
    )
    with pytest.raises(ValueError, match="test_ppm"):
        temporal_split(df, test_ppm=0)
    with pytest.raises(ValueError, match="embargo"):
        temporal_split(df, embargo_sec=-1)
    with pytest.raises(ValueError, match="not in input"):
        temporal_split(df, ts_col="zz")
