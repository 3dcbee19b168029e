"""operators/sketch.py — deterministic KMV cardinality sketch."""

from __future__ import annotations

import pytest

from nebula_importer_spark.operators.sketch import KMV_SPACE, kmv_distinct


def test_kmv_exact_below_capacity(spark):
    df = spark.createDataFrame(
        [(i % 40,) for i in range(500)], "user_id long"
    )
    r = kmv_distinct(df, "user_id", k=64).collect()[0]
    # 40 distinct < k=64: the sketch is lossless and exact
    assert r.n_kept == 40 and r.est_distinct == 40


def test_kmv_estimate_within_error_bound(spark):
    n = 20_000
    df = spark.createDataFrame([(i,) for i in range(n)], "user_id long")
    for k in (128, 512):
        r = kmv_distinct(df, "user_id", k=k).collect()[0]
        assert r.n_kept == k
        # ~1/sqrt(k-2) relative error; allow 4 sigma
        tol = 4.0 / (k - 2) ** 0.5
        assert abs(r.est_distinct - n) / n < tol, (k, r.est_distinct)


def test_kmv_grouped_matches_global_per_group(spark):
    rows = [(("a" if i % 3 else "b"), i % 700) for i in range(5000)]
    df = spark.createDataFrame(rows, "g string, user_id long")
    grouped = {
        r.g: (r.n_kept, r.est_distinct)
        for r in kmv_distinct(df, "user_id", k=128, group_cols=["g"]).collect()
    }
    for g in ("a", "b"):
        solo = kmv_distinct(
            df.filter(f"g = '{g}'"), "user_id", k=128
        ).collect()[0]
        # per-group sketch == sketch of the group in isolation (the merge
        # property that makes KMV partition-safe)
        assert grouped[g] == (solo.n_kept, solo.est_distinct)


def test_kmv_deterministic_across_runs_and_salts(spark):
    df = spark.createDataFrame([(i,) for i in range(3000)], "user_id long")
    a = kmv_distinct(df, "user_id", k=64).collect()[0]
    b = kmv_distinct(df, "user_id", k=64).collect()[0]
    assert (a.n_kept, a.est_distinct) == (b.n_kept, b.est_distinct)
    c = kmv_distinct(df, "user_id", k=64, salt="other").collect()[0]
    assert c.est_distinct != a.est_distinct  # different hash universe


def test_kmv_validation_and_plan(spark):
    df = spark.createDataFrame([(1, "x")], "user_id long, g string")
    with pytest.raises(ValueError):
        kmv_distinct(df, "user_id", k=8)
    with pytest.raises(ValueError):
        kmv_distinct(df, "g", group_cols=["g"])
    # ungrouped path: per-partition top-k, never a global sort
    plan = kmv_distinct(df, "user_id")._jdf.queryExecution(
    ).executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert KMV_SPACE == 2**52
