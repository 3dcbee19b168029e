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


# ---------------------------------------------------------------------------
# hash_sample_quantiles — deterministic bottom-k-by-hash quantile sketch


def _hsq_model(rows, k, qs, salt="hsq"):
    """rows: (group, value, id)"""
    import hashlib
    from collections import defaultdict

    by_g = defaultdict(list)
    for g, v, i in rows:
        if v is None:
            continue
        hk = hashlib.md5((salt + str(i)).encode()).hexdigest()
        by_g[g].append((hk, i, v))
    out = {}
    for g, items in by_g.items():
        items.sort(key=lambda t: (t[0], t[1]))
        sample = sorted((v, i) for _, i, v in items[:k])
        n = len(sample)
        picks = tuple(sample[(n - 1) * q // 100][0] for q in qs)
        out[g] = (n,) + picks
    return out


def test_hsq_exact_below_capacity(spark):
    from nebula_importer_spark.operators.sketch import hash_sample_quantiles

    rows = [("a", float(v), i) for i, v in enumerate([5, 1, 9, 3, 7])]
    df = spark.createDataFrame(rows, "event_type string, value double, event_id long")
    got = hash_sample_quantiles(df, k=100, quantiles=(0, 50, 100)).collect()[0]
    # below capacity → exact: min, median, max
    assert (got.n_sample, got.q0, got.q50, got.q100) == (5, 1.0, 5.0, 9.0)


def test_hsq_above_capacity_matches_model(spark):
    import random

    from nebula_importer_spark.operators.sketch import hash_sample_quantiles

    rng = random.Random(13)
    rows = [
        (rng.choice(["x", "y"]), round(rng.uniform(0, 100), 3), i)
        for i in range(500)
    ]
    rows += [("x", None, 9_000), ("z", 4.25, None)]  # NULL value / NULL id
    df = spark.createDataFrame(rows, "event_type string, value double, event_id long")
    got = {
        r.event_type: (r.n_sample, r.q25, r.q50, r.q75)
        for r in hash_sample_quantiles(df, k=64, quantiles=(25, 50, 75)).collect()
    }
    want = _hsq_model(
        [(g, v, i if i is not None else None) for g, v, i in rows],
        64,
        (25, 50, 75),
    )
    # model hashes NULL ids under the same sentinel the operator uses
    want_z = _hsq_model([("z", 4.25, "\x00null")], 64, (25, 50, 75))["z"]
    assert got["z"] == want_z
    assert got["x"] == want["x"] and got["y"] == want["y"]
    assert all(n == 64 for n, *_ in (got["x"], got["y"]))


def test_hsq_sample_error_bound(spark):
    import random

    from nebula_importer_spark.operators.sketch import hash_sample_quantiles

    rng = random.Random(7)
    rows = [("u", float(i), i) for i in range(10_000)]
    rng.shuffle(rows)
    df = spark.createDataFrame(rows, "event_type string, value double, event_id long")
    got = hash_sample_quantiles(df, k=256, quantiles=(50,)).collect()[0]
    # true median 4999.5; k=256 → se ≈ 0.5/sqrt(256) ≈ 3.1% of range
    assert abs(got.q50 - 5000) < 1200


def test_hsq_validation(spark):
    from nebula_importer_spark.operators.sketch import hash_sample_quantiles

    df = spark.createDataFrame(
        [("a", 1.0, 1)], "event_type string, value double, event_id long"
    )
    with pytest.raises(ValueError, match="k must"):
        hash_sample_quantiles(df, k=0)
    with pytest.raises(ValueError, match="quantiles"):
        hash_sample_quantiles(df, quantiles=(101,))
    with pytest.raises(ValueError, match="not in input"):
        hash_sample_quantiles(df, value_col="zz")


# ---------------------------------------------------------------- CMS


def test_cms_estimate_one_sided_and_tight(spark):
    from collections import Counter

    from nebula_importer_spark.operators.sketch import cms_estimate, cms_matrix

    vals = [i % 50 for i in range(4000)] + [7] * 500 + [11] * 200
    truth = Counter(vals)
    df = spark.createDataFrame([(v,) for v in vals], "user_id long")
    m = cms_matrix(df, "user_id", depth=4, width=512)
    est = {
        r.user_id: r.est_count
        for r in cms_estimate(m, df, "user_id", depth=4, width=512).collect()
    }
    n = len(vals)
    for v, c in truth.items():
        assert est[v] >= c, (v, est[v], c)  # one-sided
        assert est[v] <= c + 2 * n // 512 + 64, (v, est[v], c)


def test_cms_matrix_mergeable(spark):
    from pyspark.sql import functions as F

    from nebula_importer_spark.operators.sketch import cms_matrix

    a = spark.createDataFrame([(i % 30,) for i in range(900)], "k long")
    b = spark.createDataFrame([(i % 77,) for i in range(1100)], "k long")
    whole = cms_matrix(a.unionAll(b), "k", depth=3, width=64)
    merged = (
        cms_matrix(a, "k", depth=3, width=64)
        .unionAll(cms_matrix(b, "k", depth=3, width=64))
        .groupBy("r", "c")
        .agg(F.sum("cnt").alias("cnt"))
    )
    lhs = {(r.r, r.c): r.cnt for r in whole.collect()}
    rhs = {(r.r, r.c): r.cnt for r in merged.collect()}
    assert lhs == rhs


def test_cms_absent_key_estimates_zero_or_collision(spark):
    from nebula_importer_spark.operators.sketch import cms_estimate, cms_matrix

    data = spark.createDataFrame([(i,) for i in range(100)], "k long")
    probe = spark.createDataFrame([(10_000_000,)], "k long")
    m = cms_matrix(data, "k", depth=4, width=1024)
    est = cms_estimate(m, probe, "k", depth=4, width=1024).collect()[0]
    # with 100 rows over 4x1024 cells a 4-way collision is ~impossible
    assert est.est_count == 0


def test_cms_rejects_bad_shapes(spark):
    from nebula_importer_spark.operators.sketch import cms_matrix

    df = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError):
        cms_matrix(df, "k", depth=0)
    with pytest.raises(ValueError):
        cms_matrix(df, "missing")


# ------------------------------------------------------------- bloom filter


def test_bloom_no_false_negatives_and_semi_join_exact(spark):
    import random

    from nebula_importer_spark.operators.sketch import (
        bloom_filter,
        bloom_prefilter,
        bloom_semi_join,
    )

    rng = random.Random(7)
    big_keys = [rng.randrange(10_000) for _ in range(3_000)]
    small_keys = sorted(rng.sample(range(10_000), 150))
    big = spark.createDataFrame(
        [(i, k) for i, k in enumerate(big_keys)], "row_id long, k long"
    )
    small = spark.createDataFrame([(k,) for k in small_keys], "k long")

    bloom = bloom_filter(small, "k", n_bits=4096, n_hashes=5)
    kept = {
        r.row_id for r in bloom_prefilter(
            big, "k", bloom, n_bits=4096, n_hashes=5
        ).collect()
    }
    truth = {i for i, k in enumerate(big_keys) if k in set(small_keys)}
    # no false negatives: every true match survives the prefilter
    assert truth <= kept
    # the prefilter actually prunes (FP rate well under 50% here)
    assert len(kept) < len(big_keys) * 0.5

    out = {
        r.row_id
        for r in bloom_semi_join(big, small, "k", n_bits=4096).collect()
    }
    assert out == truth


def test_bloom_null_keys_never_match(spark):
    from nebula_importer_spark.operators.sketch import bloom_semi_join

    big = spark.createDataFrame(
        [(1, None), (2, 5), (3, 6)], "row_id long, k long"
    )
    small = spark.createDataFrame([(5,), (None,)], "k long")
    got = sorted(r.row_id for r in bloom_semi_join(big, small, "k").collect())
    # SQL IN semantics: NULL matches nothing on either side
    assert got == [2]


def test_bloom_merge_is_wordwise_or(spark):
    from pyspark.sql import functions as F

    from nebula_importer_spark.operators.sketch import bloom_filter

    a = spark.createDataFrame([(i,) for i in range(0, 60)], "k long")
    b = spark.createDataFrame([(i,) for i in range(40, 100)], "k long")
    u = a.union(b)
    wa = bloom_filter(a, "k", n_bits=1024).collect()[0].words
    wb = bloom_filter(b, "k", n_bits=1024).collect()[0].words
    wu = bloom_filter(u, "k", n_bits=1024).collect()[0].words
    assert [x | y for x, y in zip(wa, wb)] == list(wu)


def test_bloom_prefilter_is_map_side(spark):
    from nebula_importer_spark.operators.sketch import (
        bloom_filter,
        bloom_prefilter,
    )

    big = spark.createDataFrame([(i, i) for i in range(100)], "row_id long, k long")
    small = spark.createDataFrame([(3,), (7,)], "k long")
    out = bloom_prefilter(big, "k", bloom_filter(small, "k"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the 1-row bitset rides a broadcast nested-loop join; the big side
    # must not exchange on its way to the membership test
    assert "BroadcastNestedLoopJoin" in plan
    head = plan.split("BroadcastNestedLoopJoin")[0]
    assert "Exchange hashpartitioning" not in head


def test_bloom_validation(spark):
    import pytest as _pytest

    from nebula_importer_spark.operators.sketch import (
        bloom_filter,
        bloom_semi_join,
    )

    df = spark.createDataFrame([(1,)], "k long")
    with _pytest.raises(ValueError, match="multiple of 64"):
        bloom_filter(df, "k", n_bits=100)
    with _pytest.raises(ValueError, match="n_hashes"):
        bloom_filter(df, "k", n_hashes=0)
    with _pytest.raises(ValueError, match="not in input"):
        bloom_filter(df, "missing")
    with _pytest.raises(ValueError, match="not in small"):
        bloom_semi_join(df, df, "k", small_key="missing")


# --- HyperLogLog ---------------------------------------------------------


def _hll_python_model(values, p=12, salt="hll"):
    """Independent Python replica of the register/estimate contract."""
    import hashlib
    import math

    w_bits = 52 - p
    q_max = w_bits + 1
    m = 1 << p
    regs = {}
    for v in values:
        h = int(hashlib.md5(f"{salt}{v}".encode()).hexdigest()[:13], 16)
        b, w = h >> w_bits, h % (1 << w_bits)
        rho = q_max if w == 0 else w_bits - (w.bit_length() - 1)
        regs[b] = max(regs.get(b, 0), rho)
    s_scaled = sum(1 << (q_max - r) for r in regs.values()) + (
        m - len(regs)
    ) * (1 << q_max)
    k = (7213 * m**3 * (1 << q_max)) // (10000 * m + 10790)
    raw = k // s_scaled
    v_zero = m - len(regs)
    if raw * 2 <= 5 * m and v_zero > 0:
        est = math.floor(m * math.log(m / v_zero))
    else:
        est = raw
    return m, v_zero, s_scaled, est


def test_hll_matches_python_model_exactly(spark):
    from nebula_importer_spark.operators.sketch import hll_distinct

    for n in (0, 1, 37, 5000):
        vals = list(range(n))
        df = spark.createDataFrame(
            [(v,) for v in vals] or [(None,)], "user_id long"
        )
        rows = hll_distinct(df, "user_id", p=12).collect()
        if n == 0:
            # null-only input, GLOBAL agg: one exact empty-sketch row
            r = rows[0]
            assert (r.v_zero, r.s_scaled, r.est_distinct) == (
                4096, 4096 << 41, 0
            )
            continue
        r = rows[0]
        assert (r.m, r.v_zero, r.s_scaled, r.est_distinct) == \
            _hll_python_model(vals)


def test_hll_error_within_bound_and_duplicates_free(spark):
    from nebula_importer_spark.operators.sketch import hll_distinct

    n = 30_000
    df = spark.createDataFrame([(i % n,) for i in range(3 * n)], "u long")
    r = hll_distinct(df, "u", p=12).collect()[0]
    # ~1.04/sqrt(m) relative error; allow 4 sigma
    assert abs(r.est_distinct - n) / n < 4 * 1.04 / (1 << 12) ** 0.5
    # duplicates never change registers (max is idempotent)
    solo = hll_distinct(
        spark.createDataFrame([(i,) for i in range(n)], "u long"), "u", p=12
    ).collect()[0]
    assert (r.s_scaled, r.est_distinct) == (solo.s_scaled, solo.est_distinct)


def test_hll_grouped_matches_isolated_groups(spark):
    from nebula_importer_spark.operators.sketch import hll_distinct

    rows = [(("a" if i % 3 else "b"), i % 900) for i in range(4000)]
    df = spark.createDataFrame(rows, "g string, u long")
    grouped = {
        r.g: (r.v_zero, r.s_scaled, r.est_distinct)
        for r in hll_distinct(df, "u", p=10, group_cols=["g"]).collect()
    }
    for g in ("a", "b"):
        solo = hll_distinct(df.filter(f"g = '{g}'"), "u", p=10).collect()[0]
        assert grouped[g] == (solo.v_zero, solo.s_scaled, solo.est_distinct)


def test_hll_small_range_branch_is_linear_counting(spark):
    import math

    from nebula_importer_spark.operators.sketch import hll_distinct

    # tiny cardinality: nearly all registers empty -> linear counting
    df = spark.createDataFrame([(i,) for i in range(25)], "u long")
    r = hll_distinct(df, "u", p=12).collect()[0]
    assert r.v_zero > 0
    assert r.est_distinct == math.floor(4096 * math.log(4096 / r.v_zero))


def test_hll_validation(spark):
    from nebula_importer_spark.operators.sketch import hll_distinct

    df = spark.createDataFrame([(1, "x")], "u long, g string")
    with pytest.raises(ValueError):
        hll_distinct(df, "u", p=3)
    with pytest.raises(ValueError):
        hll_distinct(df, "missing")
    with pytest.raises(ValueError):
        hll_distinct(df, "g", group_cols=["g"])


def test_hll_rolling_equals_per_window_batch(spark):
    """Each day's rolling sketch must equal the batch hll_distinct over
    that day's trailing-window rows — register composition is exact, not
    approximate-on-top-of-approximate."""
    import datetime

    from pyspark.sql import functions as F

    from nebula_importer_spark.operators.sketch import (
        hll_distinct,
        hll_rolling_distinct,
    )

    base = datetime.datetime(2024, 3, 1)
    rows = []
    for d in range(10):
        if d == 4:
            continue  # a GAP day: no window end, contributes to later days
        for u in range(50 * (d + 1)):
            rows.append((base + datetime.timedelta(days=d, hours=u % 24),
                         (u * 7 + d) % 400))
    df = spark.createDataFrame(rows, "ts timestamp, user_id long")
    got = {
        r.day.isoformat(): (r.v_zero, r.s_scaled, r.est_distinct)
        for r in hll_rolling_distinct(
            df, "ts", "user_id", window_days=3, p=10
        ).collect()
    }
    assert "2024-03-05" not in got  # gap day absent
    for d in (0, 1, 2, 3, 5, 6, 7, 8, 9):
        day = (base + datetime.timedelta(days=d)).date()
        lo = day - datetime.timedelta(days=2)
        sub = df.filter(
            (F.col("ts") >= F.lit(str(lo)))
            & (F.col("ts") < F.lit(str(day + datetime.timedelta(days=1))))
        )
        want = hll_distinct(sub, "user_id", p=10).collect()[0]
        assert got[day.isoformat()] == (
            want.v_zero, want.s_scaled, want.est_distinct
        ), day


def test_hll_rolling_validation(spark):
    from nebula_importer_spark.operators.sketch import hll_rolling_distinct

    df = spark.createDataFrame([(None, 1)], "ts timestamp, user_id long")
    with pytest.raises(ValueError, match="window_days"):
        hll_rolling_distinct(df, "ts", "user_id", window_days=0)
    with pytest.raises(ValueError, match="not in input"):
        hll_rolling_distinct(df, "zz", "user_id")
    # all-null timestamps: no registers, no rows
    assert hll_rolling_distinct(df, "ts", "user_id").count() == 0


def _py_ams(values, k=16, salt="ams"):
    import hashlib

    sums = [0] * k
    vals = [v for v in values if v is not None]
    for j in range(k):
        for v in vals:
            h = int(
                hashlib.md5(f"{salt}{j}|{v}".encode()).hexdigest()[:13], 16
            )
            sums[j] += 1 if h % 2 == 0 else -1
    sq = sorted(s * s for s in sums)
    return len(vals), sq[(k - 1) // 2], sums


def test_ams_f2_parity_and_accuracy(spark):
    import random
    from collections import Counter

    from nebula_importer_spark.operators.sketch import ams_f2

    rng = random.Random(23)
    # skewed key: one heavy hitter dominates F2
    vals = [0] * 300 + [rng.randrange(1, 200) for _ in range(700)]
    rng.shuffle(vals)
    rows = [(v,) for v in vals] + [(None,)]
    df = spark.createDataFrame(rows, "k long").repartition(6)
    r = ams_f2(df, "k", k=16).collect()[0]
    n, est, sums = _py_ams(vals, 16)
    assert (r.n, r.f2_est, list(r.s_sums)) == (n, est, sums)
    true_f2 = sum(c * c for c in Counter(vals).values())
    # AMS with k=16 medians: within a factor ~2 of truth on this shape
    assert true_f2 / 2 <= r.f2_est <= true_f2 * 2

    # grouped: per-group sums match per-group models
    grows = [("a", v) for v in vals[:400]] + [("b", v) for v in vals[400:]]
    gdf = spark.createDataFrame(grows, "g string, k long")
    got = {
        r.g: (r.n, r.f2_est, list(r.s_sums))
        for r in ams_f2(gdf, "k", k=8, group_cols=["g"]).collect()
    }
    assert got["a"] == _py_ams(vals[:400], 8)
    assert got["b"] == _py_ams(vals[400:], 8)
    # mergeability: element-wise-summed s_sums equal the global sketch
    merged = [
        x + y for x, y in zip(got["a"][2], got["b"][2])
    ]
    assert merged == _py_ams(vals, 8)[2]


def test_ams_f2_validation(spark):
    import pytest

    from nebula_importer_spark.operators.sketch import ams_f2

    df = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError, match="k must"):
        ams_f2(df, "k", k=0)
    with pytest.raises(ValueError, match="not in input"):
        ams_f2(df, "zz")
    with pytest.raises(ValueError, match="group column"):
        ams_f2(df, "k", group_cols=["k"])


def test_kmv_set_ops_exact_below_capacity(spark):
    from nebula_importer_spark.operators.sketch import kmv_set_ops

    rows = (
        [("a", i) for i in range(30)]
        + [("b", i) for i in range(20, 50)]
        + [("c", i) for i in range(100, 105)]
    )
    df = spark.createDataFrame(rows, "g string, v long")
    got = {
        (r.group_a, r.group_b): r
        for r in kmv_set_ops(df, "v", "g", k=64).collect()
    }
    # every group below capacity -> sketches complete -> estimates exact
    ab = got[("a", "b")]
    assert (ab.est_union, ab.est_inter) == (50, 10)
    assert (ab.exact_union, ab.exact_inter) == (50, 10)
    assert ab.jaccard_ppm == 10 * 10**6 // 50
    ac = got[("a", "c")]
    assert (ac.est_inter, ac.exact_inter) == (0, 0)
    assert ac.est_union == 35


def test_kmv_set_ops_estimation_accuracy(spark):
    from nebula_importer_spark.operators.sketch import kmv_set_ops

    # 3000-element groups with a 1000-element overlap, k=256
    rows = [("a", i) for i in range(3000)] + [("b", i) for i in range(2000, 5000)]
    df = spark.createDataFrame(rows, "g string, v long")
    r = kmv_set_ops(df, "v", "g", k=256).collect()[0]
    assert (r.exact_union, r.exact_inter) == (5000, 1000)
    assert abs(r.est_union - 5000) < 1250
    assert abs(r.est_inter - 1000) < 500


def test_kmv_set_ops_validation(spark):
    import pytest

    from nebula_importer_spark.operators.sketch import kmv_set_ops

    df = spark.createDataFrame([("a", 1)], "g string, v long")
    with pytest.raises(ValueError, match="k must be"):
        kmv_set_ops(df, "v", "g", k=4)
    with pytest.raises(ValueError, match="not in input"):
        kmv_set_ops(df, "zz", "g")
    with pytest.raises(ValueError, match="group column"):
        kmv_set_ops(df, "g", "g")
