"""Temporal operators: as-of join, bounded range self-join, sessionization.

Each test checks the DataFrame operator against a brute-force Python model
over the same rows (the randomized-parity strategy used across this repo —
stronger than fixed golden outputs)."""

from __future__ import annotations

import random
from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from nebula_importer_spark.operators.temporal import (
    asof_join,
    range_self_join,
    sessionize_batch,
)

BASE = datetime(2026, 1, 1)


def _events(spark, rows):
    """rows: (event_id, user_id, sec_offset, kind, value)"""
    return spark.createDataFrame(
        [
            (eid, uid, BASE + timedelta(seconds=s), kind, float(v))
            for eid, uid, s, kind, v in rows
        ],
        "event_id long, user_id long, ts timestamp, kind string, value double",
    )


def test_asof_basic_prior_and_exact(spark):
    rows = [
        (1, 10, 0, "err", 1.0),
        (2, 10, 5, "click", 0.0),   # → err 1
        (3, 10, 10, "err", 2.0),
        (4, 10, 10, "click", 0.0),  # exact ts → err 3 (allow_exact)
        (5, 10, 20, "click", 0.0),  # → err 3
        (6, 11, 3, "click", 0.0),   # no prior err → null
    ]
    ev = _events(spark, rows)
    out = asof_join(
        ev.filter(F.col("kind") == "click").select("event_id", "user_id", "ts"),
        ev.filter(F.col("kind") == "err").select("user_id", "ts", "event_id", "value"),
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_cols=["event_id", "value"],
        right_seq="event_id",
    )
    got = {r["event_id"]: r["event_id_asof"] for r in out.collect()}
    assert got == {2: 1, 4: 3, 5: 3, 6: None}


def test_asof_strict_excludes_exact(spark):
    rows = [
        (1, 10, 0, "err", 1.0),
        (3, 10, 10, "err", 2.0),
        (4, 10, 10, "click", 0.0),  # exact ts excluded → err 1
    ]
    ev = _events(spark, rows)
    out = asof_join(
        ev.filter(F.col("kind") == "click").select("event_id", "user_id", "ts"),
        ev.filter(F.col("kind") == "err").select("user_id", "ts", "event_id", "value"),
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_cols=["event_id"],
        right_seq="event_id",
        allow_exact=False,
    )
    got = {r["event_id"]: r["event_id_asof"] for r in out.collect()}
    assert got == {4: 1}


def test_asof_tie_break_largest_seq(spark):
    # two err rows at the SAME ts for the same user → largest event_id wins
    rows = [
        (1, 10, 5, "err", 1.0),
        (7, 10, 5, "err", 7.0),
        (9, 10, 6, "click", 0.0),
    ]
    ev = _events(spark, rows)
    out = asof_join(
        ev.filter(F.col("kind") == "click").select("event_id", "user_id", "ts"),
        ev.filter(F.col("kind") == "err").select("user_id", "ts", "event_id", "value"),
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_cols=["event_id", "value"],
        right_seq="event_id",
    )
    row = out.collect()[0]
    assert row["event_id_asof"] == 7 and row["value_asof"] == 7.0


def test_asof_random_parity(spark):
    rng = random.Random(7)
    rows = []
    eid = 0
    for uid in range(5):
        for _ in range(40):
            eid += 1
            rows.append(
                (eid, uid, rng.randrange(0, 300), rng.choice(["err", "click"]), eid)
            )
    ev = _events(spark, rows)
    out = asof_join(
        ev.filter(F.col("kind") == "click").select("event_id", "user_id", "ts"),
        ev.filter(F.col("kind") == "err").select("user_id", "ts", "event_id", "value"),
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_cols=["event_id"],
        right_seq="event_id",
    )
    got = {r["event_id"]: r["event_id_asof"] for r in out.collect()}
    # brute-force model: most recent err with ts <= click ts; ties → max id
    for eid_l, uid, s, kind, _ in rows:
        if kind != "click":
            continue
        cands = [
            (s2, e2)
            for e2, u2, s2, k2, _v in rows
            if u2 == uid and k2 == "err" and s2 <= s
        ]
        want = max(cands)[1] if cands else None
        assert got[eid_l] == want, f"event {eid_l}"


def test_range_self_join_parity(spark):
    rng = random.Random(11)
    rows = [
        (i, rng.randrange(3), rng.randrange(0, 500), "e", 0.0) for i in range(120)
    ]
    ev = _events(spark, rows)
    out = range_self_join(
        ev, key="user_id", ts="ts", id_col="event_id", max_gap_sec=60.0
    )
    got = {(r["id_a"], r["id_b"], r["gap_us"]) for r in out.collect()}
    want = set()
    for a in rows:
        for b in rows:
            if a[1] != b[1]:
                continue
            if (a[2], a[0]) >= (b[2], b[0]):
                continue
            gap = (b[2] - a[2]) * 1_000_000
            if gap <= 60_000_000:
                want.add((a[0], b[0], gap))
    assert got == want and len(want) > 50


def test_range_join_no_duplicate_pairs(spark):
    # pair spanning a bucket boundary must appear exactly once
    rows = [(1, 1, 59, "e", 0.0), (2, 1, 61, "e", 0.0)]
    ev = _events(spark, rows)
    out = range_self_join(
        ev, key="user_id", ts="ts", id_col="event_id", max_gap_sec=60.0
    ).collect()
    assert len(out) == 1 and out[0]["gap_us"] == 2_000_000


def test_sessionize_batch_parity(spark):
    rng = random.Random(3)
    rows = [
        (i, rng.randrange(4), rng.randrange(0, 20000), "e", 1.5) for i in range(200)
    ]
    ev = _events(spark, rows)
    out = sessionize_batch(
        ev, key="user_id", ts="ts", id_col="event_id", gap_sec=600.0,
        value_col="value",
    )
    got = {
        (r["user_id"], r["session_id"]): (r["n_events"], r["start_us"], r["end_us"])
        for r in out.collect()
    }
    # brute-force sessions per user
    want = {}
    for uid in range(4):
        evs = sorted((s, i) for i, u, s, _, _ in rows if u == uid)
        sess, cur = [], []
        for s, i in evs:
            if cur and s - cur[-1][0] > 600:
                sess.append(cur)
                cur = []
            cur.append((s, i))
        if cur:
            sess.append(cur)
        for si, chunk in enumerate(sess, start=1):
            want[(uid, si)] = (
                len(chunk),
                chunk[0][0] * 1_000_000,
                chunk[-1][0] * 1_000_000,
            )
    # timestamps offset from epoch of BASE
    base_us = int(BASE.timestamp()) * 1_000_000  # session tz is UTC
    got_rel = {k: (n, s - base_us, e - base_us) for k, (n, s, e) in got.items()}
    assert got_rel == want


def test_sessionize_spans_equivalence_with_mega_key(spark):
    """Salt-span path (span_sec) must be row-identical to the unsalted
    window, including chained cross-span merges, on a skewed corpus where
    ONE key holds ~50% of all rows."""
    rng = random.Random(13)
    rows = []
    eid = 0
    # mega user 99: one event every ~200s over ~55h → long session chains
    # that cross many 1-hour spans (exercises transitive stitch merges)
    t = 0
    for _ in range(1000):
        eid += 1
        t += rng.randrange(1, 400)  # gaps mostly < 600 → sessions span spans
        rows.append((eid, 99, t, "e", rng.randrange(1, 100) / 4.0))
    for uid in range(5):
        for _ in range(200):
            eid += 1
            rows.append((eid, uid, rng.randrange(0, 200000), "e", 1.25))
    ev = _events(spark, rows)
    kw = dict(key="user_id", ts="ts", id_col="event_id", gap_sec=600.0,
              value_col="value")
    plain = sessionize_batch(ev, **kw)
    salted = sessionize_batch(ev, **kw, span_sec=3600.0)
    to_set = lambda df: {
        (r["user_id"], r["session_id"], r["n_events"], r["start_us"],
         r["end_us"], str(r["sum_value"]))
        for r in df.collect()
    }
    assert to_set(plain) == to_set(salted)
    # the mega key genuinely spreads: its rows land in many (key, span)
    # groups, i.e. many tasks under hash partitioning — not one.
    n_spans = (
        ev.filter(F.col("user_id") == 99)
        .select(F.floor(F.unix_micros(F.col("ts").cast("timestamp")) / 3_600_000_000).alias("s"))
        .distinct()
        .count()
    )
    assert n_spans > 10


def test_sessionize_spans_boundary_merge_exact(spark):
    """Two events straddling a span boundary within the gap must stitch into
    ONE session; just outside the gap must stay two."""
    # span = 100s; events at 95s and 105s (gap 10s ≤ 60) → one session
    rows = [(1, 1, 95, "e", 1.0), (2, 1, 105, "e", 2.0)]
    out = sessionize_batch(
        _events(spark, rows), key="user_id", ts="ts", id_col="event_id",
        gap_sec=60.0, value_col="value", span_sec=100.0,
    ).collect()
    assert len(out) == 1 and out[0]["n_events"] == 2
    assert str(out[0]["sum_value"]) == "3.00"
    rows = [(1, 1, 95, "e", 1.0), (2, 1, 199, "e", 2.0)]
    out = sessionize_batch(
        _events(spark, rows), key="user_id", ts="ts", id_col="event_id",
        gap_sec=60.0, value_col="value", span_sec=100.0,
    ).collect()
    assert sorted(r["session_id"] for r in out) == [1, 2]


def test_sessionize_single_event_sessions(spark):
    rows = [(1, 1, 0, "e", 2.0), (2, 1, 10000, "e", 3.0)]
    ev = _events(spark, rows)
    out = sessionize_batch(
        ev, key="user_id", ts="ts", id_col="event_id", gap_sec=60.0,
        value_col="value",
    ).collect()
    assert sorted((r["session_id"], r["n_events"], r["sum_value"]) for r in out) == [
        (1, 1, 2.0),
        (2, 1, 3.0),
    ]


def _asof_kwargs(ev):
    return dict(
        left=ev.filter(F.col("kind") == "click").select("event_id", "user_id", "ts"),
        right=ev.filter(F.col("kind") == "err").select(
            "user_id", "ts", "event_id", "value"
        ),
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_cols=["event_id", "value"],
        right_seq="event_id",
    )


def test_asof_spans_equivalence_with_mega_key(spark):
    """Span-salted asof (span_sec) must be row-identical to the unsalted
    window on a skewed corpus where ONE key holds ~60% of all rows and
    matches routinely live several spans back."""
    rng = random.Random(23)
    rows, eid = [], 0
    # mega user 99: dense clicks, SPARSE errors (long cross-span carries)
    t = 0
    for _ in range(900):
        eid += 1
        t += rng.randrange(1, 30)
        kind = "err" if rng.random() < 0.05 else "click"
        rows.append((eid, 99, t, kind, eid))
    # normal users, incl. one with no errors at all (all-null matches)
    for uid in range(4):
        for _ in range(50):
            eid += 1
            rows.append(
                (eid, uid, rng.randrange(0, 20000), rng.choice(["err", "click"]), eid)
            )
    ev = _events(spark, rows)
    kw = _asof_kwargs(ev)
    plain = asof_join(**kw)
    salted = asof_join(**kw, span_sec=600.0)  # mega key spans ~25 spans

    def to_map(df):
        return {
            r["event_id"]: (r["event_id_asof"], r["value_asof"]) for r in df.collect()
        }

    assert to_map(plain) == to_map(salted)


def test_asof_spans_cross_span_carry_and_ties(spark):
    """A left row whose only match is several EMPTY spans back must carry it
    in; same-ts ties inside the carried span resolve to max seq (identical
    to the unsalted rule)."""
    rows = [
        (1, 7, 10, "err", 1.0),
        (2, 7, 10, "err", 2.0),   # tie at ts=10 → max event_id wins
        (3, 7, 905, "click", 0.0),  # spans of 100s: match is ~8 spans back
        (4, 8, 905, "click", 0.0),  # user with no errors → null match
    ]
    ev = _events(spark, rows)
    out = asof_join(**_asof_kwargs(ev), span_sec=100.0).collect()
    got = {r["event_id"]: r["event_id_asof"] for r in out}
    assert got == {3: 2, 4: None}


def test_asof_spans_multiple_tasks_touch_mega_key(spark):
    """The salt actually spreads the mega key: with span_sec set, >1 span
    partition key exists for the hot user (the unsalted path would sort it
    in ONE window partition)."""
    rows = [(i, 1, i * 10, "click" if i % 3 else "err", i) for i in range(1, 400)]
    ev = _events(spark, rows)
    kw = _asof_kwargs(ev)
    l_sp = ev.filter(F.col("kind") == "click").select(
        "user_id", F.col("ts")
    )
    # count distinct span labels the operator derives for this key
    from nebula_importer_spark.operators.temporal import _us

    span_us = int(300.0 * 1_000_000)
    us = _us(F.col("ts"))
    n_spans = (
        ev.select((us - F.pmod(us, F.lit(span_us))).alias("_span"))
        .distinct()
        .count()
    )
    assert n_spans > 1
    # and the salted result still matches the unsalted one
    assert sorted(
        (r["event_id"], r["event_id_asof"])
        for r in asof_join(**kw, span_sec=300.0).collect()
    ) == sorted(
        (r["event_id"], r["event_id_asof"]) for r in asof_join(**kw).collect()
    )


def test_floor_div_us_exact_at_large_magnitude(spark):
    """Span/bucket labels must be exact integer floor division: at
    us = 10^18 - 1 the double path rounds to 10^18 and mislabels the row
    into the NEXT span (floor(double) = 10^12 vs exact 10^12 - 1)."""
    from nebula_importer_spark.operators.temporal import _floor_div_us

    vals = [10**18 - 1, 10**18, -(10**18) - 1, -1, 0, 999_999, 1_000_000]
    df = spark.createDataFrame([(v,) for v in vals], "_us long")
    got = [
        r[0]
        for r in df.select(_floor_div_us("_us", 1_000_000).alias("q")).collect()
    ]
    assert got == [v // 1_000_000 for v in vals]  # python // == floor


def test_auto_span_probe_decisions(spark):
    """The span_sec="auto" probe: small totals short-circuit on the count
    alone; a genuinely skewed corpus with a low threshold yields a span
    that splits the hot key into many time slices."""
    from nebula_importer_spark.operators.temporal import _auto_span_sec

    rows = [(i, i % 10, i * 7, "e", 1.0) for i in range(1, 500)]
    assert _auto_span_sec(_events(spark, rows), "user_id", "ts", 1000) is None

    # hot key 99: 1200 rows over 60000s; threshold 200 → must salt
    rows = [(i, 99, i * 50, "e", 1.0) for i in range(1, 1201)]
    rows += [(5000 + i, i % 5, i * 11, "e", 1.0) for i in range(100)]
    span = _auto_span_sec(_events(spark, rows), "user_id", "ts", 200)
    assert span is not None and 0 < span < 60000 / 2  # many spans, not one


def test_sessionize_auto_salts_mega_key_without_opt_in(spark):
    """Default span_sec="auto" + a skew_threshold the corpus trips: span
    salting engages with NO explicit span_sec, the plan carries the span
    label, and rows are identical to the forced-unsalted path."""
    rng = random.Random(13)
    rows, eid, t = [], 0, 0
    for _ in range(1000):
        eid += 1
        t += rng.randrange(1, 400)
        rows.append((eid, 99, t, "e", rng.randrange(1, 100) / 4.0))
    for uid in range(5):
        for _ in range(100):
            eid += 1
            rows.append((eid, uid, rng.randrange(0, 200000), "e", 1.25))
    ev = _events(spark, rows)
    kw = dict(key="user_id", ts="ts", id_col="event_id", gap_sec=600.0,
              value_col="value")
    auto = sessionize_batch(ev, **kw, skew_threshold=300)
    assert "_span" in auto._jdf.queryExecution().analyzed().toString()
    plain = sessionize_batch(ev, **kw, span_sec=None)
    to_set = lambda df: {
        (r["user_id"], r["session_id"], r["n_events"], r["start_us"],
         r["end_us"], str(r["sum_value"]))
        for r in df.collect()
    }
    assert to_set(auto) == to_set(plain)
    # and with the default 5M threshold the same call stays unsalted
    quiet = sessionize_batch(ev, **kw)
    assert "_span" not in quiet._jdf.queryExecution().analyzed().toString()


def test_asof_auto_salts_mega_key_without_opt_in(spark):
    """asof_join's default "auto" likewise engages span salting on a skewed
    corpus without explicit span_sec, row-identical to the unsalted path."""
    rng = random.Random(23)
    rows, eid, t = [], 0, 0
    for _ in range(900):
        eid += 1
        t += rng.randrange(1, 30)
        kind = "err" if rng.random() < 0.05 else "click"
        rows.append((eid, 99, t, kind, eid))
    for uid in range(4):
        for _ in range(50):
            eid += 1
            rows.append(
                (eid, uid, rng.randrange(0, 20000), rng.choice(["err", "click"]), eid)
            )
    ev = _events(spark, rows)
    kw = _asof_kwargs(ev)
    auto = asof_join(**kw, skew_threshold=150)
    assert "_span" in auto._jdf.queryExecution().analyzed().toString()
    plain = asof_join(**kw, span_sec=None)

    def to_map(df):
        return {
            r["event_id"]: (r["event_id_asof"], r["value_asof"]) for r in df.collect()
        }

    assert to_map(auto) == to_map(plain)


def test_auto_probe_null_timestamps_fall_back(spark):
    """A hottest key whose timestamps are all NULL must fall back to the
    unsalted window (review finding: int(None) crashed the probe)."""
    from nebula_importer_spark.operators.temporal import _auto_span_sec

    rows = [(i, 99, None) for i in range(400)] + [(1000 + i, i, i * 10) for i in range(20)]
    df = spark.createDataFrame(rows, "event_id long, user_id long, sec long").select(
        "event_id", "user_id",
        (F.timestamp_seconds(F.col("sec"))).alias("ts"),
    )
    assert _auto_span_sec(df, "user_id", "ts", 100) is None
    # and the default sessionize path over such data still builds + runs
    out = sessionize_batch(
        df, key="user_id", ts="ts", id_col="event_id", gap_sec=60.0,
        skew_threshold=100,
    )
    assert out.count() > 0


def test_asof_auto_probe_mixed_ts_types(spark):
    """asof_join with timestamp on one side and epoch-seconds long on the
    other is supported (_us casts per side); the auto probe's union must
    reconcile the types instead of raising (review finding)."""
    left = spark.createDataFrame(
        [(1, 7, 100), (2, 7, 200)], "event_id long, user_id long, sec long"
    ).select("event_id", "user_id", F.timestamp_seconds("sec").alias("ts"))
    right = spark.createDataFrame(
        [(10, 7, 50), (11, 7, 150)], "event_id long, user_id long, ts long"
    )  # ts stays LONG epoch seconds on this side
    out = asof_join(
        left, right, on="user_id", left_ts="ts", right_ts="ts",
        right_cols=["event_id"], right_seq="event_id",
    )
    got = {r["event_id"]: r["event_id_asof"] for r in out.collect()}
    assert got == {1: 10, 2: 11}


def _py_burst(rows, bucket_sec=3600, baseline=24, min_nonempty=6):
    from collections import Counter

    counts = Counter(
        (k, int(ts.timestamp()) // bucket_sec) for k, ts in rows
    )
    out = {}
    for (k, b), n in counts.items():
        prev = [
            counts[(k, pb)]
            for pb in range(b - baseline, b)
            if (k, pb) in counts
        ]
        if len(prev) < min_nonempty:
            continue
        total = sum(prev)
        out[(k, b)] = (n, total, n * baseline / total)
    return out


def test_burst_scores_matches_reference(spark):
    from nebula_importer_spark.operators.temporal import burst_scores

    rng = random.Random(17)
    rows = []
    for h in range(80):  # 80 hours, steady ~3/hour with gaps and one spike
        k = "click"
        n = 0 if h % 11 == 5 else rng.choice([1, 2, 3, 4])
        if h == 60:
            n = 40  # planted burst
        for i in range(n):
            rows.append((k, BASE + timedelta(hours=h, minutes=i % 60)))
    for h in range(0, 80, 2):  # sparser second key
        rows.append(("error", BASE + timedelta(hours=h, minutes=7)))
    df = spark.createDataFrame(rows, "event_type string, ts timestamp")
    got = {
        (r.event_type, r.bucket): (r.n_events, r.baseline_total, r.burst_score)
        for r in burst_scores(df).collect()
    }
    want = _py_burst(rows)
    assert got == want
    # the planted spike is the top burst
    top = max(got.items(), key=lambda kv: kv[1][2])
    assert top[0][0] == "click" and top[1][0] == 40 and top[1][2] > 10


def test_burst_scores_range_frame_counts_gaps(spark):
    from nebula_importer_spark.operators.temporal import burst_scores

    # 6 busy hours, a 17-hour gap, then 1 event: the baseline must still
    # see the 6 busy buckets through the gap (RANGE frame), giving a LOW
    # burst score — a ROWS frame over nonempty buckets gives the same
    # baseline here, but the score must divide by the full 24-bucket width
    rows = []
    for h in range(6):
        for i in range(10):
            rows.append(("k", BASE + timedelta(hours=h, minutes=i)))
    rows.append(("k", BASE + timedelta(hours=23)))
    df = spark.createDataFrame(rows, "event_type string, ts timestamp")
    got = {r.bucket: r for r in burst_scores(df).collect()}
    b0 = int(BASE.timestamp()) // 3600
    assert set(got) == {b0 + 23}
    r = got[b0 + 23]
    assert (r.n_events, r.baseline_total) == (1, 60)
    assert r.burst_score == 1 * 24 / 60  # mean-rate baseline, zeros counted


def test_burst_scores_warmup_and_validation(spark):
    from nebula_importer_spark.operators.temporal import burst_scores

    rows = [("k", BASE + timedelta(hours=h)) for h in range(4)]
    df = spark.createDataFrame(rows, "event_type string, ts timestamp")
    # only 3 nonempty baseline buckets ever precede a row → all warm-up
    assert burst_scores(df).count() == 0
    assert burst_scores(df, min_baseline_buckets=2).count() == 2
    with pytest.raises(ValueError, match="bucket_sec"):
        burst_scores(df, bucket_sec=0)
    with pytest.raises(ValueError, match="min_baseline_buckets"):
        burst_scores(df, baseline_buckets=4, min_baseline_buckets=5)


# ---------------------------------------------------------------------------
# time_weighted_avg
# ---------------------------------------------------------------------------


def test_twa_step_integral_exact(spark):
    import datetime as dt

    from nebula_importer_spark.operators.temporal import time_weighted_avg

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def at(s):
        return t0 + dt.timedelta(seconds=s)

    rows = [
        # user 1: value 10.00 holds 10s, then 20.00 holds 30s
        # TWA = (1000*10 + 2000*30)/40 cents = 1750 -> 17.50
        (1, 1, at(0), 10.00),
        (1, 2, at(10), 20.00),
        (1, 3, at(40), 99.99),   # final observation: no interval after it
        # user 2: single observation -> absent
        (2, 4, at(0), 5.00),
        # user 3: all same second -> span 0 -> absent
        (3, 5, at(0), 1.00),
        (3, 6, at(0), 2.00),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, value double"
    )
    got = {
        r.user_id: (r.n_intervals, r.span_sec, r.twa_scaled)
        for r in time_weighted_avg(df).collect()
    }
    assert got == {1: (2, 40, 17_500_000)}  # 17.50 in 10^6 scale


def test_twa_burst_vs_plain_avg(spark):
    import datetime as dt

    from nebula_importer_spark.operators.temporal import time_weighted_avg

    t0 = dt.datetime(2024, 1, 1)
    # 10 burst samples of 100.00 in 10s, then 0.00 holding 990s:
    # plain AVG ~ 90.9; TWA ~ 1.0 (the burst is 1% of the span)
    rows = [(1, i, t0 + dt.timedelta(seconds=i), 100.00) for i in range(10)]
    rows += [(1, 10, t0 + dt.timedelta(seconds=10), 0.00),
             (1, 11, t0 + dt.timedelta(seconds=1000), 0.00)]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, value double"
    )
    r = time_weighted_avg(df).collect()[0]
    assert r.span_sec == 1000
    assert r.twa_scaled == 1_000_000  # exactly 1.00
    with pytest.raises(ValueError):
        time_weighted_avg(df, value_decimals=-1)


# ---------------------------------------------------------------------------
# resample_locf — gap-filled regular grid with last-observation-carried-forward


def _locf_model(rows, step):
    """Python model: rows = (event_id, user_id, sec_offset, value)."""
    from collections import defaultdict

    by_key = defaultdict(list)
    for eid, uid, s, v in rows:
        by_key[uid].append((s, eid, v))
    out = []
    for uid, obs in by_key.items():
        # survivor per bucket = greatest (ts, id)
        per_bucket = {}
        for s, eid, v in obs:
            b = (s // step) * step
            cur = per_bucket.get(b)
            if cur is None or (s, eid) > (cur[0], cur[1]):
                per_bucket[b] = (s, eid, v)
        lo, hi = min(per_bucket), max(per_bucket)
        last = None
        for b in range(lo, hi + step, step):
            if b in per_bucket:
                last = per_bucket[b][2]
                out.append((uid, b, last, False))
            else:
                out.append((uid, b, last, True))
    return sorted(out)


def test_resample_locf_basic_and_random(spark):
    from nebula_importer_spark.operators.temporal import resample_locf

    rng = random.Random(7)
    rows = []
    eid = 0
    for uid in range(1, 6):
        for _ in range(rng.randint(1, 30)):
            eid += 1
            rows.append((eid, uid, rng.randint(0, 50_000), round(rng.uniform(0, 9), 2)))
    # duplicate-timestamp pair: id tiebreak must pick eid 9001
    rows += [(9000, 99, 1000, 1.5), (9001, 99, 1000, 2.5), (9002, 99, 9000, 7.0)]
    df = _events(spark, [(e, u, s, "x", v) for e, u, s, v in rows])
    got = sorted(
        (
            r.user_id,
            int(r.bucket_ts.timestamp()) - int(BASE.timestamp()),
            r.value,
            r.is_gap,
        )
        for r in resample_locf(df, step_sec=3600).collect()
    )
    base = int(BASE.timestamp())
    want = sorted(
        (u, b - base, v, g)
        for u, b, v, g in _locf_model(
            [(e, u, s + base, v) for e, u, s, v in rows], 3600
        )
    )
    assert got == want


def test_resample_locf_single_obs_and_gap_flag(spark):
    from nebula_importer_spark.operators.temporal import resample_locf

    df = _events(spark, [(1, 1, 0, "x", 3.25), (2, 1, 7200, "x", 4.5)])
    out = {
        (int(r.bucket_ts.timestamp()) - int(BASE.timestamp())): (r.value, r.is_gap)
        for r in resample_locf(df, step_sec=3600).collect()
    }
    # BASE is hour-aligned → buckets 0, 3600, 7200
    assert out == {0: (3.25, False), 3600: (3.25, True), 7200: (4.5, False)}


def test_resample_locf_span_guard_and_validation(spark):
    from nebula_importer_spark.operators.temporal import resample_locf

    df = _events(spark, [(1, 1, 0, "x", 1.0), (2, 1, 500_000, "x", 2.0)])
    with pytest.raises(Exception, match="max_span_buckets"):
        resample_locf(df, step_sec=1, max_span_buckets=10).collect()
    with pytest.raises(ValueError, match="step_sec"):
        resample_locf(df, step_sec=0)
    with pytest.raises(ValueError, match="not in input"):
        resample_locf(df.drop("value"))


# ------------------------------------------------------------ cusum_change


def _cusum_model(buckets: dict[int, int]):
    """Pure-Python CUSUM recursions over the dense bucket grid."""
    lo, hi = min(buckets), max(buckets)
    nb = hi - lo + 1
    total = sum(buckets.values())
    sp = sm = 0
    best_up = (0, lo)
    best_dn = (0, lo)
    for b in range(lo, hi + 1):
        d = nb * buckets.get(b, 0) - total
        sp = max(0, sp + d)
        sm = max(0, sm - d)
        if sp > best_up[0]:
            best_up = (sp, b)
        if sm > best_dn[0]:
            best_dn = (sm, b)
    return nb, total, best_up, best_dn


def test_cusum_detects_step_change(spark):
    import datetime

    from nebula_importer_spark.operators.temporal import cusum_change

    # 1/bucket for 20 buckets, then 5/bucket for 20: sustained upward shift
    rows = []
    t0 = datetime.datetime(2024, 1, 1)
    for b in range(40):
        for j in range(1 if b < 20 else 5):
            rows.append(("svc", t0 + datetime.timedelta(hours=b, minutes=j)))
    df = spark.createDataFrame(rows, "event_type string, ts timestamp")
    r = cusum_change(df, bucket_sec=3600).collect()[0]
    model_nb, model_total, up, dn = _cusum_model(
        {473352 + b: (1 if b < 20 else 5) for b in range(40)}
    )
    assert (r.n_buckets, r.total_events) == (model_nb, model_total)
    assert (r.up_stat, r.up_bucket - 473352) == (up[0], up[1] - 473352)
    # the upward change peaks at the END of the raised run
    assert r.up_bucket - 473352 == 39
    assert r.up_ppm > 0


def test_cusum_randomized_parity(spark):
    import datetime
    import random

    from nebula_importer_spark.operators.temporal import cusum_change

    rng = random.Random(7)
    t0 = datetime.datetime(2024, 3, 1)
    rows, model_in = [], {}
    for key in ("a", "b"):
        buckets = {}
        for b in sorted(rng.sample(range(60), 25)):
            n = rng.randint(1, 6)
            buckets[b] = n
            for j in range(n):
                rows.append(
                    (key, t0 + datetime.timedelta(hours=b, seconds=j))
                )
        base = int(t0.replace(tzinfo=datetime.timezone.utc).timestamp()) // 3600
        model_in[key] = {base + b: n for b, n in buckets.items()}
    df = spark.createDataFrame(rows, "event_type string, ts timestamp")
    got = {r.event_type: r for r in cusum_change(df, bucket_sec=3600).collect()}
    for key in ("a", "b"):
        nb, total, up, dn = _cusum_model(model_in[key])
        r = got[key]
        assert (r.n_buckets, r.total_events) == (nb, total), key
        assert (r.up_stat, r.up_bucket) == up, key
        assert (r.down_stat, r.down_bucket) == dn, key


def test_cusum_flat_key_zero_stats(spark):
    import datetime

    from nebula_importer_spark.operators.temporal import cusum_change

    t0 = datetime.datetime(2024, 1, 1)
    rows = [("flat", t0 + datetime.timedelta(hours=b)) for b in range(10)]
    df = spark.createDataFrame(rows, "event_type string, ts timestamp")
    r = cusum_change(df, bucket_sec=3600).collect()[0]
    assert r.up_stat == 0 and r.down_stat == 0
    assert r.up_ppm == 0 and r.down_ppm == 0


def test_cusum_span_guard_and_validation(spark):
    import datetime

    import pytest

    from nebula_importer_spark.operators.temporal import cusum_change

    t0 = datetime.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [("k", t0), ("k", t0 + datetime.timedelta(hours=500))],
        "event_type string, ts timestamp",
    )
    with pytest.raises(Exception, match="max_span_buckets"):
        cusum_change(df, bucket_sec=3600, max_span_buckets=100).collect()
    with pytest.raises(ValueError):
        cusum_change(df, bucket_sec=0)
    with pytest.raises(ValueError):
        cusum_change(df, key_col="missing")


# -------------------------------------------------------------- max_concurrent


def _sweep_model(intervals):
    """Pure-Python sweep: max concurrency + earliest peak instant."""
    ev = []
    for s, e in intervals:
        ev.append((s, 1))
        ev.append((e, -1))
    ev.sort()  # (t, delta): -1 before +1 at equal t = half-open semantics
    cur = best = 0
    at = None
    for t, d in ev:
        cur += d
        if cur > best:
            best, at = cur, t
    return len(intervals), best, at


def test_max_concurrent_hand_case(spark):
    from nebula_importer_spark.operators.temporal import max_concurrent

    iv = [(0, 10), (5, 15), (10, 20), (12, 13)]
    df = spark.createDataFrame(iv, "s long, e long")
    r = max_concurrent(df, start_col="s", end_col="e").collect()[0]
    # [0,10) and [10,20) do NOT overlap (half-open); peak = 3 at t=12
    assert (r.n_intervals, r.max_concurrent, r.at_ts) == (4, 3, 12)


def test_max_concurrent_half_open_boundary(spark):
    from nebula_importer_spark.operators.temporal import max_concurrent

    df = spark.createDataFrame([(0, 5), (5, 10)], "s long, e long")
    r = max_concurrent(df, start_col="s", end_col="e").collect()[0]
    assert r.max_concurrent == 1


def test_max_concurrent_randomized_vs_model(spark):
    import random

    from nebula_importer_spark.operators.temporal import max_concurrent

    rng = random.Random(23)
    for n_buckets in (4, 64):
        iv = []
        for _ in range(300):
            s = rng.randrange(10_000)
            iv.append((s, s + rng.randrange(0, 500)))
        df = spark.createDataFrame(iv, "s long, e long")
        r = max_concurrent(
            df, start_col="s", end_col="e", n_buckets=n_buckets
        ).collect()[0]
        assert (r.n_intervals, r.max_concurrent, r.at_ts) == _sweep_model(iv)


def test_max_concurrent_grouped(spark):
    from nebula_importer_spark.operators.temporal import max_concurrent

    df = spark.createDataFrame(
        [("a", 0, 10), ("a", 1, 9), ("b", 0, 1)],
        "g string, s long, e long",
    )
    r = {x.g: x for x in max_concurrent(
        df, start_col="s", end_col="e", group_cols=["g"]
    ).collect()}
    assert r["a"].max_concurrent == 2 and r["a"].at_ts == 1
    assert r["b"].max_concurrent == 1


def test_max_concurrent_validation(spark):
    import pytest

    from nebula_importer_spark.operators.temporal import max_concurrent

    df = spark.createDataFrame([(1, 5)], "s long, e long")
    with pytest.raises(ValueError, match="not in input"):
        max_concurrent(df, start_col="missing", end_col="e")
    f = spark.createDataFrame([(1.5, 5.0)], "s double, e double")
    with pytest.raises(ValueError, match="integral"):
        max_concurrent(f, start_col="s", end_col="e")
    inv = spark.createDataFrame([(5, 1)], "s long, e long")
    with pytest.raises(ValueError, match="inverted"):
        max_concurrent(inv, start_col="s", end_col="e")


# --- autocorrelation -------------------------------------------------------


def _acf_model(xs: list[int], max_lag: int, scale: int = 1_000_000):
    """Exact integer model of the cleared-denominator sample ACF."""
    n, s = len(xs), sum(xs)
    c = [n * x - s for x in xs]
    den = sum(v * v for v in c)
    out = []
    for k in range(1, max_lag + 1):
        pairs = [(c[t], c[t + k]) for t in range(n - k)] if k < n else []
        num = sum(a * b for a, b in pairs) if pairs else None
        micro = None
        if den > 0 and num is not None:
            q = scale * num
            micro = abs(q) // den * (1 if q >= 0 else -1)  # trunc toward 0
        out.append((k, len(pairs), num, den, micro, n))
    return out


def _acf_events(spark, hours_counts):
    rows = []
    eid = 0
    for h, cnt in hours_counts:
        for _ in range(cnt):
            rows.append((eid, datetime(2024, 1, 1, h, 30)))
            eid += 1
    return spark.createDataFrame(rows, "event_id long, ts timestamp")


def test_acf_hand_case(spark):
    from nebula_importer_spark.operators.temporal import autocorrelation

    # hourly counts [1, 2, 3, 2] — alternating-ish, lag-1 r < 0 at lag 2
    df = _acf_events(spark, [(0, 1), (1, 2), (2, 3), (3, 2)])
    got = [
        (r.lag, r.n_pairs, r.num_scaled, r.den_scaled, r.acf_micro,
         r.n_buckets)
        for r in autocorrelation(df, ts_col="ts", max_lag=3).collect()
    ]
    want = [t[:6] for t in _acf_model([1, 2, 3, 2], 3)]
    assert got == want


def test_acf_densifies_missing_buckets_to_zero(spark):
    from nebula_importer_spark.operators.temporal import autocorrelation

    # events only in hours 0 and 2 -> series [2, 0, 1]
    df = _acf_events(spark, [(0, 2), (2, 1)])
    got = [
        (r.lag, r.n_pairs, r.num_scaled, r.den_scaled, r.acf_micro)
        for r in autocorrelation(df, ts_col="ts", max_lag=2).collect()
    ]
    want = [t[:5] for t in _acf_model([2, 0, 1], 2)]
    assert got == want
    assert got[0][4] is not None and got[0][4] < 0  # zero-gap anticorrelates


def test_acf_lag_past_series_end_is_empty_pair_set(spark):
    from nebula_importer_spark.operators.temporal import autocorrelation

    df = _acf_events(spark, [(0, 1), (1, 3)])
    rows = {r.lag: r for r in
            autocorrelation(df, ts_col="ts", max_lag=4).collect()}
    assert rows[3].n_pairs == 0 and rows[3].num_scaled is None
    assert rows[3].acf_micro is None


def test_acf_constant_series_null_micro(spark):
    from nebula_importer_spark.operators.temporal import autocorrelation

    # constant series: den = 0 -> acf undefined (NULL), not a div crash
    df = _acf_events(spark, [(0, 2), (1, 2), (2, 2)])
    for r in autocorrelation(df, ts_col="ts", max_lag=2).collect():
        assert r.den_scaled == 0 and r.acf_micro is None


def test_acf_null_ts_counted_and_empty_input(spark):
    from nebula_importer_spark.operators.temporal import autocorrelation

    df = spark.createDataFrame(
        [(1, datetime(2024, 1, 1, 0)), (2, None), (3, None)],
        "event_id long, ts timestamp",
    )
    rows = autocorrelation(df, ts_col="ts", max_lag=1).collect()
    assert rows[0].n_null == 2 and rows[0].n_buckets == 1
    empty = spark.createDataFrame([], "event_id long, ts timestamp")
    assert autocorrelation(empty, ts_col="ts").count() == 0


def test_acf_randomized_vs_model(spark):
    from nebula_importer_spark.operators.temporal import autocorrelation

    rng = random.Random(77)
    hours_counts = [(h, rng.randint(0, 5)) for h in range(12)]
    xs_by_hour = dict(hours_counts)
    lo = min(h for h, c in hours_counts if c > 0)
    hi = max(h for h, c in hours_counts if c > 0)
    xs = [xs_by_hour.get(h, 0) for h in range(lo, hi + 1)]
    df = _acf_events(spark, [(h, c) for h, c in hours_counts if c > 0])
    got = [
        (r.lag, r.n_pairs, r.num_scaled, r.den_scaled, r.acf_micro,
         r.n_buckets)
        for r in autocorrelation(df, ts_col="ts", max_lag=5).collect()
    ]
    want = [t[:6] for t in _acf_model(xs, 5)]
    assert got == want


def test_acf_validation(spark):
    from nebula_importer_spark.operators.temporal import autocorrelation

    df = spark.createDataFrame([(1,)], "event_id long")
    with pytest.raises(ValueError):
        autocorrelation(df, ts_col="ts")
    df2 = spark.createDataFrame([(datetime(2024, 1, 1),)], "ts timestamp")
    with pytest.raises(ValueError):
        autocorrelation(df2, ts_col="ts", max_lag=0)
    with pytest.raises(ValueError):
        autocorrelation(df2, ts_col="ts", bucket_sec=0)
    with pytest.raises(ValueError):
        autocorrelation(df2, ts_col="ts", scale=0)


# --- seasonal_profile ------------------------------------------------------


def _seasonal_model(xs, lo, period, n_null=0, scale=1_000_000):
    """Python model over the dense series xs starting at bucket lo."""
    def trunc_div(x, y):
        q, r = divmod(x, y)
        if q < 0 and r != 0:
            q += 1
        return q

    n, s = len(xs), sum(xs)
    per = {}
    for t, x in enumerate(xs):
        b = lo + t
        p = b % period
        np_, sp, pk = per.get(p, (0, 0, None))
        per[p] = (np_ + 1, sp + x, pk)
    out = {}
    for p, (np_, sp, _) in per.items():
        best = None
        for t, x in enumerate(xs):
            b = lo + t
            if b % period != p:
                continue
            e = x * np_ - sp
            if best is None or e > best[0] or (e == best[0] and b < best[1]):
                best = (e, b)
        ppm = trunc_div(sp * n * scale, np_ * s) if s > 0 else None
        out[p] = (
            np_, sp, trunc_div(sp * 1000, np_), ppm, best[0], best[1],
            n_null,
        )
    return out


def test_seasonal_profile_hand_case(spark):
    from nebula_importer_spark.operators.temporal import seasonal_profile

    # 6 hourly buckets, period 3: phases see [1,4], [2,0], [3,5]
    df = _acf_events(
        spark, [(0, 1), (1, 2), (2, 3), (3, 4), (5, 5)]
    )  # hour 4 empty -> densified 0
    got = {
        r.phase: (r.n_buckets, r.total, r.mean_milli, r.seasonal_ppm,
                  r.peak_excess, r.peak_bucket, r.n_null)
        for r in seasonal_profile(df, ts_col="ts", period=3).collect()
    }
    lo = 473352  # hours since epoch of 2024-01-01 00:00
    want = _seasonal_model([1, 2, 3, 4, 0, 5], lo, 3)
    assert got == want


def test_seasonal_profile_flat_series_is_1x(spark):
    from nebula_importer_spark.operators.temporal import seasonal_profile

    df = _acf_events(spark, [(h, 2) for h in range(6)])
    rows = seasonal_profile(df, ts_col="ts", period=2).collect()
    assert all(r.seasonal_ppm == 1_000_000 for r in rows)
    assert all(r.peak_excess == 0 for r in rows)


def test_seasonal_profile_randomized_vs_model(spark):
    import random

    from nebula_importer_spark.operators.temporal import seasonal_profile

    rng = random.Random(123)
    hc = [(h, rng.randint(0, 4)) for h in range(18)]
    present = [h for h, c in hc if c > 0]
    lo_h, hi_h = min(present), max(present)
    xs = [dict(hc).get(h, 0) for h in range(lo_h, hi_h + 1)]
    df = _acf_events(spark, [(h, c) for h, c in hc if c > 0])
    got = {
        r.phase: (r.n_buckets, r.total, r.mean_milli, r.seasonal_ppm,
                  r.peak_excess, r.peak_bucket, r.n_null)
        for r in seasonal_profile(df, ts_col="ts", period=5).collect()
    }
    want = _seasonal_model(xs, 473352 + lo_h, 5)
    assert got == want


def test_seasonal_profile_null_ts_and_empty(spark):
    from nebula_importer_spark.operators.temporal import seasonal_profile

    df = spark.createDataFrame(
        [(1, datetime(2024, 1, 1, 0)), (2, None)],
        "event_id long, ts timestamp",
    )
    rows = seasonal_profile(df, ts_col="ts", period=4).collect()
    assert len(rows) == 1 and rows[0].n_null == 1
    empty = spark.createDataFrame([], "event_id long, ts timestamp")
    assert seasonal_profile(empty, ts_col="ts").count() == 0


def test_seasonal_profile_validation(spark):
    from nebula_importer_spark.operators.temporal import seasonal_profile

    df = spark.createDataFrame([(datetime(2024, 1, 1),)], "ts timestamp")
    with pytest.raises(ValueError):
        seasonal_profile(df, ts_col="nope")
    with pytest.raises(ValueError):
        seasonal_profile(df, ts_col="ts", period=1)
    with pytest.raises(ValueError):
        seasonal_profile(df, ts_col="ts", bucket_sec=0)
    with pytest.raises(ValueError):
        seasonal_profile(df, ts_col="ts", scale=0)


def _py_trend(rows, bucket_sec, keys_idx=0):
    """Integer model: global grid, per-key cleared-denominator OLS."""
    from collections import defaultdict

    buckets = defaultdict(int)
    n_null = 0
    for k, ts in rows:
        if ts is None:
            n_null += 1
            continue
        buckets[(k, ts // bucket_sec)] += 1
    if not buckets:
        return {}, 0
    mn = min(i for _, i in buckets)
    mx = max(i for _, i in buckets)
    t = mx - mn + 1
    sx = t * (t - 1) // 2
    sxx = (t - 1) * t * (2 * t - 1) // 6
    den = t * sxx - sx * sx
    per = defaultdict(lambda: [0, 0, 0, 0])  # n_obs, sy, sxy, syy
    for (k, i), y in buckets.items():
        x = i - mn
        p = per[k]
        p[0] += 1
        p[1] += y
        p[2] += x * y
        p[3] += y * y
    out = {}
    for k, (n_obs, sy, sxy, syy) in per.items():
        num = t * sxy - sx * sy
        inum = sy * sxx - sx * sxy
        yvar = t * syy - sy * sy
        r2den = den * yvar
        def tdiv(a, b):
            q = abs(a) // abs(b)
            return q if (a >= 0) == (b > 0) else -q
        out[k] = {
            "n_buckets": t,
            "n_obs": n_obs,
            "sum_y": sy,
            "slope_micro": tdiv(10**6 * num, den) if den > 0 else None,
            "intercept_micro": tdiv(10**6 * inum, den) if den > 0 else None,
            "r2_micro": tdiv(10**6 * num * num, r2den) if r2den > 0 else None,
        }
    return out, n_null


def _trend_df(spark, rows):
    from datetime import datetime, timezone

    data = [
        (
            k,
            datetime.fromtimestamp(ts, tz=timezone.utc).replace(tzinfo=None)
            if ts is not None
            else None,
        )
        for k, ts in rows
    ]
    return spark.createDataFrame(data, "k string, ts timestamp")


def test_trend_fit_exact_line(spark):
    from nebula_importer_spark.operators.temporal import trend_fit

    # key "up": counts 1,2,3,4 per hour -> slope exactly 1.0/bucket, r2=1
    rows = []
    for h in range(4):
        for _ in range(h + 1):
            rows.append(("up", 3600 * h + 7))
    got = {
        r["k"]: r.asDict()
        for r in trend_fit(
            _trend_df(spark, rows), ts_col="ts", key_cols=["k"]
        ).collect()
    }
    u = got["up"]
    assert u["n_buckets"] == 4 and u["n_obs"] == 4 and u["sum_y"] == 10
    assert u["slope_micro"] == 1_000_000
    assert u["intercept_micro"] == 1_000_000
    assert u["r2_micro"] == 1_000_000
    assert u["n_null"] == 0


def test_trend_fit_constant_and_single_bucket(spark):
    from nebula_importer_spark.operators.temporal import trend_fit

    # constant series: slope 0, r2 NULL (zero variance)
    rows = [("c", 3600 * h) for h in range(5)]
    got = {
        r["k"]: r.asDict()
        for r in trend_fit(
            _trend_df(spark, rows), ts_col="ts", key_cols=["k"]
        ).collect()
    }
    c = got["c"]
    assert c["slope_micro"] == 0 and c["r2_micro"] is None
    # single global bucket: den == 0 -> slope/intercept NULL
    rows1 = [("a", 10), ("a", 20), ("b", 30)]
    got1 = {
        r["k"]: r.asDict()
        for r in trend_fit(
            _trend_df(spark, rows1), ts_col="ts", key_cols=["k"]
        ).collect()
    }
    assert got1["a"]["slope_micro"] is None
    assert got1["a"]["n_buckets"] == 1


def test_trend_fit_sparse_key_zero_buckets_count(spark):
    from nebula_importer_spark.operators.temporal import trend_fit

    # key "s" appears only in bucket 0 while the global grid spans 3
    # buckets (key "w" extends it) — zero buckets pull s's slope negative
    rows = [("s", 100), ("s", 200), ("w", 3600 * 2 + 5)]
    got = {
        r["k"]: r.asDict()
        for r in trend_fit(
            _trend_df(spark, rows), ts_col="ts", key_cols=["k"]
        ).collect()
    }
    s = got["s"]
    assert s["n_buckets"] == 3 and s["n_obs"] == 1 and s["sum_y"] == 2
    # model: T=3, sx=3, sxx=5, den=3*5-9=6; sxy=0, sy=2
    # num = 3*0-3*2 = -6 -> slope = -1.0 exactly
    assert s["slope_micro"] == -1_000_000
    expect, _ = _py_trend(rows, 3600)
    for k, e in expect.items():
        g = got[k]
        for f, v in e.items():
            assert g[f] == v, (k, f)


def test_trend_fit_null_ts_and_empty(spark):
    from nebula_importer_spark.operators.temporal import trend_fit

    rows = [("a", 0), ("a", 3600), ("a", None), ("b", None)]
    out = trend_fit(_trend_df(spark, rows), ts_col="ts", key_cols=["k"])
    got = {r["k"]: r.asDict() for r in out.collect()}
    assert set(got) == {"a"}  # null-only keys vanish from the fit
    assert got["a"]["n_null"] == 2
    empty = trend_fit(
        _trend_df(spark, [("a", None)]), ts_col="ts", key_cols=["k"]
    )
    assert empty.count() == 0


def test_trend_fit_random_parity(spark):
    import random

    from nebula_importer_spark.operators.temporal import trend_fit

    rng = random.Random(424242)
    rows = []
    for _ in range(400):
        k = f"k{rng.randrange(4)}"
        ts = rng.randrange(0, 3600 * 12) if rng.random() > 0.05 else None
        rows.append((k, ts))
    expect, n_null = _py_trend(rows, 3600)
    got = {
        r["k"]: r.asDict()
        for r in trend_fit(
            _trend_df(spark, rows).repartition(7),
            ts_col="ts",
            key_cols=["k"],
        ).collect()
    }
    assert set(got) == set(expect)
    for k, e in expect.items():
        g = got[k]
        assert g["n_null"] == n_null
        for f, v in e.items():
            assert g[f] == v, (k, f, g[f], v)


def test_trend_fit_validation(spark):
    from nebula_importer_spark.operators.temporal import trend_fit

    df = _trend_df(spark, [("a", 0)])
    with pytest.raises(ValueError, match="not in input"):
        trend_fit(df, ts_col="zzz", key_cols=["k"])
    with pytest.raises(ValueError, match="key_cols"):
        trend_fit(df, ts_col="ts", key_cols=[])
    with pytest.raises(ValueError, match="not in input"):
        trend_fit(df, ts_col="ts", key_cols=["zzz"])
    with pytest.raises(ValueError, match="bucket_sec"):
        trend_fit(df, ts_col="ts", key_cols=["k"], bucket_sec=0)
    with pytest.raises(ValueError, match="scale"):
        trend_fit(df, ts_col="ts", key_cols=["k"], scale=0)


def _py_coverage(rows):
    from collections import defaultdict

    by_key = defaultdict(list)
    for k, s, e in rows:
        by_key[k].append((s, e))
    out = {}
    for k, iv in by_key.items():
        iv.sort()
        segs = []
        for s, e in iv:
            if segs and s <= segs[-1][1]:
                segs[-1][1] = max(segs[-1][1], e)
            else:
                segs.append([s, e])
        out[k] = (
            len(iv),
            len(segs),
            sum(e - s for s, e in segs),
            max(e for _, e in iv) - min(s for s, _ in iv),
        )
    return out


def test_interval_coverage_merge_and_gaps(spark):
    from nebula_importer_spark.operators.temporal import interval_coverage

    rows = [
        ("u1", 0, 10),
        ("u1", 5, 15),    # overlaps -> one segment [0,15)
        ("u1", 20, 30),   # gap -> second segment
        ("u1", 30, 35),   # touching (start == prev end) merges
        ("u2", 0, 0),     # zero-length: kept, contributes 0
    ]
    df = spark.createDataFrame(rows, "k string, s long, e long")
    got = {
        r.key: (r.n_intervals, r.n_segments, r.covered, r.span)
        for r in interval_coverage(
            df, key_col="k", start_col="s", end_col="e"
        ).collect()
    }
    assert got["u1"] == (4, 2, 30, 35)
    assert got["u2"] == (1, 1, 0, 0)
    assert got == _py_coverage(rows)


def test_interval_coverage_random_parity(spark):
    import random

    from nebula_importer_spark.operators.temporal import interval_coverage

    rng = random.Random(404)
    rows = []
    for _ in range(400):
        k = f"u{rng.randrange(6)}"
        s = rng.randrange(0, 1000)
        rows.append((k, s, s + rng.randrange(0, 60)))
    df = spark.createDataFrame(
        rows, "k string, s long, e long"
    ).repartition(7)
    got = {
        r.key: (r.n_intervals, r.n_segments, r.covered, r.span)
        for r in interval_coverage(
            df, key_col="k", start_col="s", end_col="e"
        ).collect()
    }
    assert got == _py_coverage(rows)


def test_interval_coverage_validation(spark):
    from nebula_importer_spark.operators.temporal import interval_coverage

    df = spark.createDataFrame([("k", 1, 2)], "k string, s long, e long")
    with pytest.raises(ValueError, match="not in input"):
        interval_coverage(df, key_col="zzz", start_col="s", end_col="e")
    inv = spark.createDataFrame([("k", 5, 2)], "k string, s long, e long")
    with pytest.raises(ValueError, match="end >= start"):
        interval_coverage(inv, key_col="k", start_col="s", end_col="e")
    nul = spark.createDataFrame(
        [(None, 1, 2)], "k string, s long, e long"
    )
    with pytest.raises(ValueError, match="non-null"):
        interval_coverage(nul, key_col="k", start_col="s", end_col="e")


def _py_theil_sen(rows, bucket_sec=3600, scale=10**6):
    from collections import defaultdict

    def tdiv(a, b):
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b > 0) else -q

    buckets = defaultdict(int)
    n_null = 0
    for k, ts in rows:
        if ts is None:
            n_null += 1
        else:
            buckets[(k, ts // bucket_sec)] += 1
    per = defaultdict(list)
    for (k, i), y in buckets.items():
        per[k].append((i, y))
    out = {}
    for k, pts in per.items():
        pts.sort()
        slopes = []
        for ii in range(len(pts)):
            for jj in range(ii + 1, len(pts)):
                (xi, yi), (xj, yj) = pts[ii], pts[jj]
                num, den = yj - yi, xj - xi
                wh = num // den  # floor (den > 0)
                fr = (num - wh * den) * 10**18 // den
                slopes.append((wh, fr))
        slopes.sort()
        if slopes:
            wh, fr = slopes[(len(slopes) - 1) // 2]
            out[k] = (
                len(pts), len(slopes),
                wh * scale + fr // (10**18 // scale), n_null,
            )
        else:
            out[k] = (len(pts), 0, None, n_null)
    return out


def test_theil_sen_robust_to_burst(spark):
    from nebula_importer_spark.operators.temporal import theil_sen_trend

    # steady 2/hour for 9 hours + a 50-event burst in hour 4:
    # OLS would bend; the pairwise-slope median stays ~0
    rows = []
    for h in range(9):
        n = 50 if h == 4 else 2
        rows.extend([("k", 3600 * h + 5)] * n)
    got = {
        r["k"]: r.asDict()
        for r in theil_sen_trend(
            _trend_df(spark, rows), ts_col="ts", key_cols=["k"]
        ).collect()
    }
    k = got["k"]
    assert k["n_obs"] == 9 and k["n_pairs"] == 36
    assert k["slope_micro"] == 0
    expect = _py_theil_sen(rows)
    assert (
        k["n_obs"], k["n_pairs"], k["slope_micro"], k["n_null"]
    ) == expect["k"]


def test_theil_sen_single_bucket_and_nulls(spark):
    from nebula_importer_spark.operators.temporal import theil_sen_trend

    rows = [("a", 10), ("a", 20), ("a", None), ("b", 5), ("b", 7200)]
    got = {
        r["k"]: r.asDict()
        for r in theil_sen_trend(
            _trend_df(spark, rows), ts_col="ts", key_cols=["k"]
        ).collect()
    }
    assert got["a"]["n_obs"] == 1 and got["a"]["slope_micro"] is None
    assert got["a"]["n_null"] == 1
    # b: buckets 0 (1 event) and 2 (1 event): slope = 0/2 = 0
    assert got["b"]["n_pairs"] == 1 and got["b"]["slope_micro"] == 0


def test_theil_sen_random_parity(spark):
    import random

    from nebula_importer_spark.operators.temporal import theil_sen_trend

    rng = random.Random(1001)
    rows = []
    for _ in range(300):
        k = f"k{rng.randrange(3)}"
        ts = rng.randrange(0, 3600 * 10) if rng.random() > 0.05 else None
        rows.append((k, ts))
    got = {
        r["k"]: (
            r["n_obs"], r["n_pairs"], r["slope_micro"], r["n_null"],
        )
        for r in theil_sen_trend(
            _trend_df(spark, rows).repartition(7),
            ts_col="ts",
            key_cols=["k"],
        ).collect()
    }
    assert got == _py_theil_sen(rows)


def test_theil_sen_validation(spark):
    from nebula_importer_spark.operators.temporal import theil_sen_trend

    df = _trend_df(spark, [("a", 0)])
    with pytest.raises(ValueError, match="not in input"):
        theil_sen_trend(df, ts_col="zzz", key_cols=["k"])
    with pytest.raises(ValueError, match="key_cols"):
        theil_sen_trend(df, ts_col="ts", key_cols=[])
    with pytest.raises(ValueError, match="bucket_sec"):
        theil_sen_trend(df, ts_col="ts", key_cols=["k"], bucket_sec=0)


def test_theil_sen_large_slope_no_int64_wrap(spark):
    """Regression: a single 10^18-scaled quotient wraps int64 once
    |slope| > 9.2 (counts 20 -> 7 across one bucket wrapped to +5.4e18
    before the Euclidean (whole, frac) decomposition landed)."""
    from nebula_importer_spark.operators.temporal import theil_sen_trend

    rows = [("k", 5)] * 1 + [("k", 3605)] * 100 + [("k", 7205)] * 1
    got = theil_sen_trend(
        _trend_df(spark, rows), ts_col="ts", key_cols=["k"]
    ).collect()[0]
    # slopes: +99, -99, 0 -> median 0; before the fix the ±99e18
    # quotients wrapped and reordered the pick
    assert got["slope_micro"] == 0
    expect = _py_theil_sen(rows)
    assert (
        got["n_obs"], got["n_pairs"], got["slope_micro"], got["n_null"]
    ) == expect["k"]


def _py_xcorr(events, series_a, series_b, bucket_sec, max_lag, scale=10**6):
    """Dense-array model of cross_correlation (independent of the
    sparse-cell windowed-marginal implementation)."""
    from collections import Counter

    cells = Counter()
    for s, ts, v in events:
        if ts is None or s not in (series_a, series_b):
            continue
        cells[(s, ts // bucket_sec)] += v
    if not cells:
        return []
    ts_all = [t for _, t in cells]
    mn, mx = min(ts_all), max(ts_all)
    t_len = mx - mn + 1
    a = [cells.get((series_a, mn + i), 0) for i in range(t_len)]
    b = [cells.get((series_b, mn + i), 0) for i in range(t_len)]
    out = []
    for lag in range(-max_lag, max_lag + 1):
        if lag >= 0:
            pa, pb = a[: t_len - lag], b[lag:]
        else:
            pa, pb = a[-lag:], b[: t_len + lag]
        n = len(pa)
        sab = sum(x * y for x, y in zip(pa, pb))
        sa, sb = sum(pa), sum(pb)
        saa = sum(x * x for x in pa)
        sbb = sum(y * y for y in pb)
        num = n * sab - sa * sb
        den = (n * saa - sa * sa) * (n * sbb - sb * sb)
        r2 = (
            None
            if den == 0
            else (1 if num >= 0 else -1) * (num * num * scale // den)
        )
        out.append((lag, n, sab, num, r2))
    best = sorted(
        out,
        key=lambda r: (
            -(r[4] if r[4] is not None else -(10**18)),
            abs(r[0]),
            r[0],
        ),
    )[0][0]
    return [(l, n, sab, num, r2, l == best) for l, n, sab, num, r2 in out]


def test_cross_correlation_planted_lag(spark):
    from nebula_importer_spark.operators.temporal import cross_correlation

    # series b is series a shifted 2 buckets later: best lag must be +2
    import datetime

    base = datetime.datetime(2024, 1, 1)
    rows = []
    pattern = [5, 0, 9, 1, 7, 3, 8, 0, 6, 2, 9, 4]
    for i, k in enumerate(pattern):
        for _ in range(k):
            rows.append(("a", base + datetime.timedelta(hours=i)))
            rows.append(("b", base + datetime.timedelta(hours=i + 2)))
    df = spark.createDataFrame(rows, "series string, ts timestamp")
    got = cross_correlation(
        df, series_a="a", series_b="b", bucket_sec=3600, max_lag=4
    ).collect()
    best = [r for r in got if r.is_best]
    assert len(best) == 1 and best[0].lag == 2
    assert best[0].r2_signed_micro == 10**6  # exact shifted copy


def test_cross_correlation_random_parity(spark):
    import datetime
    import random

    from nebula_importer_spark.operators.temporal import cross_correlation

    rng = random.Random(505)
    base = datetime.datetime(2024, 3, 1)
    events = []
    for _ in range(600):
        s = rng.choice(["a", "b", "c"])  # 'c' must be ignored
        ts = rng.randrange(0, 40 * 3600)
        events.append((s, ts, 1))
    rows = [
        (s, base + datetime.timedelta(seconds=ts)) for s, ts, _ in events
    ] + [("a", None)]
    df = spark.createDataFrame(
        rows, "series string, ts timestamp"
    ).repartition(6)
    got = sorted(
        (r.lag, r.n_pairs, r.sum_ab, r.num, r.r2_signed_micro, r.is_best)
        for r in cross_correlation(
            df, series_a="a", series_b="b", bucket_sec=3600, max_lag=5
        ).collect()
    )
    epoch = int(base.replace(tzinfo=datetime.timezone.utc).timestamp())
    want = sorted(
        _py_xcorr(
            [(s, epoch + ts, v) for s, ts, v in events], "a", "b", 3600, 5
        )
    )
    assert got == want
    assert sum(1 for r in got if r[5]) == 1


def test_cross_correlation_validation_and_edges(spark):
    import pytest

    from nebula_importer_spark.operators.temporal import cross_correlation

    df = spark.createDataFrame(
        [("a", None)], "series string, ts timestamp"
    )
    # all-NULL timestamps: empty frame
    assert (
        cross_correlation(
            df, series_a="a", series_b="b", max_lag=2
        ).count()
        == 0
    )
    with pytest.raises(ValueError, match="must differ"):
        cross_correlation(df, series_a="a", series_b="a")
    with pytest.raises(ValueError, match="not in input"):
        cross_correlation(df, series_a="a", series_b="b", ts_col="zz")
    with pytest.raises(ValueError, match="max_lag"):
        cross_correlation(df, series_a="a", series_b="b", max_lag=0)
    with pytest.raises(ValueError, match="bucket_sec"):
        cross_correlation(df, series_a="a", series_b="b", bucket_sec=0)
    with pytest.raises(ValueError, match="integral"):
        bad = spark.createDataFrame(
            [("a", None, 1.0)], "series string, ts timestamp, v double"
        )
        cross_correlation(bad, series_a="a", series_b="b", value_col="v")
    # narrow range: every window degenerate -> raise
    import datetime

    narrow = spark.createDataFrame(
        [
            ("a", datetime.datetime(2024, 1, 1, 0)),
            ("b", datetime.datetime(2024, 1, 1, 1)),
        ],
        "series string, ts timestamp",
    )
    with pytest.raises(ValueError, match="aligned range"):
        cross_correlation(
            narrow, series_a="a", series_b="b", bucket_sec=3600, max_lag=6
        )


def test_band_join_complete_and_exact(spark):
    from nebula_importer_spark.operators.temporal import band_join

    left = spark.createDataFrame(
        [("a", 100), ("b", 205), ("c", 300), ("n", None)],
        "lid string, v long",
    )
    right = spark.createDataFrame(
        [("x", 103), ("y", 199), ("z", 290), ("w", 1000)],
        "rid string, v long",
    )
    got = {
        (r.lid, r.rid, r.diff)
        for r in band_join(
            left, right, left_val="v", right_val="v", eps=6
        ).collect()
    }
    assert got == {("a", "x", -3), ("b", "y", 6)}  # 300-290=10 is out

    # brute-force parity on random data, incl. bucket-boundary pairs
    import random

    rng = random.Random(31)
    lrows = [(f"l{i}", rng.randrange(0, 400)) for i in range(80)]
    rrows = [(f"r{i}", rng.randrange(0, 400)) for i in range(80)]
    ldf = spark.createDataFrame(lrows, "lid string, v long").repartition(4)
    rdf = spark.createDataFrame(rrows, "rid string, v long").repartition(3)
    for eps in (0, 1, 7):
        got = {
            (r.lid, r.rid)
            for r in band_join(
                ldf, rdf, left_val="v", right_val="v", eps=eps
            ).collect()
        }
        want = {
            (l, r)
            for l, lv in lrows
            for r, rv in rrows
            if abs(lv - rv) <= eps
        }
        assert got == want, eps

    # on-keys restrict the candidate space
    lg = spark.createDataFrame(
        [("g1", "a", 10), ("g2", "b", 10)], "g string, lid string, v long"
    )
    rg = spark.createDataFrame(
        [("g1", "x", 11)], "g string, rid string, v long"
    )
    gg = band_join(
        lg, rg, left_val="v", right_val="v", eps=2, on=["g"]
    ).collect()
    assert len(gg) == 1 and gg[0].lid == "a" and gg[0].g == "g1"

    # same-named value columns: right side suffixed
    ls = spark.createDataFrame([("a", 5)], "id string, v long")
    rs = spark.createDataFrame([("b", 6)], "id string, v long")
    row = band_join(ls, rs, left_val="v", right_val="v", eps=1).collect()[0]
    assert row.v == 5 and row.v_r == 6 and row.id == "a" and row.id_r == "b"


def test_band_join_validation(spark):
    import pytest

    from nebula_importer_spark.operators.temporal import band_join

    l = spark.createDataFrame([(1.0,)], "v double")
    r = spark.createDataFrame([(1,)], "w long")
    with pytest.raises(ValueError, match="eps"):
        band_join(l, r, left_val="v", right_val="w", eps=-1)
    with pytest.raises(ValueError, match="not in left"):
        band_join(l, r, left_val="zz", right_val="w", eps=1)
    with pytest.raises(ValueError, match="integral"):
        band_join(l, r, left_val="v", right_val="w", eps=1)
    li = spark.createDataFrame([(1,)], "v long")
    with pytest.raises(ValueError, match="both sides"):
        band_join(li, r, left_val="v", right_val="w", eps=1, on=["g"])


def test_decayed_score_exact_values(spark):
    import datetime as dt

    from nebula_importer_spark.operators.temporal import decayed_score

    base = dt.datetime(2026, 1, 1)
    rows = []
    for d, n in ((0, 3), (7, 2), (21, 1)):
        rows += [(1, base - dt.timedelta(days=d))] * n
    rows.append((2, base - dt.timedelta(days=70)))
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {r.user_id: r for r in decayed_score(df).collect()}
    # u1: 3 events in class 0 (x1.0), 2 in class 1 (x0.5), 1 in class 3
    # (x0.125) -> 3_000_000 + 1_000_000 + 125_000
    assert got[1].score_micro == 4_125_000
    assert (got[1].n_events, got[1].last_age_buckets) == (6, 0)
    # u2: one event 10 half-lives old -> 1e6 >> 10 = 976 (floored)
    assert got[2].score_micro == 976
    assert got[2].last_age_buckets == 70


def test_decayed_score_per_class_floor_pinned(spark):
    import datetime as dt

    from nebula_importer_spark.operators.temporal import decayed_score

    base = dt.datetime(2026, 1, 1)
    # 3 events in class 1: per-class floor gives (3*1e6)//2 = 1_500_000,
    # NOT 3*(1e6//2); and one class-70 event (>62) contributes exactly 0
    rows = [(1, base - dt.timedelta(days=7))] * 3
    rows.append((1, base - dt.timedelta(days=7 * 70)))
    rows.append((1, base))  # anchors now at class 0
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    r = decayed_score(df).collect()[0]
    assert r.score_micro == 1_000_000 + 1_500_000 + 0
    assert r.n_events == 5


def test_decayed_score_validation(spark):
    import pytest

    from nebula_importer_spark.operators.temporal import decayed_score

    df = spark.createDataFrame([(1,)], "user_id long").withColumn(
        "ts", __import__("pyspark.sql.functions", fromlist=["F"]).current_timestamp()
    )
    with pytest.raises(ValueError, match="bucket_sec"):
        decayed_score(df, bucket_sec=0)
    with pytest.raises(ValueError, match="half_life"):
        decayed_score(df, half_life_buckets=0)
    with pytest.raises(ValueError, match="not in input"):
        decayed_score(df, key_col="zz")
