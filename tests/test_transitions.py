"""event_transitions — first-order Markov transition matrix."""

from __future__ import annotations

import random
from collections import Counter
from datetime import datetime, timedelta

from nebula_importer_spark.operators.behavior import event_transitions


def _ref(rows):
    """Python model: per-user (ts, id)-ordered adjacent pairs."""
    byu = {}
    for eid, ts, u, t in rows:
        byu.setdefault(u, []).append((ts, eid, t))
    pairs = Counter()
    for seq in byu.values():
        seq.sort()
        for (_, _, a), (_, _, b) in zip(seq, seq[1:]):
            pairs[(a, b)] += 1
    totals = Counter()
    for (a, _), n in pairs.items():
        totals[a] += n
    return sorted(
        (a, b, n, round(n / totals[a], 6)) for (a, b), n in pairs.items()
    )


def _run(spark, rows):
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "event_type"])
    got = event_transitions(df).collect()
    return sorted(
        (r["src_type"], r["dst_type"], r["n_transitions"], r["p"]) for r in got
    )


T0 = datetime(2024, 1, 1)


def test_hand_case(spark):
    rows = [
        (1, T0, "u1", "view"),
        (2, T0 + timedelta(seconds=10), "u1", "click"),
        (3, T0 + timedelta(seconds=20), "u1", "view"),
        (4, T0, "u2", "view"),
        (5, T0 + timedelta(seconds=5), "u2", "click"),
    ]
    got = _run(spark, rows)
    assert got == [
        ("click", "view", 1, round(1 / 1, 6)),
        ("view", "click", 2, 1.0),
    ]
    assert got == _ref(rows)


def test_same_timestamp_id_tiebreak(spark):
    rows = [
        (9, T0, "u1", "b"),
        (2, T0, "u1", "a"),  # same ts: id 2 < 9 -> a precedes b
    ]
    assert _run(spark, rows) == [("a", "b", 1, 1.0)] == _ref(rows)


def test_single_event_users_emit_nothing(spark):
    rows = [(1, T0, "u1", "view"), (2, T0, "u2", "click")]
    assert _run(spark, rows) == []


def test_randomized_vs_reference(spark):
    rng = random.Random(23)
    types = ["view", "click", "purchase", "error"]
    rows = [
        (
            i,
            T0 + timedelta(seconds=rng.randint(0, 50)),
            f"u{rng.randint(0, 7)}",
            rng.choice(types),
        )
        for i in range(300)
    ]
    assert _run(spark, rows) == _ref(rows)
