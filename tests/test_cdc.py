"""operators/cdc.py — latest-wins CDC apply with tombstones."""

from __future__ import annotations

import pytest

from nebula_importer_spark.operators.cdc import apply_changes


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_latest_wins_and_tombstone(spark):
    # key 1: insert then update -> update survives
    # key 2: insert then delete -> gone
    # key 3: insert, delete, re-insert -> revived with the latest row
    df = spark.createDataFrame(
        [
            (1, 1, "I", "a"),
            (1, 2, "U", "b"),
            (2, 1, "I", "c"),
            (2, 2, "D", None),
            (3, 1, "I", "d"),
            (3, 2, "D", None),
            (3, 3, "I", "e"),
        ],
        "k long, seq long, op string, v string",
    )
    out = apply_changes(df, key_cols=["k"], seq_cols=["seq"], op_col="op")
    assert _rows(out) == [(1, 2, "U", "b"), (3, 3, "I", "e")]


def test_seq_tiebreaker_and_null_seq(spark):
    df = spark.createDataFrame(
        [
            (1, 5, 10, "x"),
            (1, 5, 11, "y"),  # same ts, higher id wins
            (2, None, 9, "stamped-null"),
            (2, 3, 1, "stamped"),  # NULL seq sorts last: this wins
        ],
        "k long, ts long, id long, v string",
    )
    out = apply_changes(df, key_cols=["k"], seq_cols=["ts", "id"])
    assert _rows(out) == [(1, 5, 11, "y"), (2, 3, 1, "stamped")]


def test_null_key_forms_visible_group(spark):
    df = spark.createDataFrame(
        [(None, 1, "a"), (None, 2, "b"), (7, 1, "c")],
        "k long, seq long, v string",
    )
    out = apply_changes(df, key_cols=["k"], seq_cols=["seq"])
    got = {(r.k, r.seq, r.v) for r in out.collect()}
    assert got == {(None, 2, "b"), (7, 1, "c")}


def test_null_op_is_not_a_delete(spark):
    df = spark.createDataFrame(
        [(1, 1, None, "kept")], "k long, seq long, op string, v string"
    )
    out = apply_changes(df, key_cols=["k"], seq_cols=["seq"], op_col="op")
    assert out.count() == 1


def test_plan_is_window_group_limit(spark):
    df = spark.createDataFrame(
        [(i % 4, i, "I") for i in range(100)], "k long, seq long, op string"
    )
    out = apply_changes(df, key_cols=["k"], seq_cols=["seq"], op_col="op")
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the rn=1 filter must push a per-task top-1 below the exchange
    assert "WindowGroupLimit" in plan


def test_validation(spark):
    df = spark.createDataFrame([(1, 1)], "k long, seq long")
    with pytest.raises(ValueError, match="key_cols"):
        apply_changes(df, key_cols=[], seq_cols=["seq"])
    with pytest.raises(ValueError, match="seq_cols"):
        apply_changes(df, key_cols=["k"], seq_cols=[])
    with pytest.raises(ValueError, match="not in input"):
        apply_changes(df, key_cols=["k"], seq_cols=["missing"])
    with pytest.raises(ValueError, match="overlap"):
        apply_changes(df, key_cols=["k"], seq_cols=["k"])
    bad = spark.createDataFrame([(1, 1, 1)], "k long, seq long, _rn long")
    with pytest.raises(ValueError, match="_rn"):
        apply_changes(bad, key_cols=["k"], seq_cols=["seq"])


def test_randomized_vs_python_replay(spark):
    import random

    rng = random.Random(13)
    rows = []
    for i in range(400):
        rows.append(
            (
                rng.randrange(25),
                rng.randrange(50),
                i,  # unique tiebreaker
                rng.choice(["I", "U", "U", "D"]),
                rng.random(),
            )
        )
    df = spark.createDataFrame(rows, "k long, ts long, id long, op string, v double")
    out = apply_changes(
        df, key_cols=["k"], seq_cols=["ts", "id"], op_col="op", delete_ops=("D",)
    )
    # python replay: latest by (ts, id), drop if tombstone
    best = {}
    for k, ts, i, op, v in rows:
        cur = best.get(k)
        if cur is None or (ts, i) > (cur[1], cur[2]):
            best[k] = (k, ts, i, op, v)
    want = sorted(t for t in best.values() if t[3] != "D")
    assert _rows(out) == want


# --- scd2_history ---------------------------------------------------------

from nebula_importer_spark.operators.cdc import scd2_history  # noqa: E402


def test_scd2_intervals_and_tombstone_close(spark):
    # key 1: v1 at t=1, v2 at t=3, tombstone at t=5, revive at t=7
    df = spark.createDataFrame(
        [
            (1, 1, "I", "a"),
            (1, 3, "U", "b"),
            (1, 5, "D", None),
            (1, 7, "I", "c"),
        ],
        "k long, ts long, op string, v string",
    )
    out = scd2_history(
        df, key_cols=["k"], ts_col="ts", op_col="op"
    )
    rows = sorted(
        (r.ts, r.v, r.valid_from, r.valid_to, r.is_current)
        for r in out.collect()
    )
    assert rows == [
        (1, "a", 1, 3, False),
        (3, "b", 3, 5, False),  # tombstone closes it...
        (7, "c", 7, None, True),  # ...and the revive opens fresh
    ]
    # the tombstone row itself emits no state row
    assert out.count() == 3


def test_scd2_collapse_suppresses_unchanged(spark):
    df = spark.createDataFrame(
        [
            (1, 1, "x", "same"),
            (1, 2, "x", "same"),  # no-op change: collapsed
            (1, 3, "x", "same"),  # transitively collapsed too
            (1, 4, "y", "changed"),
            (1, 5, "x", "back"),
        ],
        "k long, ts long, state string, note string",
    )
    out = scd2_history(
        df,
        key_cols=["k"],
        ts_col="ts",
        collapse_cols=["state"],
    )
    rows = sorted(
        (r.ts, r.state, r.valid_from, r.valid_to) for r in out.collect()
    )
    # the run of x's is ONE interval [1, 4); y is [4, 5); x again [5, inf)
    assert rows == [(1, "x", 1, 4), (4, "y", 4, 5), (5, "x", 5, None)]


def test_scd2_revive_after_tombstone_not_collapsed(spark):
    # same state before and after a tombstone must NOT collapse: the
    # tombstone broke the run, so the revive is a fresh interval
    df = spark.createDataFrame(
        [
            (1, 1, "I", "x"),
            (1, 2, "D", "x"),
            (1, 3, "I", "x"),
        ],
        "k long, ts long, op string, state string",
    )
    out = scd2_history(
        df,
        key_cols=["k"],
        ts_col="ts",
        op_col="op",
        collapse_cols=["state"],
    )
    rows = sorted((r.ts, r.valid_from, r.valid_to) for r in out.collect())
    assert rows == [(1, 1, 2), (3, 3, None)]


def test_scd2_single_exchange_plan(spark):
    df = spark.createDataFrame(
        [(1, 1, "a", "x")], "k long, ts long, op string, state string"
    )
    out = scd2_history(
        df,
        key_cols=["k"],
        ts_col="ts",
        op_col="op",
        collapse_cols=["state"],
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    # both windows partition on k: Spark must reuse ONE hash exchange
    assert plan.count("Exchange hashpartitioning") == 1


def test_scd2_validation(spark):
    df = spark.createDataFrame([(1, 1)], "k long, ts long")
    with pytest.raises(ValueError):
        scd2_history(df, key_cols=[], ts_col="ts")
    with pytest.raises(ValueError):
        scd2_history(df, key_cols=["k"], ts_col="nope")
    with pytest.raises(ValueError):
        scd2_history(df, key_cols=["k"], ts_col="ts", collapse_cols=["no"])
    bad = spark.createDataFrame([(1, 1, 2)], "k long, ts long, valid_to long")
    with pytest.raises(ValueError):
        scd2_history(bad, key_cols=["k"], ts_col="ts")
