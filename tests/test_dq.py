"""operators/dq.py — declarative constraint suite and keyed snapshot
diff: hand-computed violation counts, null-safe change semantics,
single-agg-pass plan shape, validation."""

from __future__ import annotations

import pytest

from nebula_importer_spark.operators.dq import dq_constraints, table_diff


def _orders(spark):
    return spark.createDataFrame(
        [
            (1, 10, "O", 5.0),
            (2, 10, "F", 150.0),
            (3, None, "X", -1.0),   # null FK, bad status, bad range
            (4, 99, "O", 50.0),     # dangling FK
            (4, 10, "O", 50.0),     # duplicate key
        ],
        "k long, fk long, status string, price double",
    )


def _dim(spark):
    return spark.createDataFrame([(10,), (11,)], "ck long")


def test_dq_counts_hand_computed(spark):
    got = {
        r.rule: (r.kind, r.n_violations, r.passed)
        for r in dq_constraints(
            _orders(spark),
            [
                {"kind": "not_null", "col": "fk"},
                {"kind": "unique", "cols": ["k"]},
                {"kind": "in_set", "col": "status", "values": ["O", "F"]},
                {"kind": "in_range", "col": "price", "lo": 0.0, "hi": 100.0},
                {"kind": "matches", "col": "status", "pattern": "[OF]"},
                {"kind": "ref", "col": "fk", "ref": _dim(spark),
                 "ref_col": "ck"},
            ],
        ).collect()
    }
    assert got["not_null:fk"] == ("not_null", 1, False)
    assert got["unique:k"] == ("unique", 1, False)       # key 4 twice -> 1
    assert got["in_set:status"] == ("in_set", 1, False)  # 'X'
    assert got["in_range:price"] == ("in_range", 2, False)  # 150, -1
    assert got["matches:status"] == ("matches", 1, False)   # 'X'
    # NULL fk is NOT a ref violation (SQL FK semantics); 99 is
    assert got["ref:fk->ck"] == ("ref", 1, False)


def test_dq_all_green_and_empty_input(spark):
    clean = spark.createDataFrame([(1, "O")], "k long, status string")
    rules = [
        {"kind": "not_null", "col": "k"},
        {"kind": "unique", "cols": ["k"]},
        {"kind": "in_set", "col": "status", "values": ["O"]},
    ]
    assert all(r.passed for r in dq_constraints(clean, rules).collect())
    empty = clean.filter("k < 0")
    got = dq_constraints(empty, rules).collect()
    assert all(r.n_violations == 0 and r.passed for r in got)


def test_dq_validation(spark):
    df = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError, match="non-empty"):
        dq_constraints(df, [])
    with pytest.raises(ValueError, match="kind"):
        dq_constraints(df, [{"kind": "nope"}])
    with pytest.raises(ValueError, match="not in"):
        dq_constraints(df, [{"kind": "not_null", "col": "zz"}])
    with pytest.raises(ValueError, match="lo and hi"):
        dq_constraints(df, [{"kind": "in_range", "col": "k"}])


def test_table_diff_hand_computed(spark):
    left = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, "c", None), (4, "d", 4.0)],
        "k long, s string, p double",
    )
    right = spark.createDataFrame(
        [(1, "a", 1.0),        # unchanged
         (2, "B", 2.0),        # changed: s
         (3, "c", 3.0),        # changed: p (NULL -> value IS a change)
         (5, "e", 5.0)],       # added; 4 removed
        "k long, s string, p double",
    )
    got = {r.metric: r.n for r in table_diff(left, right, ["k"]).collect()}
    assert got == {
        "added": 1, "removed": 1, "changed": 2, "unchanged": 1,
        "changed:s": 1, "changed:p": 1,
    }


def test_table_diff_null_safe_unchanged(spark):
    left = spark.createDataFrame([(1, None)], "k long, s string")
    right = spark.createDataFrame([(1, None)], "k long, s string")
    got = {r.metric: r.n for r in table_diff(left, right, ["k"]).collect()}
    assert got["unchanged"] == 1 and got["changed"] == 0


def test_table_diff_validation(spark):
    df = spark.createDataFrame([(1, "a")], "k long, s string")
    with pytest.raises(ValueError, match="non-empty"):
        table_diff(df, df, [])
    with pytest.raises(ValueError, match="both frames"):
        table_diff(df, df.withColumnRenamed("k", "kk"), ["k"])
