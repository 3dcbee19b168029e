from __future__ import annotations

import pytest

from nebula_importer_spark.functions.filter_dsl import (
    FilterError,
    compile_filter,
    translate_filter,
)


def _rows(spark, expr, rows):
    width = len(rows[0])
    df = spark.createDataFrame(rows, ", ".join(f"_c{i} string" for i in range(width)))
    return [tuple(r) for r in df.filter(compile_filter(expr, df.columns)).collect()]


def test_basic_equality(spark):
    rows = [("0", "a"), ("1", "b"), ("2", "c")]
    assert _rows(spark, 'Record[0] != "0"', rows) == [("1", "b"), ("2", "c")]


def test_and_or_translation(spark):
    # reference example (basic.string.insert.v3.yaml:71-72)
    rows = [("1", "Mahinda", "male"), ("2", "Michael", "female"), ("3", "Jane", "male")]
    expr = '(Record[1] == "Mahinda" || Record[1] == "Michael") && Record[2] == "male"'
    assert _rows(spark, expr, rows) == [("1", "Mahinda", "male")]


def test_not_and_bang(spark):
    rows = [("0",), ("1",)]
    assert _rows(spark, 'not (Record[0] == "0")', rows) == [("1",)]
    assert _rows(spark, '!(Record[0] == "0")', rows) == [("1",)]


def test_string_comparison_is_lexicographic(spark):
    # Record values are strings: "10" < "9" lexicographically.
    rows = [("10",), ("9",)]
    assert _rows(spark, 'Record[0] < "9"', rows) == [("10",)]


def test_out_of_range_reference_raises(spark):
    with pytest.raises(FilterError):
        translate_filter("Record[5] == \"x\"", ["_c0"])
