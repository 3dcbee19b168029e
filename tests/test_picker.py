"""Table-driven picker/converter tests, modeled on the reference's
pkg/picker/config_test.go cases (each: spec + record → want value/null)."""

from __future__ import annotations

import datetime

import pytest

from nebula_importer_spark.config.model import NodeIDSpec, PropSpec
from nebula_importer_spark.functions.picker import PickError, compile_id, compile_prop


def _eval_prop(spark, spec: PropSpec, record: list[str | None]):
    df = spark.createDataFrame([record], ", ".join(f"_c{i} string" for i in range(len(record))))
    return df.select(compile_prop(spec, df.columns)).first()[0]


def _eval_id(spark, spec: NodeIDSpec, record: list[str | None]):
    df = spark.createDataFrame([record], ", ".join(f"_c{i} string" for i in range(len(record))))
    return df.select(compile_id(spec, df.columns, "k")).first()[0]


# ---- P1 index pick + P8 type casts ---------------------------------------

CASES = [
    (PropSpec("p", "STRING", 0), ["hello"], "hello"),
    (PropSpec("p", "INT", 1), ["x", "42"], 42),
    (PropSpec("p", "INT", 0), ["0x1F"], 31),  # hex (utils/string.go parity)
    (PropSpec("p", "INT", 0), ["-0x10"], -16),
    (PropSpec("p", "BOOL", 0), ["true"], True),
    (PropSpec("p", "BOOL", 0), ["false"], False),
    (PropSpec("p", "FLOAT", 0), ["1.5"], 1.5),
    (PropSpec("p", "DOUBLE", 0), ["2.25"], 2.25),
    (PropSpec("p", "DATE", 0), ["2020-01-02"], datetime.date(2020, 1, 2)),
    (PropSpec("p", "TIME", 0), ["18:38:23.284"], "18:38:23.284"),
    (PropSpec("p", "TIME", 0), ["not a time"], None),
    (
        PropSpec("p", "DATETIME", 0),
        ["2020-01-11T19:28:23"],
        datetime.datetime(2020, 1, 11, 19, 28, 23),
    ),
    # TIMESTAMP dual mode (converter_type.go:82-90)
    (
        PropSpec("p", "TIMESTAMP", 0),
        ["1578770903"],
        datetime.datetime(2020, 1, 11, 19, 28, 23, tzinfo=datetime.timezone.utc),
    ),
    (
        PropSpec("p", "TIMESTAMP", 0),
        ["2020-01-11 19:28:23"],
        datetime.datetime(2020, 1, 11, 19, 28, 23, tzinfo=datetime.timezone.utc),
    ),
    # GEOGRAPHY WKT validation
    (PropSpec("p", "GEOGRAPHY", 0), ["Point(3 8)"], "Point(3 8)"),
    (PropSpec("p", "GEOGRAPHY(POINT)", 0), [" point( 3 8 )"], "point( 3 8 )"),
    (PropSpec("p", "GEOGRAPHY(POINT)", 0), ["LineString(3 8, 4 9)"], None),
    (
        PropSpec("p", "GEOGRAPHY(POLYGON)", 0),
        ["polygon((0 1, 2 4, 3 5, 4 9, 0 1))"],
        "polygon((0 1, 2 4, 3 5, 4 9, 0 1))",
    ),
]


@pytest.mark.parametrize("spec,record,want", CASES)
def test_prop_cases(spark, spec, record, want):
    got = _eval_prop(spark, spec, record)
    if isinstance(want, datetime.datetime) and want.tzinfo:
        got = got.replace(tzinfo=datetime.timezone.utc) if got else got
    assert got == want


# ---- P4/P5/P7: nullable, nullValue, alternativeIndices, defaultValue ------


def test_nullable_null_value(spark):
    spec = PropSpec("p", "DATE", 0, nullable=True, null_value="_NULL_")
    assert _eval_prop(spark, spec, ["_NULL_"]) is None
    assert _eval_prop(spark, spec, ["2020-01-02"]) == datetime.date(2020, 1, 2)


def test_nullable_default_empty_nullvalue(spark):
    spec = PropSpec("p", "STRING", 0, nullable=True)
    assert _eval_prop(spark, spec, [""]) is None  # default nullValue ""


def test_not_nullable_keeps_empty_string(spark):
    spec = PropSpec("p", "STRING", 0)
    assert _eval_prop(spark, spec, [""]) == ""


def test_alternative_indices_first_non_null_wins(spark):
    # mirrors cases-string basic_type_test: d DOUBLE @4 alternativeIndices [3,2]
    spec = PropSpec("p", "DOUBLE", 4, nullable=True, alternative_indices=[3, 2])
    assert _eval_prop(spark, spec, ["x", "1", "2.5", "", ""]) == 2.5
    assert _eval_prop(spark, spec, ["x", "1", "2.5", "3.5", ""]) == 3.5
    assert _eval_prop(spark, spec, ["x", "1", "2.5", "3.5", "4.5"]) == 4.5


def test_default_after_fallbacks_then_cast(spark):
    spec = PropSpec("p", "INT", 0, nullable=True, default_value="7")
    assert _eval_prop(spark, spec, [""]) == 7
    assert _eval_prop(spark, spec, ["9"]) == 9


def test_default_applies_to_nullvalue_match(spark):
    spec = PropSpec("p", "STRING", 0, nullable=True, null_value="N/A", default_value="dflt")
    assert _eval_prop(spark, spec, ["N/A"]) == "dflt"


# ---- IDs: index / concat / hash / int ------------------------------------


def test_id_concat_mixed(spark):
    spec = NodeIDSpec(type="STRING", concat_items=["person_", 0, "_id"])
    assert _eval_id(spark, spec, ["933"]) == "person_933_id"


def test_id_int(spark):
    spec = NodeIDSpec(type="INT", index=0)
    assert _eval_id(spark, spec, ["1234"]) == 1234


def test_id_hash_deterministic_long(spark):
    spec = NodeIDSpec(type="INT", index=0, function="HASH")
    a = _eval_id(spark, spec, ["abc"])
    b = _eval_id(spark, spec, ["abc"])
    c = _eval_id(spark, spec, ["abd"])
    assert isinstance(a, int) and a == b and a != c


def test_index_out_of_range_is_plan_time_error(spark):
    with pytest.raises(PickError):
        _eval_prop(spark, PropSpec("p", "STRING", 5), ["only", "three", "cols"])
