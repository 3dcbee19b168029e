"""Randomized picker parity: N seeded random (spec, record) cases evaluated
through the compiled Column expressions in ONE Spark job and compared against
an independent pure-Python model of the reference's pick/convert semantics
(indices→nullable fallback→default→type cast). Goes beyond the reference's
own test strategy (SURVEY §5: table-driven only, no randomized tests)."""

from __future__ import annotations

import datetime
import random
import re

from nebula_importer_spark.config.model import PropSpec
from nebula_importer_spark.functions.picker import compile_prop

WIDTH = 4
N_CASES = 300

TYPES = ["BOOL", "INT", "FLOAT", "DOUBLE", "STRING", "DATE", "TIME", "DATETIME", "TIMESTAMP"]

VALUE_POOLS = {
    "BOOL": ["true", "false", "notabool"],
    "INT": ["0", "42", "-7", "0x1F", "-0x10", "12junk", "99999999999"],
    "FLOAT": ["1.5", "-0.25", "2", "nope"],
    "DOUBLE": ["3.25", "-10.5", "1e3", "xx"],
    "STRING": ["hello", "a b", "", "0"],
    "DATE": ["2020-01-02", "1999-12-31", "not-a-date"],
    "TIME": ["18:38:23.284", "8:0:1", "25:99", "junk"],
    "DATETIME": ["2020-01-11T19:28:23", "2021-06-01T00:00:00", "junk"],
    "TIMESTAMP": ["1578770903", "2020-01-11 19:28:23", "junk"],
}
SENTINELS = ["", "_NULL_", "N/A"]

_TIME_RE = re.compile(r"^\d{1,2}:\d{1,2}:\d{1,2}(\.\d+)?$")
_UINT_RE = re.compile(r"^(0[xX][0-9a-fA-F]+|[0-9]+)$")
_HEX_RE = re.compile(r"^[+-]?0[xX][0-9a-fA-F]+$")


def _cast_int(v: str):
    if _HEX_RE.match(v):
        sign = -1 if v.startswith("-") else 1
        return sign * int(v.lstrip("+-")[2:], 16)
    try:
        return int(v)
    except ValueError:
        return None


def _cast(v: str, t: str):
    """Independent model of functions/types.convert_type."""
    if t == "BOOL":
        return {"true": True, "false": False}.get(v.lower())
    if t == "INT":
        return _cast_int(v)
    if t in ("FLOAT", "DOUBLE"):
        try:
            return float(v)
        except ValueError:
            return None
    if t == "STRING":
        return v
    if t == "DATE":
        try:
            return datetime.date.fromisoformat(v)
        except ValueError:
            return None
    if t == "TIME":
        return v if _TIME_RE.match(v) else None
    if t == "DATETIME":
        try:
            return datetime.datetime.fromisoformat(v)
        except ValueError:
            return None
    if t == "TIMESTAMP":
        if _UINT_RE.match(v):
            iv = _cast_int(v)
            return datetime.datetime.fromtimestamp(iv, datetime.timezone.utc).replace(tzinfo=None)
        try:
            return datetime.datetime.fromisoformat(v)
        except ValueError:
            return None
    raise AssertionError(t)


def model_pick(spec: PropSpec, record: list[str]):
    if spec.nullable:
        v = None
        for i in [spec.index, *spec.alternative_indices]:
            cand = record[i]
            if cand is not None and cand != spec.null_value:
                v = cand
                break
        if v is None and spec.default_value is not None:
            v = spec.default_value
    else:
        v = record[spec.index]
    return None if v is None else _cast(v, spec.type)


def _gen_case(rng: random.Random, case_id: int) -> tuple[PropSpec, list[str]]:
    t = rng.choice(TYPES)
    nullable = rng.random() < 0.6
    null_value = rng.choice(SENTINELS) if nullable else ""
    alts: list[int] = []
    index = rng.randrange(WIDTH)
    if nullable and rng.random() < 0.5:
        alts = rng.sample([i for i in range(WIDTH) if i != index], rng.randrange(1, 3))
    default = rng.choice(VALUE_POOLS[t]) if (nullable and rng.random() < 0.5) else None
    spec = PropSpec(
        f"p{case_id}", t, index,
        nullable=nullable, null_value=null_value,
        alternative_indices=alts, default_value=default,
    )
    record = []
    for _ in range(WIDTH):
        r = rng.random()
        if r < 0.25:
            record.append(null_value if nullable else "")
        elif r < 0.35:
            record.append(rng.choice(SENTINELS))
        else:
            record.append(rng.choice(VALUE_POOLS[t]))
    return spec, record


def test_randomized_picker_parity(spark):
    rng = random.Random(20260816)
    cases = [_gen_case(rng, i) for i in range(N_CASES)]
    # one wide row per case, one DataFrame, one job
    rows = [tuple(rec) for _, rec in cases]
    df = spark.createDataFrame(rows, ", ".join(f"_c{i} string" for i in range(WIDTH)))
    df = df.coalesce(1)  # rows must stay aligned with case order
    from pyspark.sql import functions as F

    df = df.withColumn("_row", F.monotonically_increasing_id())
    cols = [f"_c{i}" for i in range(WIDTH)]
    exprs = [compile_prop(spec, cols) for spec, _ in cases]
    got_rows = df.select("_row", *exprs).orderBy("_row").collect()
    mismatches = []
    for rix, (spec, rec) in enumerate(cases):
        want = model_pick(spec, rec)
        got = got_rows[rix][spec.name]
        if isinstance(got, datetime.datetime) and got.tzinfo is not None:
            got = got.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        if isinstance(want, float) and isinstance(got, float):
            ok = abs(want - got) < 1e-6 * max(1.0, abs(want))
        else:
            ok = got == want
        if not ok:
            mismatches.append((rix, spec, rec, want, got))
    assert not mismatches, f"{len(mismatches)} mismatches; first: {mismatches[0]}"
