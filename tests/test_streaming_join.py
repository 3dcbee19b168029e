"""streaming/events.py:interval_join_stream — stream-stream interval join.

The property worth a test harness: a pair whose legs arrive in DIFFERENT
micro-batches must still be produced (the state store buffers the first
leg until the second arrives or the watermark evicts it), and the total
output under replay must equal the batch interval join exactly.
"""

from __future__ import annotations

import datetime as dt

import pytest

from nebula_importer_spark.streaming.events import (
    drain_to_memory,
    interval_join_stream,
)

SCHEMA = "user_id long, event_id long, event_type string, ts timestamp"


def _ts(minute, second=0):
    return dt.datetime(2024, 1, 1, 12, minute, second)


def _write_batches(spark, tmp_path, batches):
    src = tmp_path / "events"
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
            "append" if i else "overwrite"
        ).parquet(str(src))
    return str(src)


def _run(spark, src, name, watermark="2 hours"):
    stream = (
        spark.readStream.format("parquet")
        .schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)  # one file per micro-batch
        .load(src)
    )
    clicks = stream.filter("event_type = 'click'").selectExpr(
        "user_id", "event_id AS click_id", "ts AS click_ts"
    )
    errors = stream.filter("event_type = 'error'").selectExpr(
        "user_id", "event_id AS error_id", "ts AS error_ts"
    )
    joined = interval_join_stream(
        clicks,
        errors,
        key="user_id",
        left_ts="click_ts",
        right_ts="error_ts",
        max_gap="5 minutes",
        watermark=watermark,
    )
    out = drain_to_memory(
        joined.select("user_id", "click_id", "error_id"), name
    )
    return {(r.user_id, r.click_id, r.error_id) for r in out.collect()}


def test_interval_join_pairs_across_micro_batches(spark, tmp_path):
    # click in file 1, matching error in file 3 (separate micro-batches):
    # the buffered left leg must still pair. Same-batch and out-of-window
    # controls included.
    batches = [
        [(1, 10, "click", _ts(0)), (2, 20, "click", _ts(0))],
        [(2, 21, "error", _ts(2))],          # same-user pair, batch 2
        [(1, 11, "error", _ts(4)),           # cross-batch pair (file 1 click)
         (1, 12, "error", _ts(30)),          # outside 5-minute gap: no pair
         (3, 30, "error", _ts(1))],          # user with no click: no pair
    ]
    src = _write_batches(spark, tmp_path, batches)
    got = _run(spark, src, "t_ij_cross")
    assert got == {(1, 10, 11), (2, 20, 21)}


def test_interval_join_equals_batch_join(spark, tmp_path):
    import random

    rng = random.Random(7)
    rows = [
        (
            rng.randrange(5),
            i,
            rng.choice(["click", "error", "view"]),
            _ts(rng.randrange(50), rng.randrange(60)),
        )
        for i in range(120)
    ]
    # three arbitrary files -> three micro-batches
    batches = [rows[:40], rows[40:80], rows[80:]]
    src = _write_batches(spark, tmp_path, batches)
    got = _run(spark, src, "t_ij_batch_eq")

    df = spark.createDataFrame(rows, SCHEMA)
    c = df.filter("event_type = 'click'").selectExpr(
        "user_id", "event_id AS click_id", "ts AS click_ts"
    )
    e = df.filter("event_type = 'error'").selectExpr(
        "user_id AS u2", "event_id AS error_id", "ts AS error_ts"
    )
    want = {
        (r.user_id, r.click_id, r.error_id)
        for r in c.join(
            e,
            (c.user_id == e.u2)
            & (e.error_ts >= c.click_ts)
            & (e.error_ts <= c.click_ts + F_expr("INTERVAL 5 minutes")),
        ).collect()
    }
    assert got == want and len(want) > 0


def F_expr(s):
    from pyspark.sql import functions as F

    return F.expr(s)


def test_interval_join_rejects_same_ts_names(spark):
    df = spark.createDataFrame([], SCHEMA)
    with pytest.raises(ValueError):
        interval_join_stream(df, df, left_ts="ts", right_ts="ts")
