"""Structured Streaming surface: incremental ingestion of event/transcript
streams with watermarked windowed aggregation.

The reference is batch-only (SURVEY §2.7: no watermarks, no windows, no
state); this module is the engine's streaming extension: the same declarative
transformations run incrementally — readStream → transform → writeStream,
late data bounded by a watermark. At scale the file source is swapped for
Kafka; the query shape (and its state store behavior) is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_event_stream(
    spark: SparkSession, input_dir: str, max_files_per_trigger: int = 10
) -> DataFrame:
    """File-source event stream (each new parquet file is a micro-batch)."""
    return (
        spark.readStream.format("parquet")
        .schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .load(input_dir)
    )


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling/sliding window counts per event_type.

    Late rows beyond the watermark are dropped and their windows finalized —
    the state store stays bounded (windows × event_types), independent of
    stream length.
    """
    w = F.window(F.col("ts"), window, slide) if slide else F.window(F.col("ts"), window)
    return (
        events.withWatermark("ts", watermark)
        .groupBy(w.alias("win"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            # exact decimal sum (order-free) — double summation across
            # micro-batch partial aggregates would be batch-boundary
            # dependent, breaking replay determinism and oracle hashing
            F.round(F.sum(F.col("value").cast("decimal(18,6)")), 2)
            .cast("decimal(18,2)")
            .alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sessionize(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Custom stateful operator: per-user session assembly with an inactivity
    gap, via ``applyInPandasWithState`` (arbitrary stateful processing — the
    escape hatch when built-in windows can't express the semantics).

    Emits one row per CLOSED session: (user_id, session_start, session_end,
    n_events, sum_value). A session closes when the event-time watermark
    passes its last event + gap; open sessions stay in the state store.
    """
    import datetime as _dt

    import pandas as _pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_ms = _parse_duration_ms(gap)
    out_schema = (
        "user_id long, session_start timestamp, session_end timestamp, "
        "n_events long, sum_value double"
    )
    # value sums are carried as EXACT integer micro-units (state must be
    # replay-deterministic: double accumulation is arrival-order dependent,
    # and order across micro-batch boundaries is not a contract). Rendered
    # at close time as half-away-rounded cents — identical to SQL
    # ROUND(SUM(DECIMAL(18,6)), 2).
    state_schema = "last_ts long, start_ts long, n long, total_micros long"

    def _cents(micros: int) -> float:
        sign = -1 if micros < 0 else 1
        return sign * ((abs(micros) + 5_000) // 10_000) / 100.0

    def fn(key, pdfs, state: GroupState):
        (user_id,) = key
        closed: list[tuple] = []
        if state.hasTimedOut:
            last_ts, start_ts, n, total = state.get
            closed.append((user_id, start_ts, last_ts, n, total))
            state.remove()
        else:
            last_ts, start_ts, n, total = (
                state.get if state.exists else (None, None, 0, 0)
            )
            # (ts, event_id) makes same-timestamp processing order a total
            # order — session assembly is replay-identical no matter how
            # the shuffle delivered the rows. The group arrives as MULTIPLE
            # Arrow chunks (split at maxRecordsPerBatch); sorting must span
            # all of them, so concatenate first — per-chunk sorting would
            # interleave out-of-order across chunk boundaries for >10k-event
            # keys (exactly the mega-key case). One key's micro-batch rows
            # in memory is the operator's inherent working set.
            chunks = [p for p in pdfs if len(p)]
            if chunks:
                pdf = _pd.concat(chunks, ignore_index=True).sort_values(
                    ["ts", "event_id"]
                )
                for ts, value in zip(pdf["ts"], pdf["value"]):
                    ts_ms = int(ts.value // 1_000_000)
                    if last_ts is not None and ts_ms - last_ts > gap_ms:
                        closed.append((user_id, start_ts, last_ts, n, total))
                        start_ts, n, total = ts_ms, 0, 0
                    if start_ts is None:
                        start_ts = ts_ms
                    last_ts = ts_ms
                    n += 1
                    total += int(round(float(value or 0.0) * 1_000_000))
            state.update((last_ts, start_ts, n, total))
            state.setTimeoutTimestamp(last_ts + gap_ms)
        if closed:
            yield _pd.DataFrame(
                {
                    "user_id": [c[0] for c in closed],
                    "session_start": [
                        _dt.datetime.utcfromtimestamp(c[1] / 1000.0) for c in closed
                    ],
                    "session_end": [
                        _dt.datetime.utcfromtimestamp(c[2] / 1000.0) for c in closed
                    ],
                    "n_events": [c[3] for c in closed],
                    "sum_value": [_cents(c[4]) for c in closed],
                }
            )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn, out_schema, state_schema, "append", GroupStateTimeout.EventTimeTimeout
        )
    )


def dedup_stream(
    events: DataFrame,
    keys: list[str] | None = None,
    ts: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming exact dedup: drop rows whose ``keys`` were already seen
    within the watermark horizon (``dropDuplicatesWithinWatermark``). The
    state store holds one entry per distinct key seen in the horizon and
    evicts as event time advances — bounded state, unlike a plain
    ``dropDuplicates`` on a stream (which retains ALL keys forever). This
    is the at-ingest twin of the batch ``exact_dedup`` operator for a
    training-data pipeline: retries/replays of the same event/document id
    are suppressed as they arrive, before they reach storage."""
    keys = keys or ["event_id"]
    return events.withWatermark(ts, watermark).dropDuplicatesWithinWatermark(keys)


def drain_to_memory(agg: DataFrame, name: str, checkpoint_dir: str | None = None) -> DataFrame:
    """Run a streaming frame to completion under ``trigger(availableNow)``
    into an in-memory sink and return the materialized result table.

    Append-mode semantics are preserved end-to-end: only windows/groups the
    final watermark finalized are present (Spark runs no-data micro-batches
    after the last data batch, so state the advanced watermark closes IS
    flushed before termination). This is the batch-replay harness for
    verifying streaming semantics against a SQL oracle — the memory sink is
    driver-resident, so it is strictly a TEST/verification surface; the
    production sink is run_stream_to_parquet."""
    import tempfile

    ckpt = checkpoint_dir or tempfile.mkdtemp(prefix=f"nis_ck_{name}_")
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return agg.sparkSession.table(name)


def _parse_duration_ms(s: str) -> int:
    n, unit = s.split()
    mult = {"second": 1000, "seconds": 1000, "minute": 60_000, "minutes": 60_000,
            "hour": 3_600_000, "hours": 3_600_000}[unit]
    return int(n) * mult


def run_stream_to_parquet(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
    available_now: bool = True,
):
    """readStream → windowed agg → writeStream (append mode: only finalized
    windows are emitted). With ``available_now`` the query drains everything
    currently in the directory and stops — the incremental-batch pattern used
    for resumable backfills (checkpoint carries the exactly-once cursor)."""
    agg = windowed_event_counts(read_event_stream(spark, input_dir), window, None, watermark)
    writer = (
        agg.writeStream.format("parquet")
        .outputMode("append")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def interval_join_stream(
    left: DataFrame,
    right: DataFrame,
    *,
    key: str = "user_id",
    left_ts: str = "ts",
    right_ts: str = "ts",
    max_gap: str = "5 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream INTERVAL join: pair each left row with the right rows
    of the same ``key`` whose ``right_ts`` falls in
    ``[left_ts, left_ts + max_gap]`` — both sides unbounded streams. The
    incremental twin of the batch ``range_self_join`` family: cause→effect
    pairing (click→error, prompt→tool-result) AS EVENTS ARRIVE, without
    re-scanning history.

    Why the shape matters: Spark buffers BOTH sides in the state store and
    can only evict with a watermark on each input plus an explicit
    event-time constraint in the join condition — exactly what this
    function constructs. State is bounded by (watermark + max_gap) of
    per-key rows on each side; without the time bounds the state grows
    forever and the query is rejected for correctness. Inner-join output
    emits as soon as both sides of a pair have arrived — a match whose legs
    land in different micro-batches is produced when the second leg
    arrives (pytest proves a pair spanning micro-batches).

    ``left_ts`` and ``right_ts`` must be DIFFERENT column names (project
    before joining — this also keeps the buffered state narrow, the same
    reason the batch operators shed payload columns before a shuffle).
    """
    if left_ts == right_ts:
        raise ValueError(
            "left_ts and right_ts must differ — project each side to "
            "distinct timestamp column names before the join"
        )
    l = left.withWatermark(left_ts, watermark)
    r = right.withWatermark(right_ts, watermark)
    cond = (
        (l[key] == r[key])
        & (r[right_ts] >= l[left_ts])
        & (r[right_ts] <= l[left_ts] + F.expr(f"INTERVAL {max_gap}"))
    )
    return l.join(r, cond).drop(r[key])
