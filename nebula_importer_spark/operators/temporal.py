"""Temporal join operators: as-of join, bounded range join, sessionization.

Capabilities the reference lacks entirely (SURVEY.md §2.7 — nebula-importer
has no joins of any kind); expressed Spark-first with scale-safe plans:

- ``asof_join``        most-recent-prior match per key, implemented as a
                       union + single window pass (ONE shuffle on the key; no
                       range-join row explosion, no broadcast of a fact table).
                       This is the classic "sort-merge as-of" expressed
                       declaratively: tag both inputs, sort within key by
                       (ts, side, seq), carry the last-seen right row forward
                       with ``last(..., ignorenulls=True)``.
- ``range_self_join``  all pairs within ``max_gap`` of each other per key via
                       time-bucketing: each right row emits its bucket and the
                       previous bucket, the join is an EQUI-join on
                       (key, bucket) — candidate count is proportional to
                       actual temporal density, never |rows|² per key.
- ``sessionize_batch`` gap-based sessions (batch twin of the
                       applyInPandasWithState streaming sessionizer in
                       streaming/events.py): lag + running sum of
                       session-start flags, then one groupBy.

All three are pure JVM expressions (window/explode/groupBy) — whole-stage
codegen end-to-end, no Python in the data path. Timestamps are compared in
exact integer microseconds (``unix_micros``) so semantics are reproducible
across engines (the DuckDB oracle uses ``epoch_us``).

At 100 TB: every operator here shuffles exactly once on the entity key
(user_id/conv_id). Skewed keys (one user with 10^8 events) can be pre-salted
for asof/sessionize only if the gap logic is applied per salt-span with
boundary stitching; we keep the unsalted form and rely on AQE skew-split for
the window sort, which Spark handles since the window is rows-based.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _us(col) -> Column:
    """Exact integer microseconds since epoch. Parquet-sourced timestamps may
    arrive as TIMESTAMP_NTZ (unix_micros only accepts TIMESTAMP); the cast
    interprets NTZ wall-time in the session timezone — callers pin it to UTC
    so this matches DuckDB's epoch_us over the same naive values."""
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast("timestamp"))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    right_seq: str | None = None,
    allow_exact: bool = True,
    suffix: str = "_asof",
) -> DataFrame:
    """For every left row, attach the most recent right row with
    ``right.ts <= left.ts`` (or ``<`` when ``allow_exact=False``) for the same
    ``on`` key. Right columns arrive as ``<col><suffix>`` (null when no prior
    right row exists).

    Ties among right rows at the same timestamp resolve to the largest
    ``right_seq`` (deterministic; defaults to the timestamp itself).

    Plan shape: union(tagged left, tagged right) → window(partitionBy=key,
    orderBy=(ts, side, seq), rowsBetween(unboundedPreceding, currentRow))
    with ``last(ignorenulls)`` per carried column → filter side=left. One hash
    shuffle on the key; the window sort is the only per-key work.
    """
    lcols = left.columns
    # side tag: right rows must sort BEFORE left rows at equal ts when
    # allow_exact (so an exact-ts right row is visible), after otherwise.
    right_side = F.lit(0 if allow_exact else 2)
    seq = F.col(right_seq) if right_seq else F.col(right_ts).cast("long")

    l_tagged = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast("long").alias("_seq"),
        F.struct(*[F.col(c) for c in lcols]).alias("_lrow"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in right_cols],
    )
    r_tagged = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        right_side.alias("_side"),
        seq.cast("long").alias("_seq"),
        F.lit(None).cast(l_tagged.schema["_lrow"].dataType).alias("_lrow"),
        *[F.col(c).alias(f"_r_{c}") for c in right_cols],
    )
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_side", F.col("_seq").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = l_tagged.unionByName(r_tagged).select(
        "_side",
        "_lrow",
        *[F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_r_{c}") for c in right_cols],
    )
    return filled.filter(F.col("_side") == 1).select(
        *[F.col(f"_lrow.{c}").alias(c) for c in lcols],
        *[F.col(f"_r_{c}").alias(f"{c}{suffix}") for c in right_cols],
    )


def range_self_join(
    df: DataFrame,
    key: str,
    ts: str,
    id_col: str,
    max_gap_sec: float,
    payload_cols: list[str] | None = None,
) -> DataFrame:
    """All ordered pairs (a, b) within the same ``key`` with
    ``0 <= ts_b - ts_a <= max_gap_sec`` and ``(ts_a, id_a) < (ts_b, id_b)``.

    Bucketing keeps this an equi-join: bucket = floor(us / gap_us); any
    qualifying pair differs by at most one bucket, so the b-side emits
    (bucket, bucket-1) and the join key is (key, bucket). Each pair matches
    exactly one emission — no post-join dedup needed.

    Returns (key, id_a, id_b, gap_us) plus ``payload_cols`` from both sides
    as ``<col>_a``/``<col>_b``.
    """
    payload_cols = payload_cols or []
    gap_us = int(max_gap_sec * 1_000_000)
    if gap_us < 1:
        # floor(_us / 0) with ANSI off yields null buckets and the equi-join
        # silently returns empty instead of the simultaneous pairs.
        raise ValueError(f"max_gap_sec={max_gap_sec} is below 1 microsecond")
    base = df.select(
        F.col(key).alias("_k"),
        _us(ts).alias("_us"),
        F.col(id_col).alias("_id"),
        *[F.col(c).alias(f"_p_{c}") for c in payload_cols],
    )
    a = base.withColumn("_bkt", F.floor(F.col("_us") / gap_us))
    b = a.withColumn("_jb", F.explode(F.array(F.col("_bkt"), F.col("_bkt") - 1))).drop(
        "_bkt"
    )
    pair_order = (F.col("a._us") < F.col("b._us")) | (
        (F.col("a._us") == F.col("b._us")) & (F.col("a._id") < F.col("b._id"))
    )
    return (
        a.alias("a")
        .join(
            b.alias("b"),
            (F.col("a._k") == F.col("b._k")) & (F.col("a._bkt") == F.col("b._jb")),
        )
        .filter(pair_order & (F.col("b._us") - F.col("a._us") <= gap_us))
        .select(
            F.col("a._k").alias(key),
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            (F.col("b._us") - F.col("a._us")).alias("gap_us"),
            *[F.col(f"a._p_{c}").alias(f"{c}_a") for c in payload_cols],
            *[F.col(f"b._p_{c}").alias(f"{c}_b") for c in payload_cols],
        )
    )


def sessionize_batch(
    events: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    id_col: str = "event_id",
    gap_sec: float = 1800.0,
    value_col: str | None = None,
) -> DataFrame:
    """Gap-based sessionization, batch form: a new session starts when the
    gap to the previous event of the same key exceeds ``gap_sec``.

    Output: (key, session_id, n_events, start_us, end_us[, sum_value]) where
    ``session_id`` is 1-based per key in time order. Exactly one shuffle on
    the key (window + groupBy share the partitioning; Catalyst reuses the
    exchange).
    """
    gap_us = int(gap_sec * 1_000_000)
    w = Window.partitionBy(key).orderBy("_us", id_col)
    ev = events.select(
        key,
        _us(ts).alias("_us"),
        id_col,
        *([F.col(value_col)] if value_col else []),
    )
    flagged = ev.withColumn(
        "_new",
        F.when(
            F.col("_us") - F.lag("_us").over(w) > F.lit(gap_us), F.lit(1)
        ).otherwise(F.lit(0)),
    ).withColumn(
        "_sess",
        F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        + 1,
    )
    aggs = [
        F.count("*").alias("n_events"),
        F.min("_us").alias("start_us"),
        F.max("_us").alias("end_us"),
    ]
    if value_col:
        # Sum in exact decimal and STAY in decimal: double summation is
        # partition-order dependent, and even a deterministic double can
        # render differently across engines/canonicalizers (the round-2
        # driver red row survived a builder-side bit-exact green).
        # decimal(18,6) represents the source values exactly (≤4 decimal
        # digits), the decimal sum is exact and order-free, and
        # decimal(18,2) is rendered identically everywhere.
        aggs.append(
            F.round(F.sum(F.col(value_col).cast("decimal(18,6)")), 2)
            .cast("decimal(18,2)")
            .alias("sum_value")
        )
    return (
        flagged.groupBy(F.col(key), F.col("_sess").alias("session_id"))
        .agg(*aggs)
    )
