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
(user_id/conv_id). Skewed keys are the honest caveat: AQE skew handling
splits JOIN partitions, NOT window exchanges, so a single key with 10^8
events would serialize its window sort into one task in the unsalted
paths. Both asof_join and sessionize_batch therefore default to
``span_sec="auto"``: a bounded sampled probe (``_auto_span_sec``) estimates
the hottest key's row count and engages span salting only when it exceeds
``skew_threshold`` (default 5M rows — one comfortable window-sort task).
``sessionize_batch(span_sec=...)`` is that mitigation: time-span salting with
boundary stitching (gap logic is per-adjacent-pair, so sessionizing within
(key, time-span) partitions and merging sessions across span boundaries is
exactly equivalent — proven by the equivalence test in test_temporal).
``asof_join(span_sec=...)`` is the same idea with right-row CARRY-OVER:
matching runs within (key, time-span) partitions, then the last right row
of each span (a per-(key, span) SUMMARY frame, rows ∝ spans) is carried
forward across span boundaries so left rows whose match lives in an
earlier span still find it — row-identical to the unsalted path
(equivalence-tested on a mega-key corpus).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from nebula_importer_spark.operators._buckets import guarded_bucket


def _us(col) -> Column:
    """Exact integer microseconds since epoch. Parquet-sourced timestamps may
    arrive as TIMESTAMP_NTZ (unix_micros only accepts TIMESTAMP); the cast
    interprets NTZ wall-time in the session timezone — callers pin it to UTC
    so this matches DuckDB's epoch_us over the same naive values."""
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast("timestamp"))


# Auto-salting probe knobs. DEFAULT_SKEW_THRESHOLD is the per-key row count
# one window task is allowed to sort serially before span salting kicks in;
# 5M rows ≈ a few hundred MB of tagged rows, comfortably one-task work.
DEFAULT_SKEW_THRESHOLD = 5_000_000
_PROBE_ROWS = 100_000  # target sample size for the per-key estimate
_OVERSPLIT = 4  # events cluster in time; oversplit so real spans stay small


def _auto_span_sec(probe: DataFrame, key: str, ts: str, threshold: int) -> float | None:
    """Sampled skew probe backing ``span_sec="auto"``: estimate the hottest
    key's row count; return a salting span (seconds) that splits that key
    into time slices of ≲ threshold/``_OVERSPLIT`` estimated rows, or None
    when no key needs salting.

    Cost discipline (this is AQE-style planning statistics, not data-path
    work): one column-pruned ``count()`` always; if and only if the total
    could hide a >threshold key, one seeded-sample aggregation whose result
    is a SINGLE row (the only ``.collect()`` here is that 1-row summary).
    Deterministic for a fixed input + seed, so plans are reproducible.

    Honest caveat: the probe EXECUTES the input's lineage at DataFrame-
    construction time (1-2 jobs), and the real query recomputes it — cheap
    for source scans (column-pruned count over parquet), but for an
    expensive un-persisted upstream this can double input compute. Callers
    with such inputs should persist the input first or pass an explicit
    ``span_sec`` (``None`` forces the unsalted window, no probe).
    """
    if probe.isStreaming:
        return None  # batch-only mitigation; streaming has its own sessionizer
    total = probe.count()
    if total <= threshold:
        return None  # no key can exceed the threshold; skip the sample pass
    frac = min(1.0, _PROBE_ROWS / total)
    hot = (
        probe.select(F.col(key).alias("_k"), _us(ts).alias("_pus"))
        .sample(fraction=frac, seed=7)
        .groupBy("_k")
        .agg(
            F.count("*").alias("_c"),
            F.min("_pus").alias("_mn"),
            F.max("_pus").alias("_mx"),
        )
        .orderBy(F.desc("_c"), "_k")
        .limit(1)
        .collect()
    )
    if not hot:
        return None
    est = hot[0]["_c"] / frac
    if est <= threshold:
        return None
    if hot[0]["_mx"] is None or hot[0]["_mn"] is None:
        # hottest key's sampled timestamps are all NULL/uncastable — span
        # labels would be meaningless; fall back to the unsalted window,
        # which handles null timestamps exactly as before auto-salting
        return None
    dur_us = max(int(hot[0]["_mx"]) - int(hot[0]["_mn"]), 1)
    splits = max(int(est * _OVERSPLIT // threshold) + 1, 2)
    return max(dur_us // splits, 1) / 1e6


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
    span_sec: float | str | None = "auto",
    skew_threshold: int = DEFAULT_SKEW_THRESHOLD,
) -> DataFrame:
    """For every left row, attach the most recent right row with
    ``right.ts <= left.ts`` (or ``<`` when ``allow_exact=False``) for the same
    ``on`` key. Right columns arrive as ``<col><suffix>`` (null when no prior
    right row exists).

    Ties among right rows at the same timestamp resolve to the largest
    ``right_seq`` (deterministic; defaults to the timestamp itself).

    Plan shape: union(tagged left, tagged right) → window(partitionBy=key,
    orderBy=(ts, side, seq), rowsBetween(unboundedPreceding, currentRow))
    with ``last(ignorenulls)`` over ONE whole-row struct → filter side=left.
    One hash shuffle on the key; the window sort is the only per-key work.
    The struct carry keeps whole-row semantics: a matched right row whose
    carried column is legitimately NULL stays NULL instead of borrowing
    that column from an older right row.

    ``span_sec`` controls MEGA-KEY salting (the 100-TB path for one key
    holding a large fraction of all rows): matching runs within
    (key, floor(ts/span)) partitions, and left rows with no in-span match
    take the carried last-right-row of the nearest earlier span — computed
    on a per-(key, span) summary frame (rows ∝ spans, not events), so no
    task ever sorts a whole mega key. Row-identical to the unsalted path.
    The default ``"auto"`` runs the sampled skew probe (``_auto_span_sec``)
    over the UNION of both sides' (key, ts) — the window sorts the union —
    and salts only when the hottest key is estimated above
    ``skew_threshold`` rows; pass ``None`` to force the unsalted window or
    a float to force a specific span.
    """
    if span_sec == "auto":
        # cast both ts to timestamp BEFORE the union: the two sides may use
        # different-but-supported ts types (timestamp vs epoch seconds) that
        # _us() reconciles per side but unionByName cannot
        probe = left.select(
            F.col(on).alias("_k"), F.col(left_ts).cast("timestamp").alias("_pts")
        ).unionByName(
            right.select(
                F.col(on).alias("_k"), F.col(right_ts).cast("timestamp").alias("_pts")
            )
        )
        span_sec = _auto_span_sec(probe, "_k", "_pts", skew_threshold)
    lcols = left.columns
    # side tag: right rows must sort BEFORE left rows at equal ts when
    # allow_exact (so an exact-ts right row is visible), after otherwise.
    right_side = F.lit(0 if allow_exact else 2)
    seq = F.col(right_seq) if right_seq else F.col(right_ts).cast("long")

    # _ts is normalized to timestamp on BOTH sides: ordering is unchanged
    # for timestamp inputs, and mixed-but-castable ts types (timestamp vs
    # epoch-seconds long) union cleanly — _us() applies the same cast.
    l_tagged = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).cast("timestamp").alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast("long").alias("_seq"),
        F.struct(*[F.col(c) for c in lcols]).alias("_lrow"),
        F.lit(None)
        .cast(
            T.StructType(
                [T.StructField(c, right.schema[c].dataType) for c in right_cols]
            )
        )
        .alias("_rrow"),
    )
    r_tagged = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).cast("timestamp").alias("_ts"),
        right_side.alias("_side"),
        seq.cast("long").alias("_seq"),
        F.lit(None).cast(l_tagged.schema["_lrow"].dataType).alias("_lrow"),
        F.struct(*[F.col(c) for c in right_cols]).alias("_rrow"),
    )

    def _out(matched: DataFrame) -> DataFrame:
        return matched.select(
            *[F.col(f"_lrow.{c}").alias(c) for c in lcols],
            *[F.col(f"_rmatch.{c}").alias(f"{c}{suffix}") for c in right_cols],
        )

    if span_sec is not None:
        return _out(_asof_spans(l_tagged, r_tagged, int(span_sec * 1_000_000)))
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_side", F.col("_seq").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = l_tagged.unionByName(r_tagged).select(
        "_side",
        "_lrow",
        F.last("_rrow", ignorenulls=True).over(w).alias("_rmatch"),
    )
    return _out(filled.filter(F.col("_side") == 1))


def _floor_div_us(col_name: str, unit_us: int) -> Column:
    """floor(us / unit) in EXACT integer arithmetic. Double division rounds
    beyond 2^53 µs and can mislabel boundary rows into a neighboring
    bucket/span (the hazard _asof_spans documents); ``us - pmod(us, unit)``
    is an exact multiple of ``unit`` at any long magnitude, so integer
    ``div`` recovers the floor quotient exactly (pmod ≥ 0 makes this true
    for negative timestamps too, where ``div`` alone truncates upward)."""
    return F.expr(f"(`{col_name}` - pmod(`{col_name}`, {unit_us})) div {unit_us}")


def _asof_spans(l_tagged: DataFrame, r_tagged: DataFrame, span_us: int) -> DataFrame:
    """Span-salted asof core over the tagged frames (see asof_join). Returns
    left rows as (_lrow, _rmatch). Exactness argument: span boundaries
    partition time, so a left row's match is either (a) the last preceding
    right row in its OWN span — found by the in-span window with identical
    ordering — or (b) the overall last right row of the nearest earlier
    span that has one. The per-span last right row is order-reduced with
    max_by over the same (ts, seq) order; the carry across spans uses a
    summary-level window where a left span sorts BEFORE the right summary
    of the same span, so only strictly-earlier spans are visible (in-span
    rights are already handled by (a), whatever their tie order)."""
    if span_us < 1:
        raise ValueError("span_sec must be at least 1 microsecond")
    # exact integer span label (us - us % span): double division would
    # round beyond 2^53 microseconds and could mislabel boundary rows
    def _span_label(df: DataFrame) -> DataFrame:
        us = _us(F.col("_ts"))
        return df.withColumn("_span", us - F.pmod(us, F.lit(span_us)))

    l_sp = _span_label(l_tagged)
    r_sp = _span_label(r_tagged)
    w_in = (
        Window.partitionBy("_k", "_span")
        .orderBy("_ts", "_side", F.col("_seq").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    lefts = (
        l_sp.unionByName(r_sp)
        .select(
            "_k",
            "_span",
            "_side",
            "_lrow",
            F.last("_rrow", ignorenulls=True).over(w_in).alias("_rin"),
        )
        .filter(F.col("_side") == 1)
    )
    # Last right row per (key, span): max_by over (ts, seq) mirrors the
    # window order for right rows (side is constant within the right side;
    # null seq sorts first in the window ⇒ coalesce to MIN_LONG here).
    r_summ = r_sp.groupBy("_k", "_span").agg(
        F.max_by(
            "_rrow",
            F.struct(F.col("_ts"), F.coalesce("_seq", F.lit(-(2**63))).alias("_seq")),
        ).alias("_rlast")
    )
    rlast_type = r_summ.schema["_rlast"].dataType
    l_spans = (
        lefts.select("_k", "_span")
        .distinct()
        .withColumn("_tag", F.lit(0))
        .withColumn("_rlast", F.lit(None).cast(rlast_type))
    )
    w_carry = (
        Window.partitionBy("_k")
        .orderBy("_span", "_tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carry = (
        l_spans.unionByName(r_summ.withColumn("_tag", F.lit(1)))
        .select(
            "_k",
            "_span",
            "_tag",
            F.last("_rlast", ignorenulls=True).over(w_carry).alias("_rprev"),
        )
        .filter(F.col("_tag") == 0)
        .select("_k", "_span", "_rprev")
    )
    return lefts.join(carry, ["_k", "_span"], "left").select(
        "_lrow", F.coalesce("_rin", "_rprev").alias("_rmatch")
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
    a = base.withColumn("_bkt", _floor_div_us("_us", gap_us))
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
    span_sec: float | str | None = "auto",
    skew_threshold: int = DEFAULT_SKEW_THRESHOLD,
) -> DataFrame:
    """Gap-based sessionization, batch form: a new session starts when the
    gap to the previous event of the same key exceeds ``gap_sec``.

    Output: (key, session_id, n_events, start_us, end_us[, sum_value]) where
    ``session_id`` is 1-based per key in time order. Default path: exactly
    one shuffle on the key (window + groupBy share the partitioning).

    ``span_sec`` controls MEGA-KEY salting (the 100-TB path for skewed
    keys, e.g. one user holding 10% of all events): rows are windowed
    within (key, floor(ts/span)) partitions — a mega key spreads over
    time-span tasks instead of serializing into one — then sessions are
    stitched across span boundaries on a per-(key, span) SUMMARY frame
    (rows ∝ spans, not events). The stitch is exact: a span's first
    session merges with the previous span's last session iff their
    boundary events are within the gap, and the global session id is
    cumulative-sessions-before − cumulative-merges + local id, which
    collapses chained merges transitively. Result is row-identical to the
    unsalted path (equivalence-tested).

    The default ``"auto"`` runs the sampled skew probe (``_auto_span_sec``)
    and salts only when the hottest key is estimated above
    ``skew_threshold`` rows; pass ``None`` to force the unsalted window or
    a float to force a specific span.
    """
    gap_us = int(gap_sec * 1_000_000)
    if span_sec == "auto":
        span_sec = _auto_span_sec(events, key, ts, skew_threshold)
    ev = events.select(
        key,
        _us(ts).alias("_us"),
        id_col,
        *([F.col(value_col)] if value_col else []),
    )
    if span_sec is not None:
        return _sessionize_spans(ev, key, id_col, gap_us, int(span_sec * 1_000_000), value_col)
    w = Window.partitionBy(key).orderBy("_us", id_col)
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


def _sessionize_spans(
    ev: DataFrame,
    key: str,
    id_col: str,
    gap_us: int,
    span_us: int,
    value_col: str | None,
) -> DataFrame:
    """Salt-span sessionization with boundary stitching (see
    sessionize_batch). Value sums stay UNROUNDED exact decimal through the
    local stage so the final rounded sum is identical to the unsalted path.
    """
    if span_us < 1:
        raise ValueError("span_sec must be at least 1 microsecond")
    ev = ev.withColumn("_span", _floor_div_us("_us", span_us))
    w = Window.partitionBy(key, "_span").orderBy("_us", id_col)
    flagged = ev.withColumn(
        "_new",
        F.when(F.col("_us") - F.lag("_us").over(w) > F.lit(gap_us), F.lit(1)).otherwise(
            F.lit(0)
        ),
    ).withColumn(
        "_lsess",
        F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        + 1,
    )
    loc_aggs = [
        F.count("*").alias("n_events"),
        F.min("_us").alias("start_us"),
        F.max("_us").alias("end_us"),
    ]
    if value_col:
        loc_aggs.append(F.sum(F.col(value_col).cast("decimal(18,6)")).alias("_sumv"))
    loc = flagged.groupBy(key, "_span", "_lsess").agg(*loc_aggs)

    # span-level summary: rows ∝ number of (key, span) pairs — tiny relative
    # to events; the only per-KEY serial work happens here.
    summ = loc.groupBy(key, "_span").agg(
        F.max("_lsess").alias("_n"),
        F.min("start_us").alias("_first"),
        F.max("end_us").alias("_last"),
    )
    ws = Window.partitionBy(key).orderBy("_span")
    summ = (
        summ.withColumn(
            "_merge",
            F.when(
                F.col("_first") - F.lag("_last").over(ws) <= F.lit(gap_us), F.lit(1)
            ).otherwise(F.lit(0)),
        )
        .withColumn(
            "_off",
            F.coalesce(
                F.sum("_n").over(ws.rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0),
            )
            - F.sum("_merge").over(
                ws.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .select(key, "_span", "_off")
    )
    out_aggs = [
        F.sum("n_events").alias("n_events"),
        F.min("start_us").alias("start_us"),
        F.max("end_us").alias("end_us"),
    ]
    if value_col:
        out_aggs.append(
            F.round(F.sum("_sumv"), 2).cast("decimal(18,2)").alias("sum_value")
        )
    return (
        loc.join(summ, [key, "_span"])
        .groupBy(F.col(key), (F.col("_off") + F.col("_lsess")).alias("session_id"))
        .agg(*out_aggs)
    )


def burst_scores(
    df: DataFrame,
    *,
    ts_col: str = "ts",
    key_col: str = "event_type",
    bucket_sec: int = 3600,
    baseline_buckets: int = 24,
    min_baseline_buckets: int = 6,
) -> DataFrame:
    """Sliding-window burst detection over an event stream: per
    (key, time bucket), the event count scored against the trailing
    baseline window — ``burst_score = n · baseline_buckets / Σ n_prev``,
    i.e. the ratio of this bucket's count to the baseline's mean
    PER-BUCKET rate with empty buckets counted as zero (a RANGE frame
    over the integer bucket index, not a ROWS frame — a ROWS frame would
    silently skip gaps and understate bursts after quiet periods).

    Scale shape: one partial-agg'd groupBy onto (key, bucket) — the raw
    events reduce map-side, so the window pass runs over |keys|·|buckets|
    rows, not |events| — then one window per key. Key domains are small
    (event taxonomies); a mega-key is impossible after bucketing because
    the window rows per key are bounded by the time range / bucket_sec.
    Everything up to the final ratio is integer arithmetic (exact sums,
    deterministic division — the one double op per output row).

    Warm-up rows with fewer than ``min_baseline_buckets`` NONEMPTY
    baseline buckets are dropped (a 1-bucket baseline calls everything a
    burst). Returns ``(key_col, bucket, n_events, baseline_total,
    burst_score)``; ``bucket`` is the epoch//bucket_sec integer — render
    with ``to_timestamp(bucket * bucket_sec)``.
    """
    if bucket_sec < 1:
        raise ValueError(f"bucket_sec must be >= 1, got {bucket_sec}")
    if baseline_buckets < 1:
        raise ValueError(f"baseline_buckets must be >= 1, got {baseline_buckets}")
    if not 1 <= min_baseline_buckets <= baseline_buckets:
        raise ValueError(
            f"min_baseline_buckets must be in [1, {baseline_buckets}], "
            f"got {min_baseline_buckets}"
        )
    counts = (
        df.select(
            F.col(key_col).alias("_k"),
            F.floor(
                F.unix_timestamp(F.col(ts_col)) / F.lit(bucket_sec)
            ).cast("long").alias("bucket"),
        )
        .groupBy("_k", "bucket")
        .agg(F.count("*").alias("n_events"))
    )
    w = (
        Window.partitionBy("_k")
        .orderBy("bucket")
        .rangeBetween(-baseline_buckets, -1)
    )
    scored = counts.select(
        "_k",
        "bucket",
        "n_events",
        F.sum("n_events").over(w).alias("baseline_total"),
        F.count("n_events").over(w).alias("_nprev"),
    )
    return scored.filter(F.col("_nprev") >= min_baseline_buckets).select(
        F.col("_k").alias(key_col),
        "bucket",
        "n_events",
        "baseline_total",
        (
            (F.col("n_events") * baseline_buckets).cast("double")
            / F.col("baseline_total")
        ).alias("burst_score"),
    )


def time_weighted_avg(
    events: DataFrame,
    *,
    key: str = "user_id",
    ts: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    value_decimals: int = 2,
    scale: int = 10**6,
) -> DataFrame:
    """Time-weighted average of an irregularly-sampled value per key — the
    telemetry integral (TimescaleDB's ``time_weight``, left-continuous
    step interpolation): each observation holds until the next one, so
    TWA = Σ valueᵢ·Δtᵢ / Σ Δtᵢ over the key's observation span. The
    correct average for irregular samples, where a plain AVG over-weights
    bursts.

    Exact-integer contract: values are fixed-point with
    ``value_decimals`` digits (validated nowhere — the caller asserts the
    data contract; a training-pipeline metrics column is), so
    ``value·10^d`` is an exact long, ``Σ units·Δt`` is an exact long
    (order-free), and the final ``twa_scaled = scale·Σ(units·Δt) div
    (10^d·ΣΔt)`` is one integer floor division — hash-stable in any
    engine, no float accumulates anywhere. Δt is whole seconds with
    PER-TIMESTAMP floor (fractional seconds truncate before subtraction,
    matching ``unix_timestamp``).

    Distributed shape: ONE key-ordered window (lead on ``(ts, id)`` — the
    id tiebreak makes equal-timestamp ordering deterministic; zero-Δt
    pairs then carry zero weight) and the summary agg reuses the window's
    partitioning. Mega-key skew mitigations are the sessionize family's
    (span-salting upstream).

    Returns ``(key, n_intervals, span_sec, twa_scaled)`` for keys with
    ≥2 observations and a positive span (single observations define no
    interval; an all-same-second key has span 0 and no average).
    """
    if value_decimals < 0:
        raise ValueError(f"value_decimals must be >= 0, got {value_decimals}")
    unit = 10**value_decimals
    w = Window.partitionBy(key).orderBy(ts, id_col)
    ep = F.unix_timestamp(F.col(ts))  # whole seconds, truncating
    units = F.round(F.col(value_col) * unit).cast("long")
    stepped = events.select(
        key,
        units.alias("_u"),
        (F.lead(ep).over(w) - ep).alias("_dt"),
    ).filter(F.col("_dt").isNotNull())
    agg = stepped.groupBy(key).agg(
        F.count(F.lit(1)).cast("long").alias("n_intervals"),
        F.sum("_dt").cast("long").alias("span_sec"),
        F.sum(F.col("_u") * F.col("_dt")).cast("long").alias("_wsum"),
    )
    return agg.filter(F.col("span_sec") > 0).select(
        key,
        "n_intervals",
        "span_sec",
        F.expr(f"({scale} * _wsum) div ({unit} * span_sec)").alias(
            "twa_scaled"
        ),
    )


def resample_locf(
    events: DataFrame,
    *,
    key: str = "user_id",
    ts: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    step_sec: int = 3600,
    max_span_buckets: int = 100_000,
) -> DataFrame:
    """Gap-filled regular resample with last-observation-carried-forward —
    the hypertable densify (TimescaleDB ``time_bucket_gapfill`` + ``locf``):
    per key, a regular ``step_sec`` grid spanning the key's observation
    range, each grid bucket holding the most recent observation at-or-before
    the bucket's end, with empty buckets filled from the last real value.

    Semantics (exact, engine-portable):
    - bucket = ``floor(epoch_seconds(ts)) div step_sec`` (per-timestamp
      floor, matching ``unix_timestamp`` truncation);
    - within a (key, bucket), the surviving observation is the one with the
      greatest ``(ts, id)`` — a deterministic tiebreak, not engine order;
    - the value is CARRIED, never interpolated — no arithmetic touches it,
      so floats pass through bit-identically;
    - ``is_gap`` marks carried rows, keeping fill provenance visible the
      way the reference keeps rejected rows visible (per-file stats,
      `/root/reference/pkg/stats/stats.go`).

    Distributed shape: one (key, bucket)-keyed row_number reduction, one
    key-keyed min/max agg (reuses the partitioning), a map-side
    ``sequence``+``explode`` grid (rows = span/step per key, guarded by
    ``max_span_buckets``), one co-keyed left join, and one key-ordered
    window for the forward fill. Nothing shuffles except on the key; the
    grid explode happens AFTER the per-bucket reduction, so it never
    multiplies raw observations. Mega-key spans are bounded: the window is
    over the densified grid (span/step rows per key), and a key whose grid
    would exceed ``max_span_buckets`` fails loudly rather than OOMing an
    executor.

    Returns ``(key, bucket_ts timestamp, value, is_gap boolean)``.
    """
    if step_sec <= 0:
        raise ValueError(f"step_sec must be positive, got {step_sec}")
    for c in (key, ts, id_col, value_col):
        if c not in events.columns:
            raise ValueError(f"column {c!r} not in input: {events.columns}")

    ep = F.expr(f"floor(unix_timestamp({ts}))").cast("long")
    bucketed = events.select(
        F.col(key),
        (ep - (ep % F.lit(step_sec))).alias("_bts"),
        F.col(ts),
        F.col(id_col),
        F.col(value_col).alias("_v"),
    )
    w = Window.partitionBy(key, "_bts").orderBy(
        F.col(ts).desc(), F.col(id_col).desc()
    )
    last_obs = (
        bucketed.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(key, "_bts", "_v")
    )
    bounds = last_obs.groupBy(key).agg(
        F.min("_bts").alias("_lo"), F.max("_bts").alias("_hi")
    )
    # the guard gates _hi itself so it cannot be pruned out of the plan
    guarded_hi = F.when(
        (F.col("_hi") - F.col("_lo"))
        >= F.lit(step_sec).cast("long") * F.lit(max_span_buckets).cast("long"),
        F.raise_error(
            F.concat(
                F.lit("resample_locf: key span exceeds max_span_buckets for "),
                F.col(key).cast("string"),
            )
        ).cast("long"),
    ).otherwise(F.col("_hi"))
    grid = bounds.select(
        key,
        F.explode(
            F.sequence("_lo", guarded_hi, F.lit(step_sec).cast("long"))
        ).alias("_bts"),
    )
    fill_w = (
        Window.partitionBy(key)
        .orderBy("_bts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(last_obs, [key, "_bts"], "left")
        .select(
            key,
            F.timestamp_seconds(F.col("_bts")).alias("bucket_ts"),
            F.last("_v", ignorenulls=True).over(fill_w).alias("value"),
            F.col("_v").isNull().alias("is_gap"),
            F.col("_bts"),
        )
        .drop("_bts")
    )


def cusum_change(
    df: DataFrame,
    *,
    ts_col: str = "ts",
    key_col: str = "event_type",
    bucket_sec: int = 3600,
    max_span_buckets: int = 100_000,
) -> DataFrame:
    """CUSUM level-shift detection per key (Page 1954): the complement of
    ``burst_scores`` — a burst is a transient spike against the trailing
    mean; CUSUM accumulates SUSTAINED drift from the key's overall mean
    rate, so a step change that never spikes (traffic migrating between
    services, a scraper ramping slowly) still peaks the statistic at the
    change point.

    Exact integer form: with ``B`` grid buckets and ``total`` events for
    the key, per-bucket drift is ``d_i = B·n_i − total`` (Σ d_i = 0 by
    construction — no float mean anywhere). The classic recursions
    ``S⁺_i = max(0, S⁺_{i−1} + d_i)`` / ``S⁻_i = max(0, S⁻_{i−1} − d_i)``
    are not window-expressible directly, but with prefix sums ``P_i``
    they close over two plain frames:
    ``S⁺_i = P_i − min(0, min_{j≤i} P_j)`` and
    ``S⁻_i = max(0, max_{j≤i} P_j) − P_i`` — running sum + running
    min/max, one window pass.

    Distributed shape: one partial-agg'd (key, bucket) reduction (raw
    events collapse map-side), the grid explode AFTER the reduction
    (empty buckets MUST count — the drift of a silent period is the
    signal; ``max_span_buckets`` fails loudly on a mega-span key, the
    resample_locf guard), one key-keyed window. The normalized magnitude
    ``*_ppm = 10⁶·S / (B·total)`` divides in DECIMAL(38,0) ``div`` (the
    exact_auc discipline — 10⁶·S wraps int64 at scale).

    Returns one row per key: ``(key_col, n_buckets, total_events,
    up_stat, up_bucket, up_ppm, down_stat, down_bucket, down_ppm)`` —
    the peak statistics and their earliest-peak buckets (the detected
    change points; ``bucket`` is the epoch div bucket_sec integer).
    Keys with a single bucket report zero stats (no shift is definable).
    """
    if bucket_sec < 1:
        raise ValueError(f"bucket_sec must be >= 1, got {bucket_sec}")
    if max_span_buckets < 1:
        raise ValueError(
            f"max_span_buckets must be >= 1, got {max_span_buckets}"
        )
    for c in (ts_col, key_col):
        if c not in df.columns:
            raise ValueError(f"column {c!r} not in input: {df.columns}")

    counts = (
        df.select(
            F.col(key_col).alias("_k"),
            F.floor(
                F.unix_timestamp(F.col(ts_col)) / F.lit(bucket_sec)
            ).cast("long").alias("_b"),
        )
        .groupBy("_k", "_b")
        .agg(F.count(F.lit(1)).cast("long").alias("_n"))
    )
    return _cusum_core(counts, key_col, max_span_buckets)


def cusum_from_buckets(
    bucketed: DataFrame,
    *,
    key_col: str = "key",
    bucket_col: str = "bucket",
    n_col: str = "n",
    max_span_buckets: int = 100_000,
) -> DataFrame:
    """CUSUM level-shift detection from an ALREADY-BUCKETED count table
    ``(key, bucket, n)`` - the entry point that makes the statistic
    STREAMABLE: per-bucket counts are mergeable partial sums (duplicate
    (key, bucket) rows re-sum here first), so micro-batches can each
    write their partial bucket counts and the merged table feeds this
    function to yield EXACTLY the batch ``cusum_change`` of the union
    (streaming/sketches.py:run_incremental_buckets / read_cusum).
    Semantics, guards, and output schema are cusum_change's - same
    machinery, same oracle."""
    if max_span_buckets < 1:
        raise ValueError(
            f"max_span_buckets must be >= 1, got {max_span_buckets}"
        )
    for c in (key_col, bucket_col, n_col):
        if c not in bucketed.columns:
            raise ValueError(
                f"column {c!r} not in input: {bucketed.columns}"
            )
    counts = (
        bucketed.select(
            F.col(key_col).alias("_k"),
            F.col(bucket_col).cast("long").alias("_b"),
            F.col(n_col).cast("long").alias("_n"),
        )
        .groupBy("_k", "_b")
        .agg(F.sum("_n").cast("long").alias("_n"))
    )
    return _cusum_core(counts, key_col, max_span_buckets)


def _cusum_core(
    counts: DataFrame, key_col: str, max_span_buckets: int
) -> DataFrame:
    bounds = counts.groupBy("_k").agg(
        F.min("_b").alias("_lo"),
        F.max("_b").alias("_hi"),
        F.sum("_n").alias("_total"),
    )
    guarded_hi = F.when(
        (F.col("_hi") - F.col("_lo")) >= F.lit(max_span_buckets).cast("long"),
        F.raise_error(
            F.concat(
                F.lit("cusum_change: key span exceeds max_span_buckets for "),
                F.col("_k").cast("string"),
            )
        ).cast("long"),
    ).otherwise(F.col("_hi"))
    grid = bounds.select(
        "_k",
        "_total",
        (F.col("_hi") - F.col("_lo") + F.lit(1)).alias("_nb"),
        F.explode(F.sequence("_lo", guarded_hi)).alias("_b"),
    )
    filled = grid.join(counts, ["_k", "_b"], "left").select(
        "_k",
        "_b",
        "_total",
        "_nb",
        (
            F.col("_nb") * F.coalesce(F.col("_n"), F.lit(0).cast("long"))
            - F.col("_total")
        ).alias("_d"),
    )
    w = (
        Window.partitionBy("_k")
        .orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    scored = (
        filled.withColumn("_p", F.sum("_d").over(w))
        .withColumn("_rmin", F.least(F.lit(0).cast("long"), F.min("_p").over(w)))
        .withColumn("_rmax", F.greatest(F.lit(0).cast("long"), F.max("_p").over(w)))
        .select(
            "_k",
            "_b",
            "_total",
            "_nb",
            (F.col("_p") - F.col("_rmin")).alias("_sp"),
            (F.col("_rmax") - F.col("_p")).alias("_sm"),
        )
    )
    # earliest-peak argmax: max of (stat, -bucket) picks the largest stat,
    # ties to the smallest bucket — deterministic, never engine order
    agg = scored.groupBy(F.col("_k").alias(key_col)).agg(
        F.min("_nb").cast("long").alias("n_buckets"),
        F.min("_total").cast("long").alias("total_events"),
        F.max(F.struct(F.col("_sp"), (-F.col("_b")).alias("_nb_"))).alias("_up"),
        F.max(F.struct(F.col("_sm"), (-F.col("_b")).alias("_nb_"))).alias("_dn"),
    )
    ppm = (
        lambda stat: F.expr(
            f"(CAST(1000000 AS DECIMAL(38,0)) * {stat})"
            f" div CAST(n_buckets * total_events AS DECIMAL(38,0))"
        ).cast("long")
    )
    return agg.select(
        key_col,
        "n_buckets",
        "total_events",
        F.col("_up._sp").cast("long").alias("up_stat"),
        (-F.col("_up._nb_")).cast("long").alias("up_bucket"),
        ppm("_up._sp").alias("up_ppm"),
        F.col("_dn._sm").cast("long").alias("down_stat"),
        (-F.col("_dn._nb_")).cast("long").alias("down_bucket"),
        ppm("_dn._sm").alias("down_ppm"),
    )


def max_concurrent(
    df: DataFrame,
    *,
    start_col: str,
    end_col: str,
    group_cols: list[str] | None = None,
    n_buckets: int = 64,
) -> DataFrame:
    """Exact sweep-line concurrency: the maximum number of
    simultaneously-open intervals per group (peak concurrent sessions,
    open connections, in-flight requests) and the EARLIEST instant it is
    reached. Intervals are half-open ``[start, end)`` — an interval
    ending exactly when another starts does not overlap it — with
    integral timestamps by contract (epoch ms/us; the module's integer
    discipline).

    Algorithm: each interval contributes (+1 at start, −1 at end); the
    concurrency at any instant is the running sum of deltas in
    (time, delta) order — delta ascending puts the −1s BEFORE the +1s at
    an equal instant, which IS the half-open semantics. The global
    running sum is computed WITHOUT a global sort via the two-level
    prefix machinery of metrics.exact_auc: equal-width order-preserving
    time buckets (broadcast per-group min/max), a per-(group, bucket)
    window prefix, and an exclusive prefix over the ≤ n_buckets bucket
    totals joined back as offsets.

    Determinism at ties: within a run of equal (time, delta) rows every
    position's cumulative value is fixed (same-sign run — the sum rises
    or falls monotonically through it), so ``max`` and its earliest time
    are engine- and order-independent even though the rows within the
    run are interchangeable.

    NULL starts/ends are rejected loudly (an interval without endpoints
    is a data bug). Intervals with ``end < start`` are rejected via the
    same fail-fast probe. Returns one row per group:
    ``(*group_cols, n_intervals, max_concurrent, at_ts)``.
    """
    from pyspark.sql import types as T

    groups = list(group_cols or [])
    for c in (start_col, end_col, *groups):
        if c not in df.columns:
            raise ValueError(f"column {c!r} not in input: {df.columns}")
    integral = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
    for c in (start_col, end_col):
        if not isinstance(df.schema[c].dataType, integral):
            raise ValueError(
                f"{c!r} must be integral epoch units (convert timestamps "
                f"caller-side), got {df.schema[c].dataType.simpleString()}"
            )
    s, e = F.col(start_col), F.col(end_col)
    bad = df.filter(
        s.isNull() | e.isNull() | (e < s)
    ).limit(1)
    if bad.take(1):
        raise ValueError(
            f"NULL or inverted interval in input ({start_col}/{end_col})"
        )

    gcols = [F.col(c) for c in groups]
    deltas = df.select(
        *groups, s.cast("long").alias("_t"), F.lit(1).alias("_d")
    ).unionByName(
        df.select(*groups, e.cast("long").alias("_t"), F.lit(-1).alias("_d"))
    )
    key = groups if groups else []
    stats = deltas.groupBy(*key).agg(
        F.min("_t").alias("_mn"), F.max("_t").alias("_mx"),
        (F.count(F.lit(1)) / 2).cast("long").alias("n_intervals"),
    )
    joined = (
        deltas.join(F.broadcast(stats), key)
        if key
        else deltas.crossJoin(F.broadcast(stats))
    )
    bucketed = joined.withColumn(
        "_b", guarded_bucket("_t - _mn", n_buckets, op="max_concurrent")
    )
    w_local = (
        Window.partitionBy(*key, "_b")
        .orderBy(F.col("_t").asc(), F.col("_d").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = bucketed.withColumn("_cum_local", F.sum("_d").over(w_local))
    totals = bucketed.groupBy(*key, "_b").agg(F.sum("_d").alias("_bt"))
    w_off = (
        Window.partitionBy(*key)
        .orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.withColumn(
        "_off", F.coalesce(F.sum("_bt").over(w_off), F.lit(0).cast("long"))
    ).select(*key, "_b", "_off")
    cum = local.join(F.broadcast(offsets), [*key, "_b"]).withColumn(
        "_cum", F.col("_cum_local") + F.col("_off")
    )
    # max concurrency + earliest instant achieving it: struct-max on
    # (cum, -t) picks the peak, ties by earliest time
    out = cum.groupBy(*key).agg(
        F.max(F.struct(F.col("_cum").alias("m"), (-F.col("_t")).alias("nt")))
        .alias("_peak"),
        F.max("n_intervals").alias("n_intervals"),  # constant per group
    )
    return out.select(
        *groups,
        F.col("n_intervals").cast("long").alias("n_intervals"),
        F.col("_peak.m").cast("long").alias("max_concurrent"),
        (-F.col("_peak.nt")).cast("long").alias("at_ts"),
    )


def autocorrelation(
    events: DataFrame,
    *,
    ts_col: str,
    bucket_sec: int = 3600,
    max_lag: int = 6,
    scale: int = 1_000_000,
) -> DataFrame:
    """Exact sample autocorrelation of the event-RATE series: bucket the
    stream into fixed windows (hourly by default), densify missing
    buckets to 0, and compute the lag-k sample ACF of the count series —
    the seasonality / burst-persistence diagnostic a pipeline runs
    before picking watermark widths, backfill chunk sizes, or
    anomaly-detection windows (pairs with ``cusum_change``: CUSUM finds
    the level SHIFT, ACF measures how sticky the level is).

    For counts ``x_1..x_N`` with ``S = Σx`` the lag-k ACF is

        r_k = Σ_{t≤N−k} (x_t − S/N)(x_{t+k} − S/N) / Σ_t (x_t − S/N)²

    Cleared of the mean's denominator (multiply through by N²):

        num_k = Σ_{t≤N−k} (N·x_t − S)(N·x_{t+k} − S)
        den   = Σ_t (N·x_t − S)²

    — ALL integers. Arithmetic runs in DECIMAL(38,0) (N²·max(x)² wraps
    int64 once N·max(x) passes ~3·10⁹ — the exact_auc discipline) and
    the emitted ``acf_micro = (scale·num_k) div den`` is one exact
    truncating division, so the result hashes identically on any
    engine and any partitioning. NULL timestamps are dropped and
    counted in every row (``n_null``).

    Distributed shape: the heavy input collapses to ≤ (time-range ÷
    ``bucket_sec``) rows in ONE map-side-combinable count aggregation;
    everything after — densify via a DISTRIBUTED ``spark.range`` over
    the [min,max] bucket span, the lag self-equi-join on ``idx+k``, the
    per-lag partial agg — runs on that bounded series, so cost scales
    with the TIME RANGE, never the event volume. Only 1-row AGGREGATE
    scalars (span, total, null count) cross to the driver (the
    diameter_bound / kcenter discipline); data rows never do. Empty
    input (no non-NULL timestamp) returns an empty frame.

    Returns one row per lag 1..``max_lag``:
    ``(lag, n_pairs, num_scaled, den_scaled, acf_micro, n_buckets,
    n_null)`` — num/den carried too so a caller can re-derive r_k at
    any precision.
    """
    if ts_col not in events.columns:
        raise ValueError(f"column {ts_col!r} not in input: {events.columns}")
    if bucket_sec < 1:
        raise ValueError(f"bucket_sec must be >= 1, got {bucket_sec}")
    if max_lag < 1:
        raise ValueError(f"max_lag must be >= 1, got {max_lag}")
    if scale < 1:
        raise ValueError(f"scale must be >= 1, got {scale}")

    spark = events.sparkSession
    counts = (
        events.select(_us(F.col(ts_col)).alias("_usv"))
        .select(
            F.when(
                F.col("_usv").isNotNull(),
                _floor_div_us("_usv", 1_000_000 * bucket_sec),
            ).alias("_i")
        )
        .groupBy("_i")
        .agg(F.count("*").alias("_x"))
    )
    counts = counts.localCheckpoint(eager=True)
    # 1-row AGGREGATE scalars cross to the driver (the diameter_bound /
    # kcenter discipline) — never data rows: bucket span, total count,
    # null count. The span feeds a DISTRIBUTED spark.range (a sequence()
    # explode would materialize the whole dense index in one task).
    stats = counts.agg(
        F.min("_i").alias("_mn"),
        F.max("_i").alias("_mx"),
        F.sum(F.when(F.col("_i").isNotNull(), F.col("_x"))).alias("_s"),
        F.sum(F.when(F.col("_i").isNull(), F.col("_x"))).alias("_nn"),
    ).collect()[0]
    out_schema = (
        "lag long, n_pairs long, num_scaled long, den_scaled long, "
        "acf_micro long, n_buckets long, n_null long"
    )
    if stats["_mn"] is None:
        return spark.createDataFrame([], out_schema)
    mn, mx = int(stats["_mn"]), int(stats["_mx"])
    n_buckets = mx - mn + 1
    s_total = int(stats["_s"])
    n_null = int(stats["_nn"] or 0)
    d38 = "decimal(38,0)"
    # centered term N·x_t − S in decimal, N and S as plan literals
    withn = (
        spark.range(mn, mx + 1)
        .select(F.col("id").alias("_i"))
        .join(counts.filter(F.col("_i").isNotNull()), "_i", "left")
        .select(
            "_i",
            (
                F.lit(n_buckets).cast(d38)
                * F.coalesce("_x", F.lit(0)).cast(d38)
                - F.lit(s_total).cast(d38)
            ).alias("_c"),
        )
    )
    lags = spark.range(1, max_lag + 1).select(
        F.col("id").cast("long").alias("lag")
    )
    left = withn.crossJoin(F.broadcast(lags)).select(
        "lag",
        (F.col("_i") + F.col("lag")).alias("_j"),
        F.col("_c").alias("_cl"),
    )
    pairs = left.join(
        withn.select(F.col("_i").alias("_j"), F.col("_c").alias("_cr")),
        "_j",
    )
    num = pairs.groupBy("lag").agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.sum(F.col("_cl") * F.col("_cr")).alias("_num"),
    )
    den = withn.agg(F.sum(F.col("_c") * F.col("_c")).alias("_den"))
    micro = F.expr(f"(CAST({scale} AS {d38}) * _num) div _den")
    return (
        lags.join(num, "lag", "left")
        .crossJoin(F.broadcast(den))
        .select(
            "lag",
            F.coalesce("n_pairs", F.lit(0)).cast("long").alias("n_pairs"),
            F.col("_num").cast("long").alias("num_scaled"),
            F.col("_den").cast("long").alias("den_scaled"),
            F.when(F.col("_den") > 0, micro).cast("long").alias("acf_micro"),
            F.lit(n_buckets).cast("long").alias("n_buckets"),
            F.lit(n_null).cast("long").alias("n_null"),
        )
        .orderBy("lag")
    )


def seasonal_profile(
    events: DataFrame,
    *,
    ts_col: str,
    bucket_sec: int = 3600,
    period: int = 24,
    scale: int = 1_000_000,
) -> DataFrame:
    """Exact seasonal profile of the event-rate series: bucket the
    stream (hourly by default), densify gaps to 0, and for each PHASE of
    the cycle (hour-of-day under the defaults) report how that phase's
    mean rate compares to the global mean, plus the phase's largest
    positive residual — the classic seasonal-index decomposition
    (ratio-to-moving-average family, here ratio-to-global on a fixed
    integer period) a pipeline consults before alerting thresholds,
    autoscaling schedules, or watermark widths. Completes the temporal
    diagnostic trio: :func:`cusum_change` finds level SHIFTS,
    :func:`autocorrelation` measures persistence, this isolates the
    CYCLE.

    All-integer contract: with ``S = Σx`` over ``N`` dense buckets and
    per-phase ``s_p, n_p``:

        seasonal_ppm_p = (s_p · N · scale) div (n_p · S)   -- phase mean
                                                            / global mean
        mean_milli_p   = (s_p · 1000) div n_p
        peak_excess_p  = max_t (x_t · n_p − s_p)            -- scaled by
                                                               n_p
    ``peak_bucket`` is the earliest bucket achieving the max (struct-max
    with negated-bucket tiebreak, the max_concurrent discipline).
    DECIMAL(38,0) keeps the ppm exact at any N; divisions truncate
    toward zero on both engines. NULL timestamps are dropped and
    reported (``n_null`` on every row). Empty input → empty frame.

    Distributed shape: identical to :func:`autocorrelation` — the heavy
    table collapses to a time-range-sized series in ONE partial agg,
    densify rides a distributed ``spark.range``, then ONE ``period``-key
    aggregation; only 1-row aggregate scalars reach the driver.
    """
    if ts_col not in events.columns:
        raise ValueError(f"column {ts_col!r} not in input: {events.columns}")
    if bucket_sec < 1:
        raise ValueError(f"bucket_sec must be >= 1, got {bucket_sec}")
    if period < 2:
        raise ValueError(f"period must be >= 2, got {period}")
    if scale < 1:
        raise ValueError(f"scale must be >= 1, got {scale}")

    spark = events.sparkSession
    counts = (
        events.select(_us(F.col(ts_col)).alias("_usv"))
        .select(
            F.when(
                F.col("_usv").isNotNull(),
                _floor_div_us("_usv", 1_000_000 * bucket_sec),
            ).alias("_i")
        )
        .groupBy("_i")
        .agg(F.count("*").alias("_x"))
        .localCheckpoint(eager=True)
    )
    stats = counts.agg(
        F.min("_i").alias("_mn"),
        F.max("_i").alias("_mx"),
        F.sum(F.when(F.col("_i").isNotNull(), F.col("_x"))).alias("_s"),
        F.sum(F.when(F.col("_i").isNull(), F.col("_x"))).alias("_nn"),
    ).collect()[0]
    out_schema = (
        "phase long, n_buckets long, total long, mean_milli long, "
        "seasonal_ppm long, peak_excess long, peak_bucket long, "
        "n_null long"
    )
    if stats["_mn"] is None:
        return spark.createDataFrame([], out_schema)
    mn, mx = int(stats["_mn"]), int(stats["_mx"])
    s_total = int(stats["_s"])
    n_null = int(stats["_nn"] or 0)
    n_total = mx - mn + 1
    d38 = "decimal(38,0)"
    dense = (
        spark.range(mn, mx + 1)
        .select(F.col("id").alias("_i"))
        .join(counts.filter(F.col("_i").isNotNull()), "_i", "left")
        .select(
            "_i",
            F.coalesce("_x", F.lit(0)).cast("long").alias("_x"),
            F.pmod(F.col("_i"), F.lit(period)).cast("long").alias("_p"),
        )
    )
    per_phase = dense.groupBy("_p").agg(
        F.count("*").cast("long").alias("_np"),
        F.sum("_x").cast("long").alias("_sp"),
    )
    # peak positive residual needs the phase totals back on the series:
    # one broadcast of ≤ period rows, then a struct-max per phase
    joined = dense.join(F.broadcast(per_phase), "_p")
    peak = joined.groupBy("_p").agg(
        F.max(
            F.struct(
                (F.col("_x") * F.col("_np") - F.col("_sp")).alias("e"),
                (-F.col("_i")).alias("nb"),
            )
        ).alias("_pk")
    )
    ppm = F.expr(
        f"(CAST(_sp AS {d38}) * CAST({n_total} AS {d38})"
        f" * CAST({scale} AS {d38}))"
        f" div (CAST(_np AS {d38}) * CAST({s_total} AS {d38}))"
    )
    out = per_phase.join(peak, "_p").select(
        F.col("_p").alias("phase"),
        F.col("_np").alias("n_buckets"),
        F.col("_sp").alias("total"),
        F.expr("(_sp * 1000) div _np").cast("long").alias("mean_milli"),
        (
            F.when(F.lit(s_total) > 0, ppm).cast("long")
        ).alias("seasonal_ppm"),
        F.col("_pk.e").cast("long").alias("peak_excess"),
        (-F.col("_pk.nb")).cast("long").alias("peak_bucket"),
        F.lit(n_null).cast("long").alias("n_null"),
    )
    return out.orderBy("phase")


def trend_fit(
    events: DataFrame,
    *,
    ts_col: str,
    key_cols: list[str],
    bucket_sec: int = 3600,
    scale: int = 1_000_000,
) -> DataFrame:
    """Exact per-key OLS trend of the event-rate series: bucket the
    stream into fixed windows and fit ``count = b0 + b1·bucket_index``
    per key by least squares, ALL in cleared-denominator integer form —
    the drift diagnostic that closes the temporal quartet (cusum = level
    SHIFT, acf = persistence, seasonal = cycle, this = monotone TREND),
    and the signal that sizes capacity plans / flags decaying sources
    before a backfill.

    Every key is fit over the SAME dense global grid ``[min_bucket,
    max_bucket]`` (slopes are comparable across keys), but the zero
    buckets are NEVER materialized: a zero count contributes nothing to
    ``Σy``, ``Σxy`` or ``Σy²``, and the grid-only sums are closed forms
    of the span ``T`` — ``Σx = T(T−1)/2``, ``Σx² = (T−1)T(2T−1)/6`` —
    so unlike the acf/seasonal densify there is NO range join at all.
    With ``S*`` the per-key sums over observed buckets:

        slope      = (T·Σxy − Σx·Σy) / (T·Σx² − Σx²_sum)   → slope_micro
        intercept  = (Σy·Σx² − Σx·Σxy) / den               → intercept_micro
        r²         = num² / (den · (T·Σy² − Σy²))          → r2_micro

    each emitted as ONE truncating ``div`` in DECIMAL(38,0) (the
    exact_auc discipline; magnitudes: num ≤ T²·max_count·T — int64
    wraps once T·max_count passes ~3·10⁹, decimal38 holds to 10³⁸).
    ``r2_micro`` is NULL for a constant series (zero variance), and
    slope/intercept are NULL when ``T == 1`` (vertical fit).

    Distributed shape: ONE map-side-combinable (key, bucket) count
    agg, then ONE key-keyed agg over the bounded per-key bucket rows —
    cost scales with distinct (key, bucket), never event volume. Only
    the 3 global 1-row scalars (span min/max, null count) cross to the
    driver. NULL timestamps are dropped and counted (``n_null`` on
    every row). Empty input returns an empty frame (key columns typed
    string in that degenerate case).

    Returns ``(key_cols…, n_buckets, n_obs, sum_y, slope_micro,
    intercept_micro, r2_micro, n_null)``.
    """
    if ts_col not in events.columns:
        raise ValueError(f"column {ts_col!r} not in input: {events.columns}")
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    for c in key_cols:
        if c not in events.columns:
            raise ValueError(f"column {c!r} not in input: {events.columns}")
    if bucket_sec < 1:
        raise ValueError(f"bucket_sec must be >= 1, got {bucket_sec}")
    if scale < 1:
        raise ValueError(f"scale must be >= 1, got {scale}")

    spark = events.sparkSession
    unit = 1_000_000 * bucket_sec
    tagged = events.select(
        *key_cols, _us(F.col(ts_col)).alias("_usv")
    ).select(
        *key_cols,
        F.when(
            F.col("_usv").isNotNull(), _floor_div_us("_usv", unit)
        ).alias("_i"),
    )
    counts = (
        tagged.groupBy(*key_cols, "_i")
        .agg(F.count("*").alias("_y"))
        .localCheckpoint(eager=True)
    )
    stats = counts.agg(
        F.min("_i").alias("_mn"),
        F.max("_i").alias("_mx"),
        F.sum(F.when(F.col("_i").isNull(), F.col("_y"))).alias("_nn"),
    ).collect()[0]
    key_schema = ", ".join(f"`{c}` string" for c in key_cols)
    out_schema = (
        f"{key_schema}, n_buckets long, n_obs long, sum_y long, "
        "slope_micro long, intercept_micro long, r2_micro long, "
        "n_null long"
    )
    if stats["_mn"] is None:
        return spark.createDataFrame([], out_schema)
    mn, mx = int(stats["_mn"]), int(stats["_mx"])
    n_null = int(stats["_nn"] or 0)
    t = mx - mn + 1
    sx = t * (t - 1) // 2
    sxx = (t - 1) * t * (2 * t - 1) // 6
    den = t * sxx - sx * sx  # 0 iff t == 1
    d38 = "decimal(38,0)"
    per_key = (
        counts.filter(F.col("_i").isNotNull())
        .select(
            *key_cols,
            (F.col("_i") - F.lit(mn)).cast(d38).alias("_x"),
            F.col("_y").cast(d38).alias("_yd"),
        )
        .groupBy(*key_cols)
        .agg(
            F.count("*").cast("long").alias("n_obs"),
            F.sum("_yd").alias("_sy"),
            F.sum(F.col("_x") * F.col("_yd")).alias("_sxy"),
            F.sum(F.col("_yd") * F.col("_yd")).alias("_syy"),
        )
    )
    num = F.expr(f"CAST({t} AS {d38}) * _sxy - CAST({sx} AS {d38}) * _sy")
    inum = F.expr(
        f"_sy * CAST({sxx} AS {d38}) - CAST({sx} AS {d38}) * _sxy"
    )
    yvar = F.expr(f"CAST({t} AS {d38}) * _syy - _sy * _sy")
    per_key = (
        per_key.withColumn("_num", num)
        .withColumn("_inum", inum)
        .withColumn("_r2den", F.lit(den).cast(d38) * yvar)
    )
    return per_key.select(
        *key_cols,
        F.lit(t).cast("long").alias("n_buckets"),
        "n_obs",
        F.col("_sy").cast("long").alias("sum_y"),
        F.when(
            F.lit(den) > 0,
            F.expr(f"(CAST({scale} AS {d38}) * _num) div {den}"),
        )
        .cast("long")
        .alias("slope_micro"),
        F.when(
            F.lit(den) > 0,
            F.expr(f"(CAST({scale} AS {d38}) * _inum) div {den}"),
        )
        .cast("long")
        .alias("intercept_micro"),
        F.when(
            F.col("_r2den") > 0,
            F.expr(f"(CAST({scale} AS {d38}) * _num * _num) div _r2den"),
        )
        .cast("long")
        .alias("r2_micro"),
        F.lit(n_null).cast("long").alias("n_null"),
    )


def interval_coverage(
    df: DataFrame,
    *,
    key_col: str,
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Union-of-intervals coverage per key — the sweep-line length
    computation behind uptime/SLA accounting, active-time billing, and
    "how many seconds was this user actually in-session" when sessions
    overlap (naive SUM(end−start) double-counts every overlap; this
    merges first).

    Half-open ``[start, end)`` semantics, exact integer arithmetic.
    A new disjoint segment starts where ``start > max(previous ends)``
    (the classic sweep: one running-max window, one running-sum segment
    id, one agg — all sharing ONE key exchange). NULL or inverted
    (``end < start``) intervals are rejected loudly — a negative
    interval is an upstream bug, not mergeable data; zero-length
    intervals are kept and contribute 0.

    Skew: the window partitions on ``key_col`` — a mega key serializes
    into one task, the same caveat as sessionize_batch (whose salted
    span mode is the template if a key exceeds the comfortable-sort
    threshold; coverage is segment-local, so span stitching applies).

    Returns ``(key, n_intervals, n_segments, covered, span)`` —
    ``covered`` the union length, ``span`` ``max(end) − min(start)``
    (so ``span − covered`` is the total gap time).
    """
    for c in (key_col, start_col, end_col):
        if c not in df.columns:
            raise ValueError(f"column {c!r} not in input: {df.columns}")
    base = df.select(
        F.col(key_col).alias("_k"),
        F.col(start_col).cast("long").alias("_s"),
        F.col(end_col).cast("long").alias("_e"),
    )
    bad = base.filter(
        F.col("_k").isNull()
        | F.col("_s").isNull()
        | F.col("_e").isNull()
        | (F.col("_e") < F.col("_s"))
    ).limit(1)
    if bad.take(1):
        raise ValueError(
            "intervals must have non-null key/start/end and end >= start"
        )
    w = Window.partitionBy("_k").orderBy("_s", "_e")
    prev_max = F.max("_e").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    tagged = base.withColumn(
        "_new",
        F.when(
            prev_max.isNull() | (F.col("_s") > prev_max), F.lit(1)
        ).otherwise(F.lit(0)),
    ).withColumn(
        "_seg",
        F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    segs = tagged.groupBy("_k", "_seg").agg(
        F.count(F.lit(1)).cast("long").alias("_n"),
        F.min("_s").alias("_smin"),
        F.max("_e").alias("_emax"),
    )
    return segs.groupBy(F.col("_k").alias("key")).agg(
        F.sum("_n").cast("long").alias("n_intervals"),
        F.count(F.lit(1)).cast("long").alias("n_segments"),
        F.sum(F.col("_emax") - F.col("_smin")).cast("long").alias(
            "covered"
        ),
        (F.max("_emax") - F.min("_smin")).cast("long").alias("span"),
    )


def theil_sen_trend(
    events: DataFrame,
    *,
    ts_col: str,
    key_cols: list[str],
    bucket_sec: int = 3600,
    scale: int = 1_000_000,
) -> DataFrame:
    """Theil-Sen robust trend of the event-rate series — the MEDIAN of
    all pairwise bucket-to-bucket slopes (Theil 1950 / Sen 1968), the
    outlier-proof twin of ``trend_fit``'s OLS: one burst hour drags a
    least-squares slope, but moves at most half the pairwise slopes, so
    the median stands (29.3% breakdown point vs OLS's zero).

    Exactness: pairwise slopes ``(y_j−y_i)/(x_j−x_i)`` are rationals,
    totally ordered WITHOUT big-integer quotients via the Euclidean
    decomposition ``(whole, frac)`` — ``whole = floor(num/den)`` (the
    pmod device, exact in int64), ``frac = (pmod(num,den)·10¹⁸) div
    den ∈ [0, 10¹⁸)`` — lexicographic order on the pair IS the rational
    order, and every component fits a long (a single 10¹⁸-scaled
    quotient wraps int64 once |slope| > 9.2, which real burst data
    hits). The median is the ELEMENT at 0-based ``(n_pairs−1) div 2``
    of that order (exact_quantiles' lower-median rule) — bit-stable on
    any engine. Emitted ``slope_micro = whole·10⁶ + frac div 10¹²`` =
    ``floor(slope·10⁶)`` exactly (FLOOR, not truncation — floors
    compose with the decomposition).

    Semantics: per key, over the key's OBSERVED buckets only (zero
    buckets are not data points here — unlike trend_fit's dense-grid
    OLS, the robust estimator treats absence as absence; the contract
    difference is deliberate and documented). Keys with < 2 observed
    buckets emit NULL slope.

    Scale: the heavy input collapses to (key, bucket) counts in ONE
    partial agg; the pairwise join runs per key on those bounded series
    rows (≤ (time-range/bucket)² pairs per key — metadata-sized for any
    sane grid; bound the range or widen buckets if not). Median pick =
    one window rank over the per-key pair table.

    Returns ``(key_cols…, n_obs, n_pairs, slope_micro, n_null)``.
    """
    if ts_col not in events.columns:
        raise ValueError(f"column {ts_col!r} not in input: {events.columns}")
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    for c in key_cols:
        if c not in events.columns:
            raise ValueError(f"column {c!r} not in input: {events.columns}")
    if bucket_sec < 1:
        raise ValueError(f"bucket_sec must be >= 1, got {bucket_sec}")
    if scale < 1:
        raise ValueError(f"scale must be >= 1, got {scale}")
    d38 = "decimal(38,0)"
    k18 = 10**18
    unit = 1_000_000 * bucket_sec
    tagged = events.select(
        *key_cols, _us(F.col(ts_col)).alias("_usv")
    ).select(
        *key_cols,
        F.when(
            F.col("_usv").isNotNull(), _floor_div_us("_usv", unit)
        ).alias("_i"),
    )
    counts = (
        tagged.groupBy(*key_cols, "_i")
        .agg(F.count("*").cast("long").alias("_y"))
        .localCheckpoint(eager=True)
    )
    n_null = (
        counts.filter(F.col("_i").isNull())
        .agg(F.coalesce(F.sum("_y"), F.lit(0)).alias("_nn"))
        .collect()[0]["_nn"]
    )
    obs = counts.filter(F.col("_i").isNotNull())
    stats = obs.groupBy(*key_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_obs")
    )
    a = obs.select(
        *key_cols, F.col("_i").alias("_xi"), F.col("_y").alias("_yi")
    )
    b = obs.select(
        *[F.col(c).alias(f"_b_{c}") for c in key_cols],
        F.col("_i").alias("_xj"),
        F.col("_y").alias("_yj"),
    )
    cond = F.col("_xj") > F.col("_xi")
    for c in key_cols:
        cond = cond & (F.col(c) == F.col(f"_b_{c}"))
    pairs = (
        a.join(b, cond)
        .withColumn("_num", F.col("_yj") - F.col("_yi"))
        .withColumn("_den", F.col("_xj") - F.col("_xi"))
        .withColumn("_r", F.pmod(F.col("_num"), F.col("_den")))
        .select(
            *key_cols,
            F.expr("(_num - _r) div _den").cast("long").alias("_wh"),
            F.expr(
                f"CAST((CAST(_r AS {d38}) * CAST({k18} AS {d38}))"
                f" div _den AS BIGINT)"
            ).alias("_fr"),
        )
    )
    w = Window.partitionBy(*key_cols).orderBy("_wh", "_fr")
    wc = Window.partitionBy(*key_cols)
    med = (
        pairs.withColumn("_rn", F.row_number().over(w))
        .withColumn("_np", F.count(F.lit(1)).over(wc))
        .filter(
            F.col("_rn")
            == F.expr("(CAST(_np AS BIGINT) - 1) div 2 + 1")
        )
        .select(
            *key_cols,
            F.col("_np").cast("long").alias("n_pairs"),
            (
                F.col("_wh") * F.lit(scale)
                + F.expr(f"_fr div {k18 // scale}")
            )
            .cast("long")
            .alias("slope_micro"),
        )
    )
    return (
        stats.join(med, key_cols, "left")
        .select(
            *key_cols,
            "n_obs",
            F.coalesce("n_pairs", F.lit(0)).cast("long").alias("n_pairs"),
            "slope_micro",
            F.lit(int(n_null)).cast("long").alias("n_null"),
        )
    )


def cross_correlation(
    df: DataFrame,
    *,
    ts_col: str = "ts",
    series_col: str = "series",
    series_a: str,
    series_b: str,
    bucket_sec: int = 3600,
    max_lag: int = 6,
    value_col: str | None = None,
    scale: int = 1_000_000,
) -> DataFrame:
    """Exact integer cross-correlation between two event series at lags
    −max_lag..+max_lag — the lead/lag detector ("do errors FOLLOW
    deploys? by how many hours?") that lag_autocorr can't express
    (one series against itself) and an OLS trend can't see at all.

    Series are the rows whose ``series_col`` equals ``series_a`` /
    ``series_b``; each is bucketed to ``bucket_sec`` epochs and reduced
    to per-bucket counts (or exact sums of integral ``value_col``) —
    one partial-agg'd shuffle each, then everything downstream runs on
    the bucket METADATA table (time-range-sized, not row-sized; the 13
    lag legs are a broadcast dimension). The aligned range [mn, mx]
    spans BOTH series; absent buckets are true zeros.

    Per lag ℓ (positive = b trails a by ℓ buckets): the pair window has
    ``n_pairs = T − |ℓ|`` aligned bucket pairs, and the statistic is
    the exact integer Pearson numerator over that window,
    ``num = n_pairs·Σ aₜbₜ₊ℓ − (Σa)(Σb)`` with all marginal sums taken
    over the window (not the full range — the textbook windowed CCF).
    ``r2_signed_micro = sign(num)·floor(num²·scale/den)`` with ``den``
    the product of the two windowed variance terms — the tau_b2 device:
    squared to avoid the irrational root, sign preserved, monotone in
    |r|; NULL when either window is constant (zero variance: undefined,
    not zero). The best lag is argmax over r2_signed_micro with ties
    toward the smaller |lag| then the smaller lag — returned as
    ``is_best`` so the one-row answer needs no client-side sort.

    Returns one row per lag: ``(lag, n_pairs, sum_ab, num, r2_signed_
    micro, is_best)``. NULL timestamps/series are dropped; raises when
    the aligned range has ≤ max_lag buckets (every window would be
    empty or degenerate).
    """
    if bucket_sec < 1:
        raise ValueError(f"bucket_sec must be >= 1, got {bucket_sec}")
    if max_lag < 1:
        raise ValueError(f"max_lag must be >= 1, got {max_lag}")
    if scale < 1:
        raise ValueError(f"scale must be >= 1, got {scale}")
    if series_a == series_b:
        raise ValueError("series_a and series_b must differ")
    need = [ts_col, series_col] + ([value_col] if value_col else [])
    by_name = {f.name: f.dataType for f in df.schema.fields}
    for c in need:
        if c not in by_name:
            raise ValueError(f"column {c!r} not in input: {df.columns}")
    if value_col is not None:
        integral = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
        if not isinstance(by_name[value_col], integral):
            raise ValueError(
                f"column {value_col!r} must be integral (got "
                f"{by_name[value_col]}) — quantize floats caller-side"
            )
    d38 = "decimal(38,0)"
    spark = df.sparkSession
    val = (
        F.col(value_col).cast("long")
        if value_col
        else F.lit(1).cast("long")
    )
    base = (
        df.filter(
            F.col(ts_col).isNotNull()
            & F.col(series_col).isin(series_a, series_b)
        )
        .select(
            F.col(series_col).alias("_s"),
            F.expr(
                f"CAST(floor(unix_timestamp({ts_col}) / {bucket_sec})"
                f" AS BIGINT)"
            ).alias("_t"),
            val.alias("_v"),
        )
        .groupBy("_s", "_t")
        .agg(F.sum("_v").cast("long").alias("_x"))
        .localCheckpoint(eager=True)
    )
    b = base.agg(F.min("_t").alias("_mn"), F.max("_t").alias("_mx")).collect()[0]
    if b["_mn"] is None:
        return spark.createDataFrame(
            [],
            "lag long, n_pairs long, sum_ab long, num long, "
            "r2_signed_micro long, is_best boolean",
        )
    mn, mx = int(b["_mn"]), int(b["_mx"])
    t_len = mx - mn + 1
    if t_len <= max_lag:
        raise ValueError(
            f"aligned range has {t_len} buckets <= max_lag={max_lag}; "
            "widen bucket_sec or lower max_lag"
        )
    lags = spark.createDataFrame(
        [(l, t_len - abs(l)) for l in range(-max_lag, max_lag + 1)],
        "lag long, n_pairs long",
    )
    a_cells = base.filter(F.col("_s") == series_a).select("_t", "_x")
    b_cells = base.filter(F.col("_s") == series_b).select(
        F.col("_t").alias("_u"), F.col("_x").alias("_y")
    )
    # dot products: b at t+lag joined against a at t, one equi-join
    dots = (
        a_cells.crossJoin(F.broadcast(lags))
        .withColumn("_u", F.col("_t") + F.col("lag"))
        .join(b_cells, "_u")
        .groupBy("lag")
        .agg(F.sum(F.expr("_x * _y")).cast("long").alias("sum_ab"))
    )
    # windowed marginals: a over [mn, mx−max(ℓ,0)+min(ℓ,0)]… concretely
    # a's window is [mn−min(ℓ,0), mx−max(ℓ,0)], b's is a's shifted by ℓ
    amarg = (
        a_cells.crossJoin(F.broadcast(lags))
        .filter(
            (F.col("_t") >= F.lit(mn) - F.least(F.col("lag"), F.lit(0)))
            & (F.col("_t") <= F.lit(mx) - F.greatest(F.col("lag"), F.lit(0)))
        )
        .groupBy("lag")
        .agg(
            F.sum("_x").cast("long").alias("_sa"),
            F.sum(F.expr("_x * _x")).cast("long").alias("_saa"),
        )
    )
    bmarg = (
        b_cells.crossJoin(F.broadcast(lags))
        .filter(
            (F.col("_u") >= F.lit(mn) + F.greatest(F.col("lag"), F.lit(0)))
            & (F.col("_u") <= F.lit(mx) + F.least(F.col("lag"), F.lit(0)))
        )
        .groupBy("lag")
        .agg(
            F.sum("_y").cast("long").alias("_sb"),
            F.sum(F.expr("_y * _y")).cast("long").alias("_sbb"),
        )
    )
    from pyspark.sql.window import Window

    rows = (
        lags.join(dots, "lag", "left")
        .join(amarg, "lag", "left")
        .join(bmarg, "lag", "left")
        .select(
            "lag",
            "n_pairs",
            F.coalesce("sum_ab", F.lit(0)).alias("sum_ab"),
            F.coalesce("_sa", F.lit(0)).alias("_sa"),
            F.coalesce("_saa", F.lit(0)).alias("_saa"),
            F.coalesce("_sb", F.lit(0)).alias("_sb"),
            F.coalesce("_sbb", F.lit(0)).alias("_sbb"),
        )
        .withColumn(
            "num",
            F.expr(
                f"CAST(CAST(n_pairs AS {d38}) * sum_ab"
                f" - CAST(_sa AS {d38}) * _sb AS BIGINT)"
            ),
        )
        .withColumn(
            "r2_signed_micro",
            F.expr(
                f"CASE WHEN (CAST(n_pairs AS {d38}) * _saa - CAST(_sa AS {d38}) * _sa)"
                f" * (CAST(n_pairs AS {d38}) * _sbb - CAST(_sb AS {d38}) * _sb) = 0"
                f" THEN NULL ELSE"
                f" CAST(sign(num) AS BIGINT) * CAST("
                f" (CAST(num AS {d38}) * num * {scale}) div"
                f" ((CAST(n_pairs AS {d38}) * _saa - CAST(_sa AS {d38}) * _sa)"
                f"  * (CAST(n_pairs AS {d38}) * _sbb - CAST(_sb AS {d38}) * _sb))"
                f" AS BIGINT) END"
            ),
        )
    )
    wbest = Window.orderBy(
        F.desc_nulls_last("r2_signed_micro"), F.abs("lag"), "lag"
    )
    return rows.withColumn(
        "is_best", F.row_number().over(wbest) == 1
    ).select(
        "lag", "n_pairs", "sum_ab", "num", "r2_signed_micro", "is_best"
    )


def band_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_val: str,
    right_val: str,
    eps: int,
    on: list[str] | None = None,
) -> DataFrame:
    """Numeric band join: all pairs with ``|left.val − right.val| ≤
    eps`` (optionally within equi-keys ``on``) — the proximity join
    behind sensor alignment, price matching, and near-equal
    reconciliation that a plain equi-join can't express and a theta
    join executes as a broadcast nested loop. asof_join is the
    TEMPORAL, last-one-wins cousin; this is symmetric and returns
    EVERY in-band pair.

    Bucket-complete by construction: both sides bucket at width
    ``eps`` (``floor div`` — exact on the required integral values,
    quantize floats caller-side), the left side fans out to buckets
    {b−1, b, b+1}, and candidates meet in an EQUI-join on
    (on…, bucket) — any in-band pair differs by < 2 buckets, so no
    candidate is missed (the fuzzy_join_editdist completeness
    discipline) — then the exact |diff| ≤ eps filter prunes corners.
    Shuffle is on fixed-width (keys, bucket); the 3× fan-out rides the
    LEFT side (put the smaller table left). Hot buckets (mega-clusters
    of near-equal values) are the caller's skew cliff — same mitigation
    surface as every equi-join here (salting), stated.

    NULL values (either side) drop. Output: left columns + right
    columns (right-side collisions suffixed ``_r``) + ``diff`` =
    left − right (signed long). ``on`` keys appear once.
    """
    if eps < 0:
        raise ValueError(f"eps must be >= 0, got {eps}")
    on = list(on or [])
    lby = {f.name: f.dataType for f in left.schema.fields}
    rby = {f.name: f.dataType for f in right.schema.fields}
    integral = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
    if left_val not in lby:
        raise ValueError(f"column {left_val!r} not in left: {left.columns}")
    if right_val not in rby:
        raise ValueError(
            f"column {right_val!r} not in right: {right.columns}"
        )
    if not isinstance(lby[left_val], integral) or not isinstance(
        rby[right_val], integral
    ):
        raise ValueError(
            "band values must be integral — quantize floats caller-side "
            "(the zorder_key rule)"
        )
    for k in on:
        if k not in lby or k not in rby:
            raise ValueError(f"on-key {k!r} must be in both sides")
    width = max(eps, 1)
    lv = F.col(left_val).cast("long")
    rv = F.col(right_val).cast("long")
    lkeep = [c for c in left.columns]
    rkeep = [c for c in right.columns if c not in on]
    rename = {c: (c + "_r" if c in lkeep else c) for c in rkeep}
    l_b = (
        left.filter(lv.isNotNull())
        .withColumn("_b0", F.expr(f"CAST({left_val} AS BIGINT) div {width}"))
        .withColumn("_b", F.explode(F.array(
            F.col("_b0") - 1, F.col("_b0"), F.col("_b0") + 1
        )))
        .drop("_b0")
    )
    r_b = right.filter(rv.isNotNull()).withColumn(
        "_b", F.expr(f"CAST({right_val} AS BIGINT) div {width}")
    )
    for old, new in rename.items():
        r_b = r_b.withColumnRenamed(old, new)
    joined = l_b.join(r_b, [*on, "_b"]).drop("_b")
    rv_final = rename.get(right_val, right_val)
    return joined.filter(
        F.abs(F.col(left_val) - F.col(rv_final)) <= eps
    ).withColumn(
        "diff",
        (F.col(left_val).cast("long") - F.col(rv_final).cast("long")),
    )


def decayed_score(
    df: DataFrame,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    bucket_sec: int = 86400,
    half_life_buckets: int = 7,
) -> DataFrame:
    """Exact recency-decayed engagement score — the feature-store
    freshness signal (``Σ 2^-age`` over a key's events) made
    hash-gateable by pinning the decay to POWERS OF TWO and flooring
    each age-class contribution independently to micro-units.

    Contract: events bucket by ``epoch div bucket_sec``; "now" is the
    corpus-wide max bucket (deterministic from the data, no wall
    clock); an event's age class is ``e = (now − bucket) div
    half_life_buckets`` and its weight ``2^-e`` (full weight inside the
    first half-life, then exact halving). Per (key, age class) the
    count aggregates first, then contributes
    ``(count · 10^6) div 2^e`` micro-units — integer shift division,
    floored PER AGE CLASS (documented: this is the pinned semantics,
    not a float sum rounded at the end), so the per-key score is a sum
    of exact integers — accumulation-order-proof on any engine. Age
    classes past 62 half-lives contribute 0 (their weight is below a
    micro-unit for any class count under ~9·10^12 — a loud guard
    rejects the absurdity beyond that instead of silently wrapping).

    Scale shape: ONE partial-agg'd groupBy to (key, age class) — raw
    events reduce map-side — a 1-row broadcast for "now", and one
    |keys|·|classes|-row final agg. No window, no sort. Returns
    ``(key_col, n_events, last_age_buckets, score_micro)``.
    """
    if bucket_sec < 1:
        raise ValueError(f"bucket_sec must be >= 1, got {bucket_sec}")
    if half_life_buckets < 1:
        raise ValueError(
            f"half_life_buckets must be >= 1, got {half_life_buckets}"
        )
    for c in (key_col, ts_col):
        if c not in df.columns:
            raise ValueError(f"column {c!r} not in input: {df.columns}")

    b = df.select(
        F.col(key_col).alias("_k"),
        F.floor(F.unix_timestamp(F.col(ts_col)) / F.lit(bucket_sec))
        .cast("long")
        .alias("_b"),
    ).filter(F.col("_k").isNotNull() & F.col("_b").isNotNull())
    now = b.agg(F.max("_b").alias("_now"))
    classes = (
        b.join(F.broadcast(now))
        .select(
            "_k",
            "_b",
            F.expr(f"div(_now - _b, {int(half_life_buckets)})").alias("_e"),
            (F.col("_now") - F.col("_b")).alias("_age"),
        )
        .groupBy("_k", "_e")
        .agg(
            F.count(F.lit(1)).alias("_c"),
            F.min("_age").alias("_min_age"),
        )
    )
    term = F.expr(
        "CASE WHEN _e <= 62 THEN div(_c * 1000000L, shiftleft(1L, cast(_e AS INT)))"
        " WHEN _c <= 4000000000000 THEN 0L"
        " ELSE raise_error('decayed_score: age-class count too large for"
        " exact zero-weight floor past 62 half-lives') END"
    )
    return (
        classes.select("_k", "_c", "_min_age", term.alias("_t"))
        .groupBy("_k")
        .agg(
            F.sum("_c").cast("long").alias("n_events"),
            F.min("_min_age").cast("long").alias("last_age_buckets"),
            F.sum("_t").cast("long").alias("score_micro"),
        )
        .select(
            F.col("_k").alias(key_col),
            "n_events",
            "last_age_buckets",
            "score_micro",
        )
    )
