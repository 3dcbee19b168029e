"""Space-filling-curve data layout keys (Z-order / Morton clustering).

The storage-layout half of the 100-TB story: a table queried by
multi-dimensional range predicates (``partkey BETWEEN .. AND suppkey
BETWEEN ..``) prunes poorly when files are clustered by any single
column — every file overlaps the second predicate. Interleaving the
bits of the quantized dimensions (Morton 1966; the technique behind
Delta/Iceberg ``ZORDER BY``) gives one sort key whose contiguous ranges
are small hyper-rectangles, so per-file min/max zone maps become tight
on EVERY interleaved dimension at once and the scan skips most files.

The reference has no layout machinery at all — its sink is nGQL
statements (/root/reference/pkg/spec/v3/node.go:149) — but a Spark
engine materializing vertex/edge/corpus tables at 100 TB lives or dies
on scan pruning, so the clustering key is a first-class operator here.

Everything is exact integer arithmetic: quantization is a floor
division of long ranges, interleaving is shift/mask/or — bit-identical
on any engine or partitioning, which is what makes the key (and the
file assignment derived from it) gate-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from nebula_importer_spark.operators._buckets import guarded_bucket

_INTEGRAL = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)


def _interleave(quants: list[Column], bits: int) -> Column:
    """Bit-interleave ``k`` ``bits``-wide longs: bit ``b`` of column ``i``
    lands at position ``b*k + i`` (column 0 owns the least-significant
    lane). Pure shift/mask/or — whole-stage-codegen'd JVM math."""
    k = len(quants)
    z = F.lit(0).cast("long")
    for i, q in enumerate(quants):
        for b in range(bits):
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftright(q, b).bitwiseAND(F.lit(1)), b * k + i
                )
            )
    return z


def zorder_key(
    df: DataFrame,
    cols: list[str],
    *,
    bits: int = 16,
    n_buckets: int | None = None,
) -> DataFrame:
    """Append a Morton clustering key ``zkey`` over integral columns
    ``cols`` (2-3 dimensions), and — when ``n_buckets`` is given — the
    equal-width file assignment ``zbucket`` a writer would
    ``repartitionByRange`` on.

    Per column the value is quantized to ``[0, 2^bits)`` by exact long
    math: ``q = ((x - min) * (2^bits - 1)) div max(max - min, 1)`` with
    the global (min, max) riding a broadcast 1-row aggregate — one extra
    scan-light pass, the same cost any range partitioner pays. NULLs
    quantize to 0 (they sort first, as in ORDER BY NULLS FIRST).

    ``zbucket = zkey div ceil(2^(bits·k) / n_buckets)`` — equal key-range
    buckets, so each bucket is a contiguous Z-range = a stack of small
    hyper-rectangles with tight per-dimension zone maps.

    Distributed shape: the (min, max) aggregate is partial-aggregable and
    1 row; the key itself is map-only JVM bit math — no shuffle is added
    beyond what the caller's write layout needs anyway.
    """
    if not 2 <= len(cols) <= 3:
        raise ValueError(f"zorder_key interleaves 2-3 columns, got {cols}")
    if not 1 <= bits * len(cols) <= 62:
        raise ValueError(f"bits*k must be in [1, 62], got {bits}*{len(cols)}")
    by_name = {f.name: f.dataType for f in df.schema.fields}
    missing = [c for c in cols if c not in by_name]
    if missing:
        raise ValueError(f"columns not in the frame: {missing}")
    bad = [c for c in cols if not isinstance(by_name[c], _INTEGRAL)]
    if bad:
        raise ValueError(
            f"zorder_key needs integral columns (quantize floats caller-side"
            f" — float bucket math is engine-divergent): {bad}"
        )
    reserved = [c for c in ("zkey", "zbucket") if c in df.columns]
    if reserved:
        raise ValueError(f"input already has reserved column(s): {reserved}")

    stats = df.agg(
        *[F.min(c).cast("long").alias(f"_min_{i}") for i, c in enumerate(cols)],
        *[F.max(c).cast("long").alias(f"_max_{i}") for i, c in enumerate(cols)],
    )
    top = (1 << bits) - 1
    staged = df.crossJoin(F.broadcast(stats))
    for i, c in enumerate(cols):
        # (offset * top) div rng as EXACT long math — offset*top can exceed
        # 2^53, so a float floor() would mis-quantize; SQL `div` cannot.
        staged = staged.withColumn(
            f"_off_{i}",
            F.coalesce(F.col(c).cast("long"), F.col(f"_min_{i}"))
            - F.col(f"_min_{i}"),
        ).withColumn(
            f"_rng_{i}",
            F.greatest(
                F.col(f"_max_{i}") - F.col(f"_min_{i}"), F.lit(1).cast("long")
            ),
        )
    quants = [
        F.expr(f"(_off_{i} * {top}) div _rng_{i}") for i in range(len(cols))
    ]
    out = staged.withColumn("zkey", _interleave(quants, bits))
    if n_buckets is not None:
        if n_buckets < 1:
            raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
        space = 1 << (bits * len(cols))
        bucket_span = -(-space // n_buckets)  # ceil div
        out = out.withColumn(
            "zbucket", F.expr(f"zkey div {bucket_span}").cast("long")
        )
    return out.drop(
        *[f"_min_{i}" for i in range(len(cols))],
        *[f"_max_{i}" for i in range(len(cols))],
        *[f"_off_{i}" for i in range(len(cols))],
        *[f"_rng_{i}" for i in range(len(cols))],
    )


def hilbert_key(
    df: DataFrame,
    cols: list[str],
    *,
    bits: int = 16,
    n_buckets: int | None = None,
) -> DataFrame:
    """Append a 2-D Hilbert-curve clustering key ``hkey`` (Hilbert 1891;
    the layout used by recent Delta/Iceberg "liquid clustering") over two
    integral columns, and — when ``n_buckets`` is given — the equal-width
    file assignment ``hbucket``. Z-order's contiguous key ranges jump
    between quadrant corners; the Hilbert curve's are UNIT STEPS (every
    consecutive pair of keys is grid-adjacent — the pytest proves the
    bijection + adjacency over the full grid), so equal key-range file
    buckets are tighter hyper-rectangles and zone maps prune better on
    both dimensions.

    Quantization is identical to :func:`zorder_key` (broadcast 1-row
    min/max, exact long floor-div scaling, NULLs to 0). The curve index
    is the classic per-bit rotate/reflect recurrence — computed as a
    RUNTIME fold (``F.aggregate`` over a (x, y, d) struct), not an
    unrolled expression: the rotation makes each bit's state depend on
    the last, so textual unrolling grows the Catalyst tree ~3× per bit
    while the fold keeps it constant-size at any ``bits``. All integer
    arithmetic (floor-div by power-of-two lanes, shift/xor) —
    bit-identical on any engine; the oracle unrolls the same recurrence
    as CTE stages.

    Distributed shape: identical to zorder_key — one 1-row broadcast
    stats pass + map-only JVM math, no shuffle beyond the caller's
    write layout.
    """
    if len(cols) != 2:
        raise ValueError(f"hilbert_key is 2-D (use zorder_key for 3): {cols}")
    if not 1 <= bits <= 16:
        raise ValueError(f"bits must be in [1, 16], got {bits}")
    by_name = {f.name: f.dataType for f in df.schema.fields}
    missing = [c for c in cols if c not in by_name]
    if missing:
        raise ValueError(f"columns not in the frame: {missing}")
    bad = [c for c in cols if not isinstance(by_name[c], _INTEGRAL)]
    if bad:
        raise ValueError(
            f"hilbert_key needs integral columns (quantize floats "
            f"caller-side — float bucket math is engine-divergent): {bad}"
        )
    reserved = [c for c in ("hkey", "hbucket") if c in df.columns]
    if reserved:
        raise ValueError(f"input already has reserved column(s): {reserved}")

    stats = df.agg(
        *[F.min(c).cast("long").alias(f"_min_{i}") for i, c in enumerate(cols)],
        *[F.max(c).cast("long").alias(f"_max_{i}") for i, c in enumerate(cols)],
    )
    top = (1 << bits) - 1
    staged = df.crossJoin(F.broadcast(stats))
    for i, c in enumerate(cols):
        staged = staged.withColumn(
            f"_off_{i}",
            F.coalesce(F.col(c).cast("long"), F.col(f"_min_{i}"))
            - F.col(f"_min_{i}"),
        ).withColumn(
            f"_rng_{i}",
            F.greatest(
                F.col(f"_max_{i}") - F.col(f"_min_{i}"), F.lit(1).cast("long")
            ),
        )
    qx = F.expr(f"(_off_0 * {top}) div _rng_0")
    qy = F.expr(f"(_off_1 * {top}) div _rng_1")

    def _step(acc: Column, i: Column) -> Column:
        # 2^(bits-i) — shiftleft needs a literal shift, so go through an
        # exact double power (exponent ≤ 16, far inside the 2^52 window)
        s = F.pow(F.lit(2.0), (F.lit(bits) - i).cast("double")).cast("long")
        x, y = acc["x"], acc["y"]
        rx = F.floor(x / s).cast("long").bitwiseAND(F.lit(1).cast("long"))
        ry = F.floor(y / s).cast("long").bitwiseAND(F.lit(1).cast("long"))
        d = acc["d"] + s * s * (rx * 3).bitwiseXOR(ry)
        # reflect about the FULL grid (n-1-coord, the canonical variant)
        # then swap — only in the ry=0 half. The n-based reflection keeps
        # coordinates in [0, n) forever; the s-based variant goes negative
        # mid-fold, where floor-div (Spark/Python) and truncating-div
        # (DuckDB //) disagree — measured, not theoretical.
        n1 = F.lit((1 << bits) - 1).cast("long")
        nx = F.when(ry == 0, F.when(rx == 1, n1 - y).otherwise(y)) \
            .otherwise(x)
        ny = F.when(ry == 0, F.when(rx == 1, n1 - x).otherwise(x)) \
            .otherwise(y)
        return F.struct(nx.alias("x"), ny.alias("y"), d.alias("d"))

    folded = F.aggregate(
        F.sequence(F.lit(1), F.lit(bits)),
        F.struct(
            qx.cast("long").alias("x"),
            qy.cast("long").alias("y"),
            F.lit(0).cast("long").alias("d"),
        ),
        _step,
    )
    out = staged.withColumn("hkey", folded["d"])
    if n_buckets is not None:
        if n_buckets < 1:
            raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
        space = 1 << (2 * bits)
        bucket_span = -(-space // n_buckets)  # ceil div
        out = out.withColumn(
            "hbucket", F.expr(f"hkey div {bucket_span}").cast("long")
        )
    return out.drop(
        *[f"_min_{i}" for i in range(2)],
        *[f"_max_{i}" for i in range(2)],
        *[f"_off_{i}" for i in range(2)],
        *[f"_rng_{i}" for i in range(2)],
    )


def zone_map(
    df: DataFrame, bucket_col: str, value_cols: list[str]
) -> DataFrame:
    """Per-bucket zone map — ``(bucket, n_rows, <c>_min, <c>_max ...)``
    for each value column: the file-skipping index a reader consults, and
    the measurable witness that a clustering key worked (tight per-bucket
    ranges = high skip rate). One partial-aggregable groupBy."""
    if bucket_col not in df.columns:
        raise ValueError(f"column {bucket_col!r} not in input: {df.columns}")
    missing = [c for c in value_cols if c not in df.columns]
    if missing:
        raise ValueError(f"columns not in the frame: {missing}")
    aggs = [F.count(F.lit(1)).cast("long").alias("n_rows")]
    for c in value_cols:
        aggs.append(F.min(c).alias(f"{c}_min"))
        aggs.append(F.max(c).alias(f"{c}_max"))
    return df.groupBy(bucket_col).agg(*aggs)


def compaction_plan(
    files: DataFrame,
    *,
    target_bytes: int,
    file_col: str = "path",
    size_col: str = "size_bytes",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Small-file compaction assignment (the Delta ``OPTIMIZE`` / Iceberg
    rewrite-data-files planning step): pack each partition's files into
    rewrite groups of ≈ ``target_bytes`` so a 100-TB table's long tail
    of tiny files (every streaming sink and over-partitioned write
    produces them) collapses into scan-efficient units.

    Rule — sorted sequential fill: within each ``group_cols`` partition,
    order files by (size DESC, file ASC) and cut groups at running-size
    boundaries: ``group = exclusive_prefix_sum div target_bytes``. Every
    group's total is < target + its own largest file (the classic
    bound); a file ≥ target lands alone by construction. Size-descending
    order packs the big files first so the tail of tiny files fills
    remainders — and the (size, file) sort key makes the plan a pure
    function of the manifest, reproducible on any engine (the whole
    plan is gate-checkable, unlike bin-packing heuristics with
    engine-ordered arrivals).

    Scale note: the input is the FILE MANIFEST — metadata-sized (one row
    per file), not data-sized — so the per-partition window is bounded
    by files-per-partition (~10³-10⁶), exactly the place a window is
    fine. NULL sizes are rejected loudly: a manifest row without a size
    is a listing bug, not a packable file.

    Returns the input columns plus ``compaction_group`` (0-based within
    each partition) — one row per file, ready to drive the rewrite job.
    """
    from pyspark.sql.window import Window as W

    if target_bytes < 1:
        raise ValueError(f"target_bytes must be >= 1, got {target_bytes}")
    groups = list(group_cols or [])
    for c in (file_col, size_col, *groups):
        if c not in files.columns:
            raise ValueError(f"column {c!r} not in input: {files.columns}")
    if "_cum" in files.columns or "compaction_group" in files.columns:
        raise ValueError(
            "input must not contain reserved columns _cum/compaction_group"
        )
    null_guard = files.filter(F.col(size_col).isNull()).limit(1)
    # plan-time sanity: fail fast on NULL sizes (metadata bug), without
    # scanning twice at scale — the limit(1) probe stops at first hit
    if null_guard.take(1):
        raise ValueError(f"NULL {size_col!r} in manifest — fix the listing")
    w = (
        W.partitionBy(*groups)
        if groups
        else W.partitionBy(F.lit(0))
    )
    w = w.orderBy(F.col(size_col).desc(), F.col(file_col).asc()).rowsBetween(
        W.unboundedPreceding, -1
    )
    return (
        files.withColumn(
            "_cum",
            F.coalesce(F.sum(F.col(size_col).cast("long")).over(w), F.lit(0).cast("long")),
        )
        .withColumn(
            "compaction_group",
            F.expr(f"_cum div {target_bytes}").cast("long"),
        )
        .drop("_cum")
    )


def pruning_audit(
    df: DataFrame,
    layouts: dict[str, str],
    predicates: list[tuple[str, str, int, int]],
) -> DataFrame:
    """File-skipping effectiveness audit: for each candidate layout
    (a bucket/file-assignment column already on ``df``) × each range
    predicate ``(pred_id, col, lo, hi)``, measure what a min/max
    zone-map reader would actually scan.

    This is the measurement that justifies (or kills) a re-clustering
    job BEFORE burning a 100-TB rewrite: compute the per-bucket zone
    maps under each layout, overlap-test them against the query
    workload, and compare ``skip_ppm`` across layouts. The classic
    result this surfaces: an insert-order layout prunes time/orderkey
    predicates and nothing else; a Z-order/Hilbert layout prunes every
    interleaved dimension at once but gives up some of the single-key
    locality — the audit quantifies both sides exactly.

    Semantics: a bucket is SCANNED for ``(col, lo, hi)`` iff its zone
    ``[min(col), max(col)]`` intersects ``[lo, hi]`` (NULL-only zones —
    min/max NULL — are skippable, matching parquet row-group stats
    semantics). Output per (layout, pred):

    - ``n_buckets`` / ``buckets_scanned`` — zone-map-level skip,
    - ``rows_total`` / ``rows_scanned`` — data-level cost of the scan,
    - ``rows_matched`` — true selectivity (layout-independent),
    - ``skip_ppm`` = (rows_total − rows_scanned)·10⁶ div rows_total.

    Exactness: counts are longs, the ratio one truncating div — engine-
    and partition-order-proof.

    Scale: per layout ONE partial-aggregable groupBy builds the zone
    map (the object parquet footers / Iceberg manifests already hold —
    at 10^12 rows you'd read it from metadata, not recompute); every
    overlap test then runs on ≤ n_buckets METADATA rows per layout.
    ``rows_matched`` for all predicates rides a single conditional-agg
    pass. Nothing here shuffles data-sized payloads.
    """
    if not layouts:
        raise ValueError("layouts must be non-empty")
    if not predicates:
        raise ValueError("predicates must be non-empty")
    for name, bcol in layouts.items():
        if bcol not in df.columns:
            raise ValueError(
                f"layout {name!r}: bucket column {bcol!r} not in input: "
                f"{df.columns}"
            )
    seen: set[str] = set()
    for pid, col, lo, hi in predicates:
        if col not in df.columns:
            raise ValueError(
                f"predicate {pid!r}: column {col!r} not in input"
            )
        if pid in seen:
            raise ValueError(f"duplicate pred_id {pid!r}")
        seen.add(pid)
        if lo > hi:
            raise ValueError(f"predicate {pid!r}: lo {lo} > hi {hi}")

    # one full-scan conditional-agg pass: true selectivity per predicate
    matched = df.agg(
        *[
            F.sum(
                F.col(col).between(F.lit(lo), F.lit(hi)).cast("long")
            ).alias(pid)
            for pid, col, lo, hi in predicates
        ]
    )
    stack = ", ".join(
        f"'{pid}', {pid}" for pid, _, _, _ in predicates
    )
    matched_melt = matched.selectExpr(
        f"stack({len(predicates)}, {stack}) AS (pred_id, rows_matched)"
    ).select("pred_id", F.coalesce("rows_matched", F.lit(0)).alias(
        "rows_matched"))

    pred_cols = sorted({col for _, col, _, _ in predicates})
    per_layout: list[DataFrame] = []
    for name, bcol in sorted(layouts.items()):
        # materialize: the zone map is metadata-sized, and every
        # predicate leg below re-aggregates it — without this each leg
        # would re-run the data-sized groupBy
        zm = zone_map(df, bcol, pred_cols).localCheckpoint(eager=True)
        legs = []
        for pid, col, lo, hi in predicates:
            hit = (
                (F.col(f"{col}_max") >= F.lit(lo))
                & (F.col(f"{col}_min") <= F.lit(hi))
            ).cast("long")
            legs.append(
                zm.agg(
                    F.count(F.lit(1)).cast("long").alias("n_buckets"),
                    F.sum(hit).alias("buckets_scanned"),
                    F.sum("n_rows").alias("rows_total"),
                    F.sum(F.col("n_rows") * hit).alias("rows_scanned"),
                ).select(
                    F.lit(name).alias("layout"),
                    F.lit(pid).alias("pred_id"),
                    "n_buckets",
                    "buckets_scanned",
                    "rows_total",
                    "rows_scanned",
                )
            )
        leg = legs[0]
        for nxt in legs[1:]:
            leg = leg.unionByName(nxt)
        per_layout.append(leg)
    out = per_layout[0]
    for nxt in per_layout[1:]:
        out = out.unionByName(nxt)
    return out.join(F.broadcast(matched_melt), "pred_id").select(
        "layout",
        "pred_id",
        "n_buckets",
        "buckets_scanned",
        "rows_total",
        "rows_scanned",
        "rows_matched",
        F.expr(
            "(rows_total - rows_scanned) * 1000000L div rows_total"
        ).alias("skip_ppm"),
    )


def balanced_shards(
    df: DataFrame,
    id_col: str = "doc_id",
    weight_col: str = "n_tokens",
    n_shards: int = 16,
    n_buckets: int = 64,
) -> DataFrame:
    """Deterministic weight-balanced shard assignment — the
    training-shard packer: spread documents over ``n_shards`` so every
    shard carries a near-equal token total, without a driver-side bin
    packer. The rule is SERPENTINE round-robin over the global
    (weight desc, id asc) rank: rows chunk into waves of ``n_shards``;
    odd waves reverse direction, so the shard that took a wave's
    heaviest row takes the next wave's lightest (classic snake-draft
    balancing — the max/min shard gap is bounded by one wave's spread,
    far tighter than plain round-robin on skewed weights). The
    assignment is a pure function of (weight, id) — reproducible on any
    engine, which a salted or random packer can never be.

    Distributed shape: the global rank decomposes as (#heavier rows) +
    (#same-weight rows with smaller id) + 1. The heavier-count runs on
    the DISTINCT-weight table through the order-preserving two-level
    bucket machinery; the within-weight id rank is id-SUB-BUCKETED, so
    a corpus of heavily tied weights (all docs the same length) spreads
    over ~``n_buckets`` window partitions per weight instead of
    serializing in one — no global sort anywhere, no driver collect.
    The serpentine map is one arithmetic projection. Weights must be
    integral and non-negative (raise loudly otherwise — the
    exact_weighted_quantiles rule).

    Returns ``(id_col, weight_col, rank, shard)`` with shard in
    ``[0, n_shards)``.
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    for c in (id_col, weight_col):
        if c not in df.columns:
            raise ValueError(f"column {c!r} not in input: {df.columns}")
    from pyspark.sql import types as T
    from pyspark.sql.window import Window as W

    by_name = {f.name: f.dataType for f in df.schema.fields}
    integral = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
    if not isinstance(by_name[weight_col], integral):
        raise ValueError(
            f"balanced_shards needs an integral weight: "
            f"{weight_col} is {by_name[weight_col]}"
        )

    rows = df.select(
        F.col(id_col).alias("_id"),
        F.col(weight_col).cast("long").alias("_w"),
    ).filter(F.col("_id").isNotNull() & F.col("_w").isNotNull())
    rows = rows.withColumn(
        "_w",
        F.when(
            F.col("_w") >= 0, F.col("_w")
        ).otherwise(
            F.raise_error(
                F.lit("balanced_shards: negative weight encountered")
            ).cast("long")
        ),
    )
    # rank = (#rows heavier) + (#same-weight rows with smaller id) + 1.
    # Part A — weight offsets over the DISTINCT-weight table (exact_auc
    # shape: collapsing first means a corpus of tied weights is ONE row
    # here, not a mega window partition).
    per_w = rows.groupBy("_w").agg(F.count(F.lit(1)).alias("_cw"))
    wstats = per_w.agg(F.min("_w").alias("_mn"), F.max("_w").alias("_mx"))
    wbuck = per_w.crossJoin(F.broadcast(wstats)).withColumn(
        "_b", guarded_bucket("_mx - _w", n_buckets, op="balanced_shards")
    )
    wloc = W.partitionBy("_b").orderBy(F.col("_w").desc()).rowsBetween(
        W.unboundedPreceding, -1
    )
    wlocal = wbuck.withColumn(
        "_heavier_local", F.coalesce(F.sum("_cw").over(wloc), F.lit(0))
    )
    wtot = wbuck.groupBy("_b").agg(F.sum("_cw").alias("_bt"))
    woff = W.orderBy("_b").rowsBetween(W.unboundedPreceding, -1)
    woffsets = wtot.select(
        "_b", F.coalesce(F.sum("_bt").over(woff), F.lit(0)).alias("_woff")
    )
    heavier = wlocal.join(F.broadcast(woffsets), "_b").select(
        "_w", (F.col("_heavier_local") + F.col("_woff")).alias("_heavier")
    )
    # Part B — within-weight id rank, id-sub-bucketed so a hot (heavily
    # tied) weight splits across ~n_buckets window partitions instead of
    # serializing in one.
    istats = rows.agg(F.min("_id").alias("_imn"), F.max("_id").alias("_imx"))
    # ids routinely span hash ranges; an id span past int64/n_buckets
    # would wrap the bucket arithmetic negative — fail loudly, do not
    # mis-bucket (the span itself is fine, only the *n_buckets product
    # can wrap, so guard the product's headroom)
    ibuck = rows.crossJoin(F.broadcast(istats)).withColumn(
        "_ispan",
        F.when(
            (F.col("_imx") - F.col("_imn") >= 0)
            & (F.col("_imx") - F.col("_imn") < (2**62) // n_buckets),
            F.col("_imx") - F.col("_imn") + 1,
        ).otherwise(
            F.raise_error(
                F.lit(
                    "balanced_shards: id span too wide for exact bucket "
                    "arithmetic — remap ids to a dense range first"
                )
            ).cast("long")
        ),
    ).withColumn(
        "_ib", F.expr(f"((_id - _imn) * {n_buckets}) div _ispan")
    )
    iloc = W.partitionBy("_w", "_ib").orderBy(F.col("_id").asc()).rowsBetween(
        W.unboundedPreceding, -1
    )
    ilocal = ibuck.withColumn(
        "_il", F.coalesce(F.count(F.lit(1)).over(iloc), F.lit(0))
    )
    itot = ibuck.groupBy("_w", "_ib").agg(F.count(F.lit(1)).alias("_it"))
    ioffw = W.partitionBy("_w").orderBy("_ib").rowsBetween(
        W.unboundedPreceding, -1
    )
    ioffsets = itot.select(
        "_w", "_ib",
        F.coalesce(F.sum("_it").over(ioffw), F.lit(0)).alias("_ioff"),
    )
    ranked = (
        ilocal.join(ioffsets, ["_w", "_ib"])
        .join(heavier, "_w")
        .select(
            "_id",
            "_w",
            (F.col("_heavier") + F.col("_il") + F.col("_ioff") + 1)
            .cast("long")
            .alias("rank"),
        )
    )
    n = int(n_shards)
    return ranked.select(
        F.col("_id").alias(id_col),
        F.col("_w").alias(weight_col),
        "rank",
        F.expr(
            f"CASE WHEN div(rank - 1, {n}) % 2 = 0"
            f" THEN (rank - 1) % {n}"
            f" ELSE {n} - 1 - (rank - 1) % {n} END"
        )
        .cast("long")
        .alias("shard"),
    )
