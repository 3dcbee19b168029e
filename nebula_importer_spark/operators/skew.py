"""Skew handling: salted repartition for mega-keys.

The north rule requires explicit skew handling for mega-threads (one conv_id
holding a large share of all turns must not serialize into a single task).
Two mechanisms, composable:

1. AQE skew-join splitting (enabled in session.py) — covers joins.
2. ``salted_repartition`` — covers per-key batch processing (mapInPandas et
   al.) where work is per-ROW within a key: partition on
   (key, xxhash64(row) % salt) so a mega-key spreads over ``salt`` tasks.

Per-turn triple extraction is row-local, so salting is safe there; operators
needing whole-key locality (window ordering) keep the unsalted key and rely
on range partitioning of (conv_id, turn_idx) instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_repartition(
    df: DataFrame,
    key: str,
    salt_buckets: int = 32,
    num_partitions: int | None = None,
) -> DataFrame:
    """Repartition on (key, salt) where salt = xxhash64(all columns) %
    salt_buckets — deterministic, no RNG, stable under retries."""
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt_buckets))
    out = df.withColumn("_salt", salt)
    if num_partitions is None:
        # An explicit count is REQUIRED for CPU-bound downstream stages
        # (e.g. pandas-UDF kernels): a bare repartition(cols) is subject to
        # AQE partition coalescing, which sizes partitions by BYTES (64 MB
        # advisory) and will happily collapse a compute-heavy stage onto a
        # handful of tasks. 2× parallelism keeps every core busy with
        # mild imbalance tolerance.
        num_partitions = df.sparkSession.sparkContext.defaultParallelism * 2
    out = out.repartition(num_partitions, F.col(key), F.col("_salt"))
    return out.drop("_salt")


_SPREAD_NOOP_OPS = (
    # analyzed-logical-plan nodes that imply the frame is already spread
    # (a shuffle repartitions downstream of the scan) or needs no spreading
    # (LocalRelation/createDataFrame parallelizes over defaultParallelism)
    "Aggregate",
    "Join",
    "Window",
    "Deduplicate",
    "Distinct",
    "Repartition",
    "RepartitionByExpression",
    "Sort",
    "LocalRelation",
    "LogicalRDD",  # createDataFrame — parallelized over default slices already
)


def _parse_byte_conf(s: str) -> int:
    """'134217728b' / '128m' / '1g' → bytes (Spark byte-conf syntax)."""
    s = s.strip().lower()
    mult = 1
    for suffix, m in (("k", 1 << 10), ("m", 1 << 20), ("g", 1 << 30), ("b", 1)):
        if s.endswith(suffix):
            s = s[: -len(suffix)]
            mult = m
            break
    return int(float(s) * mult)


def _scan_split_estimate(df: DataFrame, enough: int) -> int:
    """Estimate the scan's split count WITHOUT converting the plan to an RDD
    (``df.rdd`` physical-plans + instantiates the whole RDD chain on every
    call — measurable driver overhead on wide plans at scale).

    Cheap two-step: ``inputFiles()`` count first (files never merge into
    fewer splits under the default openCostInBytes, so n_files is a lower
    bound that is already conclusive when ≥ ``enough``); only when the file
    count is small, stat those few files and count maxPartitionBytes chunks
    — a handful of driver-side FileSystem calls, never one per split."""
    try:
        files = df.inputFiles()
    except Exception:  # pragma: no cover — exotic non-file relations
        return 0
    n = len(files)
    if n >= enough or n == 0:
        return n
    sess = df.sparkSession
    try:
        mpb = _parse_byte_conf(
            sess.conf.get("spark.sql.files.maxPartitionBytes", "134217728b")
        )
        jvm = sess.sparkContext._jvm
        hconf = sess.sparkContext._jsc.hadoopConfiguration()
        splits = 0
        for f in files:
            p = jvm.org.apache.hadoop.fs.Path(f)
            size = p.getFileSystem(hconf).getFileStatus(p).getLen()
            splits += max(1, -(-size // mpb))
        return int(splits)
    except Exception:  # pragma: no cover — FS without status support
        return n


def spread_small_input(
    df: DataFrame,
    min_partitions: int | None = None,
    input_splits: int | None = None,
) -> DataFrame:
    """Round-robin a narrow input across the cluster BEFORE a CPU-heavy
    per-row stage (shingling, minhash, hashing). A small parquet table is
    one split, so every downstream expression runs on ONE core no matter
    how many the session has — the classic small-input parallelism trap.

    No-op when the input is already spread — decided WITHOUT an RDD
    conversion: (a) ``input_splits`` caller hint, else (b) the analyzed
    logical plan contains a shuffle-introducing operator (already
    repartitioned downstream of the scan), else (c) the scan's split
    estimate from inputFiles()/file sizes. The trigger is splits <
    cores/2 (not < cores): a half-spread input keeps every core busy
    within 2×, and the laxer gate avoids paying the round-robin shuffle
    warm when the scan is already mostly parallel. At 100-TB scans the
    estimate is conclusive at the file-count step — zero added work."""
    want = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    trigger = max(2, want // 2)
    if input_splits is None:
        try:
            plan = df._jdf.queryExecution().analyzed().toString()
        except Exception:  # pragma: no cover — defensive
            plan = ""
        if any(op in plan for op in _SPREAD_NOOP_OPS):
            return df
        input_splits = _scan_split_estimate(df, trigger)
    if input_splits >= trigger:
        return df
    return df.repartition(want)
