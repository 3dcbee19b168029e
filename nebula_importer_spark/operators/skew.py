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


def spread_small_input(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin a narrow input across the cluster BEFORE a CPU-heavy
    per-row stage (shingling, minhash, hashing). A small parquet table is
    one split, so every downstream expression runs on ONE core no matter
    how many the session has — the classic small-input parallelism trap.
    No-op when the input already has enough partitions (a 100-TB scan
    does), so no shuffle is added at scale."""
    want = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= want:
        return df
    return df.repartition(want)
