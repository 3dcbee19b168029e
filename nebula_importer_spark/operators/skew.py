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


import re as _re

# Node names are matched ANCHORED at plan-node positions (line start after
# tree-drawing indentation), never as bare substrings — a column named
# "SortKey" appears inside the bracketed attribute list, not at a node
# position, so it cannot false-positive a "Sort" node.
_SHUFFLE_HINT_NODES = _re.compile(
    r"(?m)^[\s:+|-]*(?:Aggregate|Join|Window|Deduplicate|Distinct|"
    r"Repartition|RepartitionByExpression|Sort)[\s\[]"
)
_LOCAL_NODES = _re.compile(r"(?m)^[\s:+|-]*(?:LocalRelation|LogicalRDD)[\s\[,]")
_FILE_RELATION = _re.compile(r"(?m)^[\s:+|-]*Relation\s*\[")
# coalesce(n) prints as `Repartition n, false` — it CAPS the partition count
# (no shuffle), so a small cap means the frame is definitely narrow
_COALESCE = _re.compile(r"(?m)^[\s:+|-]*Repartition (\d+), false")
# only a real shuffle Exchange proves the data is redistributed; a
# BroadcastExchange (broadcast join) and Exchange SinglePartition do not.
# The non-greedy group can under-read nested-paren partitionings — that
# errs toward "not spread" (an extra round-robin), never toward serializing.
_SHUFFLE_EXCHANGE = _re.compile(
    r"Exchange (?:hash|range)partitioning\(.*?(\d+)\)"
    r"|Exchange RoundRobinPartitioning\((\d+)\)"
)


def _parse_byte_conf(s: str) -> int:
    """'134217728b' / '128m' / '128mb' / '1g' → bytes (Spark byte-conf
    syntax: optional trailing 'b', then an optional k/m/g/t/p magnitude)."""
    s = s.strip().lower()
    if s.endswith("b"):
        s = s[:-1]
    mult = 1
    for suffix, m in (
        ("k", 1 << 10),
        ("m", 1 << 20),
        ("g", 1 << 30),
        ("t", 1 << 40),
        ("p", 1 << 50),
    ):
        if s.endswith(suffix):
            s = s[:-1]
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
    conversion: (a) ``input_splits`` caller hint, else (b) a small
    ``coalesce`` cap in the analyzed plan forces a spread, else (c) when
    the analyzed plan has shuffle-CAPABLE nodes (anchored node-name match,
    not substrings), the initial physical plan must show a real shuffle
    Exchange with ≥ trigger partitions (a broadcast join or coalesce has
    those node names but no shuffle — confirmed false positives in review),
    else (d) the scan's split estimate from inputFiles()/file sizes.
    Physical planning is only paid on the rare already-complex plans; the
    common scan-only caller stays on the analyzed plan + file stat. AQE
    byte-based post-shuffle coalescing can still narrow a tiny shuffled
    input at runtime — pass ``input_splits`` explicitly for CPU-bound
    stages downstream of an aggregation over tiny data. The trigger is
    splits < cores/2 (not < cores): a half-spread input keeps every core
    busy within 2×, and the laxer gate avoids paying the round-robin
    shuffle warm when the scan is already mostly parallel. At 100-TB scans
    the estimate is conclusive at the file-count step — zero added work."""
    want = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    trigger = max(2, want // 2)
    if input_splits is None:
        try:
            qe = df._jdf.queryExecution()
            plan = qe.analyzed().toString()
        except Exception:  # pragma: no cover — defensive
            qe, plan = None, ""
        caps = [int(m) for m in _COALESCE.findall(plan)]
        if caps and min(caps) < trigger:
            return df.repartition(want)
        # purely-local frames (createDataFrame) parallelize on their own;
        # a LocalRelation that is merely the broadcast side of a join over
        # a file scan must NOT mask the narrow scan side
        if _LOCAL_NODES.search(plan) and not _FILE_RELATION.search(plan):
            return df
        if qe is not None and _SHUFFLE_HINT_NODES.search(plan):
            try:
                phys = qe.executedPlan().toString()
            except Exception:  # pragma: no cover — defensive
                phys = ""
            for m in _SHUFFLE_EXCHANGE.finditer(phys):
                if int(m.group(1) or m.group(2)) >= trigger:
                    return df
        input_splits = _scan_split_estimate(df, trigger)
    if input_splits >= trigger:
        return df
    return df.repartition(want)
