"""Incremental sketch maintenance over streams.

The count-min matrix (operators/sketch.py:cms_matrix) is MERGEABLE —
a union's matrix is the cell-wise sum of the parts' matrices — which is
exactly the property that makes it streamable: each micro-batch writes
its own matrix partition, and the read-side cell-wise sum IS the batch
sketch of everything drained so far. No state store, no complete-mode
re-emit of a growing aggregate; per-batch cost is flat at any history
length (the run_incremental_novelty discipline applied to sketch
state), and replay is idempotent because each batch's partition is
keyed by ``_batch_id`` and dynamically overwritten (the
streaming/transcripts.py exactly-once pattern).

At 100 TB streaming ingest this is how per-key frequency telemetry
stays cheap: depth×width longs per batch partition, compactable by the
same cell-wise sum whenever the partition count grows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def run_incremental_cms(
    stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    *,
    col: str,
    depth: int = 4,
    width: int = 512,
    salt: str = "cms",
    available_now: bool = True,
) -> dict:
    """Drain a stream into per-batch count-min matrix partitions at
    ``<out_dir>/cms/_batch_id=N``. Read the live sketch back with
    :func:`read_cms` — cell-wise-sum merge, equal to the batch
    ``cms_matrix`` over the union of all drained rows (the mergeability
    pytest in test_sketch is the proof obligation; the gate row hashes
    the end state against the batch oracle).

    Returns {"batches": n}; with ``available_now=False`` the live
    StreamingQuery handle is under "query".
    """
    from nebula_importer_spark.operators.sketch import cms_matrix

    cms_dir = f"{str(out_dir).rstrip('/')}/cms"
    seen: dict = {"batches": 0}

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        m = cms_matrix(batch_df, col, depth=depth, width=width, salt=salt)
        (
            m.withColumn("_batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_batch_id")
            .parquet(cms_dir)
        )
        seen["batches"] += 1

    writer = stream.writeStream.foreachBatch(_process).option(
        "checkpointLocation", str(checkpoint_dir)
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return dict(seen)
    seen["query"] = writer.start()
    return seen


def read_cms(spark, out_dir: str) -> DataFrame:
    """The live merged sketch: cell-wise sum across every drained batch
    partition — ≤ depth·width rows out, usable anywhere a batch
    ``cms_matrix`` result is (cms_estimate, further merges)."""
    return (
        spark.read.parquet(f"{str(out_dir).rstrip('/')}/cms")
        .groupBy("r", "c")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )
