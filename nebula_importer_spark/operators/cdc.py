"""Change-data-capture apply: latest-wins upsert + tombstone deletes.

The ingestion step between a CDC/changelog stream and a queryable state
table (the Delta Lake ``MERGE`` / Debezium-consumer / Hudi upsert
pattern, and the batch twin of `streaming/transcripts.py`'s
identity-keyed foreachBatch merge): given a table of change rows —
inserts, updates and deletes interleaved, each stamped with a per-key
monotone sequence — produce the state table a key-by-key replay would
leave behind. The reference's UPDATE/DELETE write modes
(`/root/reference/pkg/specv3/edge.go`, mode handling) are the
row-at-a-time client-side form of the same contract; this is the
set-oriented 100-TB form.

Scale shape: ONE key-partitioned window pass. The ``row_number() = 1``
filter plans as a map-side WindowGroupLimit on Spark ≥ 3.5 — each task
forwards only its local latest row per key, so the exchange moves ≤
(keys × tasks) rows, never the change history. No joins, no collect;
the surviving row's columns are CARRIED, never recomputed, so floats
and timestamps pass through bit-identically (the resample_locf
discipline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def apply_changes(
    changes: DataFrame,
    *,
    key_cols: list[str],
    seq_cols: list[str],
    op_col: str | None = None,
    delete_ops: tuple[str, ...] = ("D", "delete"),
) -> DataFrame:
    """Replay a change table to its end state: per ``key_cols`` group keep
    the single row with the greatest ``seq_cols`` tuple (descending,
    left-to-right); drop the key entirely when that surviving row's
    ``op_col`` is one of ``delete_ops`` (a tombstone ends the key — a
    later re-insert naturally revives it, because the re-insert IS the
    latest row then).

    Determinism contract: ``seq_cols`` must totally order each key's
    changes (give a tiebreaker column — e.g. ``["ts", "event_id"]`` —
    exactly as every windowed operator in this repo does); NULL sequence
    values sort LAST under descending order (Spark default), i.e. a
    NULL-stamped change never wins over a stamped one. NULL keys form
    one group, like SQL GROUP BY treats them — visible in the output,
    not dropped.

    Returns the surviving rows with the input schema unchanged
    (``op_col`` included, as merge lineage).
    """
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    if not seq_cols:
        raise ValueError("seq_cols must be non-empty")
    missing = [
        c
        for c in (*key_cols, *seq_cols, *([op_col] if op_col else []))
        if c not in changes.columns
    ]
    if missing:
        raise ValueError(f"columns {missing} not in input: {changes.columns}")
    overlap = set(key_cols) & set(seq_cols)
    if overlap:
        raise ValueError(f"key/seq columns overlap: {sorted(overlap)}")
    if "_rn" in changes.columns:
        raise ValueError("input must not contain the reserved column '_rn'")

    w = Window.partitionBy(*key_cols).orderBy(
        *[F.col(c).desc() for c in seq_cols]
    )
    latest = (
        changes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    if op_col is not None:
        latest = latest.filter(
            ~F.col(op_col).isin(list(delete_ops))
            | F.col(op_col).isNull()
        )
    return latest
