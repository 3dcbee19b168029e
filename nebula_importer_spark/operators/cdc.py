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


def scd2_history(
    changes: DataFrame,
    *,
    key_cols: list[str],
    ts_col: str,
    tiebreak_cols: list[str] | None = None,
    op_col: str | None = None,
    delete_ops: tuple[str, ...] = ("D", "delete"),
    collapse_cols: list[str] | None = None,
) -> DataFrame:
    """Build the SCD-Type-2 interval history a changelog implies: one row
    per (key, state version) with ``valid_from`` / ``valid_to`` /
    ``is_current`` — the history-PRESERVING twin of :func:`apply_changes`
    (which keeps only each key's end state). This is the dimension-table
    form every warehouse load pipeline needs next to latest-wins upsert
    (Kimball SCD2; Delta/Hudi call it a history or point-in-time table),
    and the set-oriented analog of replaying the reference's UPDATE/
    DELETE write modes (`/root/reference/pkg/specv3/edge.go`) while
    KEEPING every superseded version queryable.

    Semantics, per key in ``(ts_col, *tiebreak_cols)`` ascending order:

    - every change row opens an interval at its own timestamp;
      ``valid_to`` is the NEXT change's timestamp (NULL = still open);
    - a tombstone (``op_col`` in ``delete_ops``) CLOSES the previous
      interval but emits no state row itself — a later re-insert
      naturally revives the key as a fresh interval;
    - ``collapse_cols``: when given, a change whose ``collapse_cols``
      values all equal the immediately-previous surviving row's (both
      non-tombstone, NULL-safe ``<=>`` comparison) is a NO-OP change and
      is dropped BEFORE intervals are cut, so runs of identical states
      become one long interval (the classic "suppress unchanged rows"
      SCD2 rule);
    - ``is_current`` is true for an open interval whose row is not a
      tombstone.

    Determinism contract: ``(ts_col, *tiebreak_cols)`` must totally
    order each key's changes (same discipline as every windowed operator
    here). NULL timestamps sort FIRST ascending (Spark default) and so
    appear as the oldest versions.

    Scale shape: two key-partitioned window passes over the changelog
    (lag for collapse, lead for interval cut) on ONE exchange — Spark
    reuses the (key) hash partitioning across both windows because the
    partition keys match; no joins, no collect, columns are CARRIED so
    floats/timestamps hash bit-identically. At 100 TB the only axis that
    matters is keys × versions, which is exactly the output size.
    """
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    tiebreak_cols = list(tiebreak_cols or [])
    need = [ts_col, *key_cols, *tiebreak_cols]
    if op_col:
        need.append(op_col)
    missing = [c for c in need if c not in changes.columns]
    if missing:
        raise ValueError(f"columns {missing} not in input: {changes.columns}")
    for c in collapse_cols or []:
        if c not in changes.columns:
            raise ValueError(f"collapse column {c!r} not in input")
    for reserved in ("valid_from", "valid_to", "is_current", "_tomb", "_dup"):
        if reserved in changes.columns:
            raise ValueError(
                f"input must not contain the reserved column {reserved!r}"
            )

    order = [F.col(ts_col).asc(), *[F.col(c).asc() for c in tiebreak_cols]]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    tomb = (
        F.col(op_col).isin(list(delete_ops))
        if op_col is not None
        else F.lit(False)
    )
    df = changes.withColumn("_tomb", F.coalesce(tomb, F.lit(False)))
    if collapse_cols:
        same_prev = F.lit(True)
        for c in collapse_cols:
            same_prev = same_prev & F.col(c).eqNullSafe(F.lag(c).over(w))
        df = df.withColumn(
            "_dup",
            same_prev
            & ~F.col("_tomb")
            & ~F.coalesce(F.lag("_tomb").over(w), F.lit(True)),
        ).filter(~F.col("_dup")).drop("_dup")
    out = (
        df.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.lead(ts_col).over(w))
        .withColumn(
            "is_current", F.col("valid_to").isNull() & ~F.col("_tomb")
        )
        .filter(~F.col("_tomb"))
        .drop("_tomb")
    )
    return out
