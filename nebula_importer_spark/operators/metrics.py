"""Exact distributed model-evaluation metrics.

A corpus pipeline that trains quality classifiers, rerankers, and
filters (the lm_perplexity / quality_score / bm25 surfaces here) needs
to EVALUATE them at data scale — and the standard tools either sample
(sklearn on a driver-side sample) or approximate (histogram AUC). At
100 TB the scored table doesn't fit a driver, and a global sort by
score is exactly the shuffle you don't want. This module computes the
exact tie-aware Mann-Whitney AUC with NO global sort: scores fall into
order-preserving equal-width buckets (broadcast 1-row min/max), prefix
sums run per bucket, and the bucket-level totals — one row per bucket —
take an exclusive prefix sum that broadcasts back as offsets (the
token_budget_sample / negative_samples two-level machinery applied to
rank statistics).

Exactness contract: scores must be INTEGRAL (quantize floats
caller-side — the layout.zorder_key / profile.column_histogram rule;
for a float score, a fixed-point ``cast(round(score·1e6) as long)``
preserves the AUC because ranks only need order). All rank arithmetic
is integer: tied groups contribute ``2·midrank`` terms so nothing is
ever halved, and the final AUC is one integer floor division at 1e12
scale — bit-identical on any engine, partitioning, or accumulation
order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

#: AUC is returned as an integer in millionths of a millionth (1e12).
AUC_SCALE = 10**12


def exact_auc(
    df: DataFrame,
    *,
    score_col: str = "score",
    label_col: str = "label",
    n_buckets: int = 64,
) -> DataFrame:
    """Exact tie-aware ROC AUC of integral ``score_col`` against binary
    ``label_col`` (1 = positive, 0 = negative), computed as the
    Mann-Whitney U statistic with midranks:

        U = Σ_positives rank(score) − n_pos·(n_pos+1)/2
        AUC = U / (n_pos · n_neg)

    Tied scores take the average rank of their run; kept exact by
    working in DOUBLED ranks (``rank2 = 2·below + tied + 1`` per member
    of a tied group, an odd integer — never a .5).

    Distributed shape (no global sort, no driver collect):

    1. ONE partial-aggregable groupBy collapses the table to one row per
       DISTINCT score — ``(score, n, n_pos)``. This is the only
       data-sized shuffle, and it shuffles longs.
    2. Scores bucket by exact equal-width long math (broadcast 1-row
       min/max, same floor-div rule as profile.column_histogram) —
       buckets are ORDER-PRESERVING, so a per-bucket window prefix sum
       plus an exclusive prefix over the ≤ n_buckets bucket totals
       (driver-free: a broadcast self-join) yields every score's exact
       global ``below`` count.
    3. One final 1-row aggregation assembles U and the floor-divided
       ``auc_scaled`` (1e12 scale).

    Rows with NULL score or label are excluded and counted in the
    output. Returns one row:
    ``(n_pos, n_neg, n_scores, n_null, auc_scaled)``.
    Degenerate inputs (no positives or no negatives) return NULL
    ``auc_scaled`` — visible, not a fake 0.5.
    """
    for c in (score_col, label_col):
        if c not in df.columns:
            raise ValueError(f"column {c!r} not in input: {df.columns}")
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    by_name = {f.name: f.dataType for f in df.schema.fields}
    integral = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
    if not isinstance(by_name[score_col], integral):
        raise ValueError(
            f"exact_auc needs an integral score (quantize floats "
            f"caller-side): {score_col} is {by_name[score_col]}"
        )

    s = F.col(score_col)
    lbl = F.col(label_col)
    valid = df.filter(s.isNotNull() & lbl.isNotNull())
    # 1-row side aggregate, broadcast back — no separate driver action
    nulls = df.agg(
        F.sum(F.when(s.isNull() | lbl.isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_null")
    )

    # 1. one row per distinct score
    per_score = valid.groupBy(s.cast("long").alias("_s")).agg(
        F.count(F.lit(1)).cast("long").alias("_n"),
        F.sum(lbl.cast("long")).cast("long").alias("_np"),
    )

    # 2. order-preserving equal-width buckets + two-level prefix sum
    stats = per_score.agg(
        F.min("_s").alias("_mn"), F.max("_s").alias("_mx")
    )
    bucketed = per_score.crossJoin(F.broadcast(stats)).withColumn(
        "_b", F.expr(f"((_s - _mn) * {n_buckets}) div (_mx - _mn + 1)")
    )
    w = (
        Window.partitionBy("_b")
        .orderBy("_s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = bucketed.withColumn(
        "_below_local", F.coalesce(F.sum("_n").over(w), F.lit(0).cast("long"))
    )
    totals = bucketed.groupBy("_b").agg(F.sum("_n").alias("_bt"))
    wb = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "_b", F.coalesce(F.sum("_bt").over(wb), F.lit(0).cast("long")).alias("_off")
    )
    ranked = local.join(F.broadcast(offsets), "_b").withColumn(
        "_below", F.col("_below_local") + F.col("_off")
    )

    # 3. positives in a tied run each carry rank2 = 2·below + n + 1
    out = ranked.agg(
        F.coalesce(F.sum("_np"), F.lit(0)).cast("long").alias("n_pos"),
        F.coalesce(F.sum("_n") - F.sum("_np"), F.lit(0))
        .cast("long")
        .alias("n_neg"),
        F.count(F.lit(1)).cast("long").alias("n_scores"),
        F.coalesce(
            F.sum(
                F.col("_np")
                * (F.lit(2) * F.col("_below") + F.col("_n") + F.lit(1))
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("_r2"),
    )
    # 2U = Σ rank2 − 2·n_pos(n_pos+1)/2 = _r2 − n_pos·(n_pos+1)
    return out.crossJoin(F.broadcast(nulls)).select(
        "n_pos",
        "n_neg",
        "n_scores",
        F.coalesce(F.col("n_null"), F.lit(0)).cast("long").alias("n_null"),
        # DECIMAL(38,0) intermediates: 1e12·U2 wraps int64 past ~10M rows;
        # decimal `div` is exact floor and lands back in a BIGINT, the
        # HUGEINT-`//` twin on the DuckDB side.
        F.when(
            (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
            F.expr(
                f"(CAST({AUC_SCALE} AS DECIMAL(38,0))"
                f" * (_r2 - n_pos * (n_pos + 1)))"
                f" div CAST(2 * n_pos * n_neg AS DECIMAL(38,0))"
            ),
        )
        .cast("long")
        .alias("auc_scaled"),
    )
