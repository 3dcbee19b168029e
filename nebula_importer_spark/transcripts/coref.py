"""Recency-heuristic pronoun resolution over transcript mention streams.

The extraction stage (transcripts/extract.py) only emits triples whose
subject/object are LITERAL surface mentions; in real multi-turn
transcripts a large share of assertions use pronouns ("she joined
Acme"), so a KG construction pipeline needs a mention-level antecedent
pass before linking — this is the distributed plumbing for it. The
resolver is the classic recency baseline (most recent preceding entity
mention in the same conversation, bounded lookback) — deterministic and
exactly SQL-expressible, NOT a learned coreference model; swap the
scoring expression for a model's pairwise scores and the Spark shape
(one conversation-keyed window) is unchanged.

Reference analog: nebula-importer has no extraction at all (values come
from CSV cells, pkg/spec/v3/prop.go) — this stage exists precisely
because the transcript pipeline must MAKE the values the reference is
handed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def resolve_pronouns(
    mentions: DataFrame,
    *,
    conv: str = "conv_id",
    turn: str = "turn_idx",
    pos: str = "pos",
    kind: str = "kind",
    surface: str = "surface",
    max_turn_gap: int | None = None,
) -> DataFrame:
    """Resolve each pronoun mention to the most recent PRECEDING entity
    mention in the same conversation (order = ``(turn, pos)``, which must
    be unique per conversation — the extractor emits it that way).

    ``max_turn_gap``: antecedents more than this many turns back are
    discarded (the standard recency cutoff — a pronoun rarely refers
    across a long gap); ``None`` = unbounded. Unresolved pronouns are
    KEPT with a NULL antecedent — dropping them silently would hide
    recall loss from the pipeline metrics.

    Distributed shape: ONE conversation-keyed window exchange; the
    antecedent and its turn ride two ``last(..., ignorenulls=True)``
    frames over ``ROWS UNBOUNDED PRECEDING .. 1 PRECEDING`` (strictly
    before the pronoun, so an entity at the same position never resolves
    to itself). Mega-conversations are the same skew class as
    sessionize — span-salt upstream if a single conv exceeds a task
    (operators/temporal.py discipline).

    Returns ``(conv, turn, pos, pronoun, antecedent, ante_turn)`` — one
    row per pronoun mention.
    """
    w = (
        Window.partitionBy(conv)
        .orderBy(turn, pos)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    is_ent = F.col(kind) == "entity"
    resolved = (
        mentions.withColumn(
            "_ante", F.last(F.when(is_ent, F.col(surface)), ignorenulls=True).over(w)
        )
        .withColumn(
            "_ante_turn",
            F.last(F.when(is_ent, F.col(turn)), ignorenulls=True).over(w),
        )
        .filter(F.col(kind) == "pronoun")
    )
    if max_turn_gap is not None:
        in_reach = (F.col(turn) - F.col("_ante_turn")) <= max_turn_gap
        resolved = resolved.withColumn(
            "_ante", F.when(in_reach, F.col("_ante"))
        ).withColumn("_ante_turn", F.when(in_reach, F.col("_ante_turn")))
    return resolved.select(
        conv,
        turn,
        pos,
        F.col(surface).alias("pronoun"),
        F.col("_ante").alias("antecedent"),
        F.col("_ante_turn").cast("int").alias("ante_turn"),
    )
