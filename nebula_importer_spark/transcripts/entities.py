"""Per-entity profile cards over the constructed knowledge graph.

The first deliverable a KG consumer asks for after construction: one row
per canonical entity summarizing how it participates in the graph —
triple counts by role, predicate diversity, conversation coverage, and
its dominant predicate. (Reference analog: nebula-importer materializes
vertices with their tag property sets for NebulaGraph,
/root/reference/pkg/spec/v3/node.go — the card is the analytics-side
rendering of that vertex record for the transcript-constructed graph.)

Scale shape: each triple explodes map-side into two fixed-width
(entity, role, pred, conv_id) contribution rows — the only shuffle is
the entity-keyed aggregation, and every aggregate is partial-aggregable
(sums + count_distinct). The dominant-predicate pick runs on the
per-(entity, pred) count table — |entities| × avg-predicate-fanout rows,
orders of magnitude smaller than the triple table — with a deterministic
(count DESC, pred ASC) tie-break so the card is reproducible under any
partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def entity_cards(triples: DataFrame) -> DataFrame:
    """``(entity, n_subj, n_obj, n_preds, n_convs, top_pred)`` per entity
    appearing in ``triples`` (schema: conv_id, turn_idx, subj, pred, obj,
    the canonical_triples output).

    - ``n_subj`` / ``n_obj``: triples where the entity plays that role.
    - ``n_preds``: distinct predicates across both roles.
    - ``n_convs``: distinct conversations the entity appears in.
    - ``top_pred``: the entity's most frequent predicate (both roles),
      ties broken by predicate name — deterministic, partition-order-free.
    """
    contrib = triples.select(
        F.explode(
            F.array(
                F.struct(F.col("subj").alias("entity"), F.lit(1).alias("is_subj")),
                F.struct(F.col("obj").alias("entity"), F.lit(0).alias("is_subj")),
            )
        ).alias("c"),
        "pred",
        "conv_id",
    ).select("c.entity", "c.is_subj", "pred", "conv_id")

    cards = contrib.groupBy("entity").agg(
        F.sum("is_subj").cast("long").alias("n_subj"),
        F.sum(1 - F.col("is_subj")).cast("long").alias("n_obj"),
        F.count_distinct("pred").cast("long").alias("n_preds"),
        F.count_distinct("conv_id").cast("long").alias("n_convs"),
    )

    pred_counts = contrib.groupBy("entity", "pred").agg(
        F.count(F.lit(1)).alias("_n")
    )
    top = (
        pred_counts.withColumn(
            "_rk",
            F.row_number().over(
                Window.partitionBy("entity").orderBy(
                    F.desc("_n"), F.asc("pred")
                )
            ),
        )
        .filter(F.col("_rk") == 1)
        .select("entity", F.col("pred").alias("top_pred"))
    )
    return cards.join(top, "entity")


def triple_spans(triples: DataFrame, turn_ts: DataFrame) -> DataFrame:
    """Temporal provenance per canonical triple — the edge-side companion
    of :func:`entity_cards`: for every distinct ``(subj, pred, obj)``,
    when was it first and last asserted, in how many turns, and across
    how many conversations. This is the support/recency evidence a KG
    consumer filters on before trusting an extracted edge (single-turn
    one-off vs repeatedly re-asserted fact), and the property payload a
    temporal KG writes onto the edge record (reference analog: the edge
    property set of /root/reference/pkg/spec/v3/edge.go — here the
    properties are derived evidence, not mapped CSV columns).

    ``triples`` is the canonical_triples output ``(conv_id, turn_idx,
    subj, pred, obj)``; ``turn_ts`` maps ``(conv_id, turn_idx) → ts``
    (the transcript table projection — the pipeline never carries ts
    through extraction, so evidence timestamps re-attach here by key).

    Distributed shape: one ``(conv_id, turn_idx)``-keyed equi-join (both
    sides pre-projected to fixed-width columns; AQE broadcast-degrades
    when the turn dimension is small) and ONE partial-agg'd shuffle on
    the triple key. min/max/count/count_distinct all combine map-side,
    so the exchange carries one row per distinct triple per task.

    Returns ``(subj, pred, obj, n_support, n_convs, first_ts, last_ts)``.
    """
    ts = turn_ts.select(
        "conv_id", F.col("turn_idx").cast("int").alias("turn_idx"), "ts"
    )
    ev = triples.select(
        "conv_id", F.col("turn_idx").cast("int").alias("turn_idx"),
        "subj", "pred", "obj",
    ).join(ts, ["conv_id", "turn_idx"])
    return ev.groupBy("subj", "pred", "obj").agg(
        F.count(F.lit(1)).alias("n_support"),
        F.count_distinct("conv_id").cast("long").alias("n_convs"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
    )


def comention_edges(
    triples: DataFrame, *, max_group_size: int | None = None
) -> DataFrame:
    """Entity co-mention graph over the constructed KG: entities appearing
    in the SAME conversation (either role, either side of any triple)
    become an undirected edge weighted by the number of co-mentioning
    conversations — the conversation-level association graph that feeds
    community/k-core/truss analytics, complementing the triple graph's
    asserted edges (two entities can be strongly associated without any
    direct triple between them).

    Scale shape: participation dedups to one row per (conversation,
    entity) — fixed-width key, one exchange — then the conversation-keyed
    self-join explodes each conversation into O(|entities|²) pairs.
    ``max_group_size`` guards the mega-thread cliff exactly like
    operators/graph.py:cooccurrence_edges (conversations above the cap
    are dropped; a pair inside a 10⁵-entity thread carries ~zero
    association signal). Pair counting is partial-agg'd on the canonical
    (ent_a < ent_b) pair key.

    Returns ``(ent_a, ent_b, n_convs)``.
    """
    ent = triples.select(
        "conv_id",
        F.explode(F.array(F.col("subj"), F.col("obj"))).alias("entity"),
    ).distinct()
    if max_group_size is not None:
        if max_group_size < 2:
            raise ValueError(
                f"max_group_size must be >= 2, got {max_group_size}"
            )
        sizes = ent.groupBy("conv_id").agg(F.count(F.lit(1)).alias("_sz"))
        ent = ent.join(
            sizes.filter(F.col("_sz") <= max_group_size).select("conv_id"),
            "conv_id",
            "left_semi",
        )
    a = ent.select("conv_id", F.col("entity").alias("ent_a"))
    b = ent.select("conv_id", F.col("entity").alias("ent_b"))
    return (
        a.join(b, "conv_id")
        .filter(F.col("ent_a") < F.col("ent_b"))
        .groupBy("ent_a", "ent_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_convs"))
    )
