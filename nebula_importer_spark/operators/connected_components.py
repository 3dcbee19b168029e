"""Connected components via iterative DataFrame joins (canonicalization).

Min-label propagation ("hash-to-min"): every node repeatedly adopts the
smallest label in its closed neighborhood; converges in O(diameter) rounds.
Each round is one shuffle-join + one aggregation, with ``localCheckpoint``
truncating the lineage so the plan doesn't grow exponentially (the classic
iterative-Spark failure mode).

Entity-equivalence graphs (same_as pairs, dedup clusters) are shallow —
diameter 2-4 — so label propagation beats the O(log n) large-star/small-star
scheme on constant factors here. For adversarially deep graphs swap in the
star algorithm; the driver loop and convergence accounting stay identical.

Derived operator per SURVEY §2.8 (north-star canonicalization step); the
reference has no join/iteration machinery at all (SURVEY §2.7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 25,
) -> DataFrame:
    """Edge list → (node, component) where component = min node id in the
    connected component (ids compared as their column type; use strings or
    longs consistently).

    Convergence is detected by counting label changes per round (an
    aggregate, not a collect of data rows).
    """
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .filter(F.col("a").isNotNull() & F.col("b").isNotNull())
        .distinct()
    )
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint(eager=True)
    )
    sym = sym.localCheckpoint(eager=True)

    for _ in range(max_iterations):
        # (1) neighbor-min: adopt the smallest label in the closed neighborhood
        nbr = (
            sym.join(labels.withColumnRenamed("node", "b"), "b")
            .groupBy("a")
            .agg(F.min("component").alias("nbr_min"))
        )
        stepped = labels.join(nbr.withColumnRenamed("a", "node"), "node", "left").select(
            "node",
            F.least(
                F.col("component"), F.coalesce(F.col("nbr_min"), F.col("component"))
            ).alias("component"),
        )
        # (2) pointer doubling: follow the label's own label (path
        # compression) — turns O(diameter) rounds into O(log diameter)
        parent = stepped.select(
            F.col("node").alias("component"), F.col("component").alias("_gp")
        )
        doubled = stepped.join(parent, "component", "left").select(
            "node",
            F.least(F.col("component"), F.coalesce(F.col("_gp"), F.col("component"))).alias(
                "component"
            ),
        )
        doubled = doubled.localCheckpoint(eager=True)
        changed = (
            doubled.withColumnRenamed("component", "_new")
            .join(labels, "node")
            .filter(F.col("_new") != F.col("component"))
            .count()
        )
        labels = doubled
        if changed == 0:
            break
    return labels


def canonical_mapping(
    same_as: DataFrame, left: str = "entity_id", right: str = "dup_id"
) -> DataFrame:
    """same_as pairs → (entity_id, canonical_id) covering every id that
    appears in any pair; ids not in the mapping are their own canonical
    (callers coalesce)."""
    comp = connected_components(same_as, src=left, dst=right)
    return comp.select(
        F.col("node").alias("entity_id"), F.col("component").alias("canonical_id")
    )
