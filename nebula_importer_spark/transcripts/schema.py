"""Schema induction and merge-quality audits over the constructed KG.

After construction (extract → link → canonicalize), a KG pipeline needs
answers the reference's CSV-config world takes as GIVEN: what does each
predicate look like (nebula-importer is handed its edge schema in YAML —
/root/reference/pkg/spec/v3/edge.go; a from-scratch extraction pipeline
must INDUCE it), did a re-crawl change the graph (the reference's
resume-from-checkpoint story — /root/reference/pkg/manager/manager.go —
made queryable as a snapshot delta), and did merging two extraction
sources create contradictions or duplicate vocabularies.

Four operators, one discipline: every one reduces the triple table to
fixed-width keyed rows map-side, shuffles ONCE on a bounded key
(predicate, triple key, or (subj,obj) fact pair), and emits only
hash-stable types (strings + longs; ratios as integer-scaled floor
divisions, never floats — the same exact-integer contract that makes
PageRank/HITS/RA driver-gateable).

Scale notes per operator are on the functions. None of them ever
collects, crossJoins, or carries the conversation text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

#: ratio unit: 10^12 == 1.0 — matches PAGERANK_SCALE so every scaled
#: ratio in the repo reads the same way.
SCHEMA_SCALE = 10**12

_FACT_COLS = ("subj", "pred", "obj")


def _facts(triples: DataFrame) -> DataFrame:
    """Distinct (subj, pred, obj) facts — provenance columns dropped first
    so the dedup exchange carries only the fixed-width fact key."""
    return triples.select(*_FACT_COLS).distinct()


def _ns(col: str) -> F.Column:
    """Entity namespace = the canonical-id prefix before ':' (the pipeline
    mints ids as '<type>:<name>'); ids without one type as 'unk'."""
    c = F.col(col)
    return F.when(c.contains(":"), F.split(c, ":").getItem(0)).otherwise(
        F.lit("unk")
    )


def predicate_stats(triples: DataFrame, scale: int = SCHEMA_SCALE) -> DataFrame:
    """PARIS-style per-predicate schema statistics over the constructed KG.

    For every predicate: fact count, distinct subject/object counts,
    functionality ``n_subj / n_facts`` and inverse functionality
    ``n_obj / n_facts`` (Suchanek et al., "PARIS: Probabilistic Alignment
    of Relations, Instances, and Schema", VLDB 2012 — the standard signal
    for "is this predicate one-to-one / many-to-one", which downstream
    drives functional-conflict detection and alignment weighting), and the
    dominant subject/object namespace (induced domain/range typing).

    Ratios are integer-scaled floor divisions (``scale == 10**12`` → 1.0)
    so the output is bit-stable under any aggregation order.

    Distributed shape: facts dedup (one exchange on the fact key), then a
    predicate-keyed aggregation — count_distinct is two-phase but the
    second phase is |preds|-sized. The namespace tables are
    |preds| × |namespaces| rows; the dominant pick is a row_number on that
    tiny table with a deterministic (count DESC, name ASC) tie-break.

    Returns ``(pred, n_facts, n_subj, n_obj, fun_scaled, inv_fun_scaled,
    top_domain, top_range)``.
    """
    f = _facts(triples)
    stats = f.groupBy("pred").agg(
        F.count(F.lit(1)).alias("n_facts"),
        F.count_distinct("subj").alias("n_subj"),
        F.count_distinct("obj").alias("n_obj"),
    )
    stats = stats.select(
        "pred",
        "n_facts",
        "n_subj",
        "n_obj",
        F.expr(f"({scale} * n_subj) div n_facts").alias("fun_scaled"),
        F.expr(f"({scale} * n_obj) div n_facts").alias("inv_fun_scaled"),
    )

    def _top(col_ns: F.Column, out: str) -> DataFrame:
        counts = f.groupBy("pred", col_ns.alias("_t")).agg(
            F.count(F.lit(1)).alias("_n")
        )
        w = Window.partitionBy("pred").orderBy(F.desc("_n"), F.asc("_t"))
        return (
            counts.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") == 1)
            .select("pred", F.col("_t").alias(out))
        )

    return (
        stats.join(_top(_ns("subj"), "top_domain"), "pred")
        .join(_top(_ns("obj"), "top_range"), "pred")
    )


def snapshot_diff(old: DataFrame, new: DataFrame) -> DataFrame:
    """Triple-level delta between two construction snapshots (e.g. the
    checkpoint a resumable run restarts from vs the finished re-crawl —
    the queryable form of the reference's resume story,
    /root/reference/pkg/manager/manager.go).

    Support = evidence rows per fact (turn-level provenance count). Status:
    ``added`` (new only), ``removed`` (old only), ``changed`` (both, support
    moved), ``unchanged``.

    Distributed shape: each side pre-aggregates to one row per fact
    (partial-agg'd count), then ONE full-outer equi-join on the fact key.
    Nothing driver-side; the join key is the fixed-width canonical triple.

    Returns ``(subj, pred, obj, support_old, support_new, status)``.
    """
    a = old.groupBy(*_FACT_COLS).agg(F.count(F.lit(1)).alias("_sa"))
    b = new.groupBy(*_FACT_COLS).agg(F.count(F.lit(1)).alias("_sb"))
    j = a.join(b, list(_FACT_COLS), "full_outer")
    return j.select(
        *_FACT_COLS,
        F.coalesce("_sa", F.lit(0)).cast("long").alias("support_old"),
        F.coalesce("_sb", F.lit(0)).cast("long").alias("support_new"),
        F.when(F.col("_sa").isNull(), "added")
        .when(F.col("_sb").isNull(), "removed")
        .when(F.col("_sa") != F.col("_sb"), "changed")
        .otherwise("unchanged")
        .alias("status"),
    )


def functional_conflicts(
    triples: DataFrame, functional_preds: list[str]
) -> DataFrame:
    """Functional-predicate violations: subjects asserting ≥2 distinct
    objects for a predicate declared (or induced — see
    :func:`predicate_stats`) to be many-to-ONE. The canonical post-merge
    audit: a subject that "works_at" two orgs after unioning a re-crawl
    either reveals entity-resolution failure or a stale fact to retire.

    Distributed shape: filter to the functional predicates map-side
    (predicate list is a literal IN — Catalyst folds it into the scan
    filter), dedup facts, ONE (subj, pred)-keyed aggregation. min/max give
    deterministic conflict witnesses without carrying an unbounded
    collect_set through the shuffle.

    Returns ``(subj, pred, n_objs, first_obj, last_obj)`` for violations.
    """
    f = (
        triples.filter(F.col("pred").isin(functional_preds))
        .select(*_FACT_COLS)
        .distinct()
    )
    return (
        f.groupBy("subj", "pred")
        .agg(
            F.count(F.lit(1)).alias("n_objs"),
            F.min("obj").alias("first_obj"),
            F.max("obj").alias("last_obj"),
        )
        .filter(F.col("n_objs") >= 2)
    )


def predicate_alignment(
    triples: DataFrame, min_shared: int = 2, scale: int = SCHEMA_SCALE
) -> DataFrame:
    """Synonym-predicate candidates: predicate pairs whose fact sets
    overlap on (subj, obj). When two extractor versions (or two source
    vocabularies) emit ``works_at`` and ``employed_by`` for the same
    entity pairs, this surfaces the merge candidate — the relation-level
    analog of the entity same_as edges the pipeline already canonicalizes
    (PARIS relation alignment, scored as integer-scaled containment
    ``|A∩B| / min(|A|,|B|)``).

    Distributed shape: facts dedup, then a SELF-EQUI-JOIN on the
    (subj, obj) pair key — fan-out per fact pair is the number of
    predicates asserting that exact pair (in practice ≲ the predicate
    vocabulary, never corpus-sized), with ``pred_a < pred_b`` halving the
    output. Sizes join back on the |preds|-row count table (broadcast).

    Returns ``(pred_a, pred_b, n_shared, containment_scaled)``.
    """
    f = _facts(triples)
    sz = f.groupBy("pred").agg(F.count(F.lit(1)).alias("_n"))
    a = f.select(F.col("subj"), F.col("obj"), F.col("pred").alias("pred_a"))
    b = f.select(F.col("subj"), F.col("obj"), F.col("pred").alias("pred_b"))
    shared = (
        a.join(b, ["subj", "obj"])
        .filter(F.col("pred_a") < F.col("pred_b"))
        .groupBy("pred_a", "pred_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
    return (
        shared.join(
            F.broadcast(sz.select(F.col("pred").alias("pred_a"), F.col("_n").alias("_na"))),
            "pred_a",
        )
        .join(
            F.broadcast(sz.select(F.col("pred").alias("pred_b"), F.col("_n").alias("_nb"))),
            "pred_b",
        )
        .select(
            "pred_a",
            "pred_b",
            "n_shared",
            F.expr(f"({scale} * n_shared) div least(_na, _nb)").alias(
                "containment_scaled"
            ),
        )
    )


def fact_history(snapshots: DataFrame, version_col: str = "v") -> DataFrame:
    """SCD2-style validity intervals: given facts observed across NUMBERED
    construction snapshots (``(subj, pred, obj, v)`` — one row per fact
    per snapshot that asserts it), emit each fact's contiguous presence
    intervals ``[valid_from, valid_to]``. A fact retracted and later
    re-asserted yields TWO intervals — the temporal-KG history record
    :func:`snapshot_diff` produces pairwise, generalized to the whole
    snapshot sequence (the queryable form of an Iceberg snapshot chain).

    Distributed shape: gaps-and-islands on the fact key — dedup to one
    row per (fact, v), then ``v - row_number()`` over ONE fact-keyed
    window is constant exactly within a consecutive run; the interval
    aggregation groups on (fact, island) and reuses the window's
    partitioning (no second exchange of the fact key).

    Returns ``(subj, pred, obj, valid_from, valid_to, n_snapshots)``.
    """
    f = snapshots.select(
        *_FACT_COLS, F.col(version_col).cast("long").alias("_v")
    ).distinct()
    w = Window.partitionBy(*_FACT_COLS).orderBy("_v")
    isl = f.withColumn("_g", F.col("_v") - F.row_number().over(w))
    return isl.groupBy(*_FACT_COLS, "_g").agg(
        F.min("_v").alias("valid_from"),
        F.max("_v").alias("valid_to"),
        F.count("*").cast("long").alias("n_snapshots"),
    ).drop("_g")
