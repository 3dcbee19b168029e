"""transcripts/schema.py — schema induction + merge-quality audits.

Hand-built triple frames exercise the branches the synthetic gate corpus
cannot (the 'changed' diff status, exact functionality arithmetic,
namespace tie-breaks), plus plan-shape checks that the fact tables never
cross-join and the predicate size table broadcasts.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from nebula_importer_spark.transcripts.schema import (
    SCHEMA_SCALE,
    functional_conflicts,
    predicate_alignment,
    predicate_stats,
    snapshot_diff,
)


def _triples(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, subj string, pred string, obj string"
    )


def test_predicate_stats_functionality_and_typing(spark):
    # works_at: 3 facts, 2 subjects, 3 objects -> fun = 2/3, inv_fun = 1
    # mentions: subject namespaces split 2 person vs 1 org -> person wins;
    # a 1-1 tie on object namespace resolves alphabetically.
    rows = [
        ("c1", 0, "person:a", "works_at", "org:x"),
        ("c1", 0, "person:a", "works_at", "org:y"),
        ("c2", 0, "person:b", "works_at", "org:z"),
        ("c1", 0, "person:a", "mentions", "org:x"),
        ("c2", 0, "person:b", "mentions", "place:p"),
        ("c3", 0, "org:x", "mentions", "person:a"),
        # duplicate provenance row: must not double-count facts
        ("c9", 1, "person:a", "works_at", "org:x"),
    ]
    out = {
        r["pred"]: r
        for r in predicate_stats(_triples(spark, rows)).collect()
    }
    wa = out["works_at"]
    assert wa["n_facts"] == 3 and wa["n_subj"] == 2 and wa["n_obj"] == 3
    assert wa["fun_scaled"] == SCHEMA_SCALE * 2 // 3
    assert wa["inv_fun_scaled"] == SCHEMA_SCALE
    assert wa["top_domain"] == "person" and wa["top_range"] == "org"
    me = out["mentions"]
    assert me["top_domain"] == "person"  # 2 person vs 1 org
    # object namespaces org/place/person are 1-1-1: alphabetical min wins
    assert me["top_range"] == "org"


def test_predicate_stats_unnamespaced_entities(spark):
    rows = [("c1", 0, "plain", "p", "also_plain")]
    r = predicate_stats(_triples(spark, rows)).collect()[0]
    assert r["top_domain"] == "unk" and r["top_range"] == "unk"
    assert r["fun_scaled"] == SCHEMA_SCALE


def test_snapshot_diff_all_four_statuses(spark):
    old = _triples(
        spark,
        [
            ("c1", 0, "a", "p", "x"),  # unchanged
            ("c2", 0, "b", "p", "y"),  # removed
            ("c3", 0, "c", "p", "z"),  # changed: support 1 -> 2
        ],
    )
    new = _triples(
        spark,
        [
            ("c1", 0, "a", "p", "x"),
            ("c3", 0, "c", "p", "z"),
            ("c4", 1, "c", "p", "z"),
            ("c5", 0, "d", "p", "w"),  # added
        ],
    )
    got = {
        (r["subj"], r["pred"], r["obj"]): r
        for r in snapshot_diff(old, new).collect()
    }
    assert got[("a", "p", "x")]["status"] == "unchanged"
    assert got[("b", "p", "y")]["status"] == "removed"
    assert got[("b", "p", "y")]["support_new"] == 0
    assert got[("c", "p", "z")]["status"] == "changed"
    assert got[("c", "p", "z")]["support_old"] == 1
    assert got[("c", "p", "z")]["support_new"] == 2
    assert got[("d", "p", "w")]["status"] == "added"
    assert got[("d", "p", "w")]["support_old"] == 0


def test_functional_conflicts_detects_only_violations(spark):
    rows = [
        ("c1", 0, "person:a", "works_at", "org:x"),
        ("c2", 0, "person:a", "works_at", "org:y"),  # conflict
        ("c2", 1, "person:a", "works_at", "org:y"),  # dup provenance, same obj
        ("c3", 0, "person:b", "works_at", "org:z"),  # fine
        ("c4", 0, "person:a", "knows", "person:b"),
        ("c5", 0, "person:a", "knows", "person:c"),  # knows not functional
    ]
    out = functional_conflicts(_triples(spark, rows), ["works_at"]).collect()
    assert len(out) == 1
    r = out[0]
    assert r["subj"] == "person:a" and r["n_objs"] == 2
    assert r["first_obj"] == "org:x" and r["last_obj"] == "org:y"


def test_predicate_alignment_containment(spark):
    # works_at has 4 facts, employed_by has 2, both employed_by facts are
    # shared -> containment = 2/min(4,2) = 1.0; the unrelated predicate
    # pair shares only 1 fact and falls under min_shared.
    rows = [
        ("c1", 0, "a", "works_at", "x"),
        ("c2", 0, "b", "works_at", "y"),
        ("c3", 0, "c", "works_at", "z"),
        ("c4", 0, "d", "works_at", "w"),
        ("c5", 0, "a", "employed_by", "x"),
        ("c6", 0, "b", "employed_by", "y"),
        ("c7", 0, "a", "mentions", "x"),
    ]
    out = predicate_alignment(_triples(spark, rows), min_shared=2).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["pred_a"], r["pred_b"]) == ("employed_by", "works_at")
    assert r["n_shared"] == 2
    assert r["containment_scaled"] == SCHEMA_SCALE


def test_alignment_plan_broadcasts_sizes_no_cartesian(spark):
    rows = [("c%d" % i, 0, "s%d" % (i % 5), "p%d" % (i % 2), "o%d" % (i % 5))
            for i in range(40)]
    plan = predicate_alignment(_triples(spark, rows))._jdf.queryExecution(
    ).executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan  # the |preds|-row size table


def test_diff_plan_is_one_join_on_fact_key(spark):
    old = _triples(spark, [("c1", 0, "a", "p", "x")])
    new = _triples(spark, [("c1", 0, "a", "p", "x")])
    plan = snapshot_diff(old, new)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") + plan.count(
        "BroadcastHashJoin"
    ) == 1


def test_fact_history_intervals_and_reassertion_gap(spark):
    from nebula_importer_spark.transcripts.schema import fact_history

    rows = [
        # fact A: present v1..v3 -> one full interval
        ("c", 0, "a", "p", "x", 1), ("c", 0, "a", "p", "x", 2),
        ("c", 1, "a", "p", "x", 3),  # different provenance, same fact+v
        ("c", 0, "a", "p", "x", 2),  # duplicate row, must not double count
        # fact B: retracted at v2, re-asserted at v3 -> TWO intervals
        ("c", 0, "b", "p", "y", 1), ("c", 0, "b", "p", "y", 3),
        # fact C: single version
        ("c", 0, "d", "q", "z", 2),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, subj string, pred string, "
              "obj string, v int"
    )
    got = {
        (r.subj, r.pred, r.obj, r.valid_from): (r.valid_to, r.n_snapshots)
        for r in fact_history(df).collect()
    }
    assert got == {
        ("a", "p", "x", 1): (3, 3),
        ("b", "p", "y", 1): (1, 1),
        ("b", "p", "y", 3): (3, 1),
        ("d", "q", "z", 2): (2, 1),
    }


def test_fact_history_single_exchange(spark):
    from nebula_importer_spark.transcripts.schema import fact_history

    df = spark.createDataFrame(
        [("a", "p", "x", 1)], "subj string, pred string, obj string, v int"
    )
    plan = fact_history(df)._jdf.queryExecution().executedPlan().toString()
    # dedup + window + interval agg all share the fact-key partitioning:
    # exactly one real exchange (AQE may add a trailing coalesce read)
    assert plan.count("Exchange hashpartitioning") <= 2
