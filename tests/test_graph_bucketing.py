"""bucket_by_src — pre-partitioned edge tables for the iterative graph
family (pagerank / hits / trustrank / bfs_distances).

Two claims, both checked:
1. PLAN: with bucketing on, the superstep joins' edge side is the
   pre-partitioned LogicalRDD — NO per-superstep Exchange on the edge
   columns appears in the final plan (only the |V|-sized score side
   exchanges). Broadcast and AQE are disabled for the assertion so the
   join shape is the one a 100-TB run would take (edges never broadcast
   there).
2. VALUES: results are bit-identical with and without bucketing —
   partitioning never enters the exact-integer math.
"""

from __future__ import annotations

import pytest


@pytest.fixture()
def no_broadcast(spark):
    old_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    yield spark
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_bc)
    spark.conf.set("spark.sql.adaptive.enabled", old_aqe)


def _edges(spark):
    rows = [(i, (i * 7 + 3) % 50) for i in range(200)] + [
        (i % 50, (i * 13 + 1) % 50) for i in range(100)
    ]
    return spark.createDataFrame(rows, "src long, dst long")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_pagerank_bucketed_plan_has_no_edge_side_exchange(no_broadcast):
    spark = no_broadcast
    from nebula_importer_spark.operators.graph import pagerank

    import re

    e = _edges(spark)
    plan = _plan(pagerank(e, iterations=3, bucket_by_src=True))
    # the bucketed edge table is a checkpointed scan; the only exchanges
    # in the superstep joins are on the score/node side. An edge-side
    # JOIN exchange would show as single-column hashpartitioning(_s#..)
    # — the two-column hashpartitioning(_s#.., _d#..) from the distinct
    # in the node-set subtree is not an edge-side join exchange.
    edge_join_exchange = re.compile(r"Exchange hashpartitioning\(_s#\d+L, \d+\)")
    assert not edge_join_exchange.search(plan)
    # sanity: each superstep's receive-side aggregation still exchanges
    # by _d (the |V|-sized rank-mass shuffle — the one that SHOULD exist)
    assert plan.count("Exchange hashpartitioning(_d") >= 3
    # and the control WITHOUT bucketing does exchange edges per superstep
    ctl = _plan(pagerank(e, iterations=3, bucket_by_src=False))
    assert len(edge_join_exchange.findall(ctl)) >= 2


def test_pagerank_bucketed_values_identical(spark):
    from nebula_importer_spark.operators.graph import pagerank

    e = _edges(spark)
    a = sorted(map(tuple, pagerank(e, iterations=4).collect()))
    b = sorted(
        map(tuple, pagerank(e, iterations=4, bucket_by_src=True).collect())
    )
    assert a == b and len(a) > 0


def test_hits_bucketed_values_identical_and_plan(no_broadcast):
    spark = no_broadcast
    from nebula_importer_spark.operators.graph import hits

    e = _edges(spark)
    a = sorted(map(tuple, hits(e, iterations=2).collect()))
    b = sorted(map(tuple, hits(e, iterations=2, bucket_by_src=True).collect()))
    assert a == b and len(a) > 0
    # per-half-step plans are checkpoint-truncated; assert the LAST
    # half-step's join did not exchange the edge side
    from nebula_importer_spark.operators import graph as G

    e_s = G._bucket_edges_by(
        e.selectExpr("src as _s", "dst as _d"), "_s"
    )
    scores = spark.createDataFrame(
        [(i, 10**7) for i in range(50)], "node long, _v long"
    )
    j = (
        e_s.join(scores, e_s["_s"] == scores["node"])
        .groupBy("_d")
        .agg({"_v": "sum"})
    )
    assert "Exchange hashpartitioning(_s" not in _plan(j)


def test_trustrank_bucketed_values_identical(spark):
    from nebula_importer_spark.operators.graph import trustrank

    e = _edges(spark)
    seeds = spark.createDataFrame([(0,), (1,), (2,)], "node long")
    a = sorted(map(tuple, trustrank(e, seeds, iterations=3).collect()))
    b = sorted(
        map(
            tuple,
            trustrank(e, seeds, iterations=3, bucket_by_src=True).collect(),
        )
    )
    assert a == b and len(a) > 0


def test_bfs_bucketed_values_identical(spark):
    from nebula_importer_spark.operators.graph import bfs_distances

    e = _edges(spark)
    seeds = spark.createDataFrame([(0,)], "node long")
    a = sorted(map(tuple, bfs_distances(e, seeds, max_hops=3).collect()))
    b = sorted(
        map(
            tuple,
            bfs_distances(
                e, seeds, max_hops=3, bucket_by_src=True
            ).collect(),
        )
    )
    assert a == b and len(a) > 0
