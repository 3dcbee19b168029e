"""Physical-plan shape guards: the properties that keep these queries fast
at 100 TB must survive refactors — filter pushdown into the parquet scan,
column pruning, and broadcast joins for dimension tables."""

from __future__ import annotations

import contextlib
import io
from pathlib import Path

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_filter_dsl_pushes_to_parquet_scan(spark):
    plan = _plan(entrymod.queries()["edge_orders"](spark, SF))
    assert "PushedFilters" in plan
    assert "EqualTo(o_orderstatus,O)" in plan
    # column pruning: o_orderdate is not referenced → must not be read
    assert "o_orderdate" not in plan


def test_projection_prunes_scan_columns(spark):
    plan = _plan(entrymod.queries()["text_stats"](spark, SF))
    # only doc_id + text needed; lang/source/n_chars pruned from the scan
    read = [line for line in plan.splitlines() if "ReadSchema" in line]
    assert read and "lang" not in read[0] and "source" not in read[0]


def test_dimension_joins_broadcast(spark):
    plan = _plan(entrymod.queries()["revenue_topk"](spark, SF))
    assert "BroadcastHashJoin" in plan
    plan5 = _plan(entrymod.queries()["region_revenue"](spark, SF))
    # every dimension join in the 6-table query is a broadcast, never SMJ
    assert plan5.count("BroadcastHashJoin") >= 3
    assert "SortMergeJoin" not in plan5.replace("SortMergeJoin(skew=", "")


def test_shipdate_filter_pushes_down(spark):
    plan = _plan(entrymod.queries()["pricing_summary"](spark, SF))
    assert "PushedFilters" in plan and "LessThanOrEqual(l_shipdate" in plan


def test_asof_join_single_exchange_no_join(spark):
    """The as-of join must stay a union+window plan: ONE hash exchange on the
    key and NO join operator of any kind (a range/theta join here would
    explode at scale)."""
    plan = _plan(entrymod.queries()["asof_click_error"](spark, SF))
    assert "Join" not in plan
    assert "CartesianProduct" not in plan
    # formatted explain mentions each node twice (tree + details)
    assert plan.count(") Exchange") == 1, plan


def test_range_join_is_equi_join(spark):
    """The bounded range join must compile to a hash equi-join on
    (key, bucket) — never BroadcastNestedLoopJoin / CartesianProduct."""
    plan = _plan(entrymod.queries()["range_event_pairs"](spark, SF))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert ("BroadcastHashJoin" in plan) or ("SortMergeJoin" in plan) or (
        "ShuffledHashJoin" in plan
    )


def test_sessionize_shares_one_exchange(spark):
    """Window (lag + running sum) and the session groupBy partition on the
    same key: Catalyst must plan exactly one shuffle."""
    plan = _plan(entrymod.queries()["sessionize_users"](spark, SF))
    assert plan.count(") Exchange") == 1, plan


def test_window_frames_share_one_exchange(spark):
    """Running total + bounded moving sum partition and sort identically:
    one exchange, one sort, both frames computed in a single Window node."""
    plan = _plan(entrymod.queries()["orders_moving_sum"](spark, SF))
    assert plan.count(") Exchange") == 1, plan
    assert plan.count(") Sort") == 1, plan


def test_pivot_is_single_aggregate_no_join(spark):
    """An explicit-value pivot must compile to conditional aggregation —
    one shuffle on the group key, no join, no extra distinct-values job."""
    plan = _plan(entrymod.queries()["events_pivot"](spark, SF))
    assert "Join" not in plan
    assert plan.count(") Exchange") == 1, plan


def test_chunking_and_redaction_are_map_only(spark):
    """Corpus-prep passes (chunking, PII redaction) must be pure map
    pipelines: tokenize/slice/explode and regexp chains add ZERO exchanges."""
    for q in ("chunk_documents", "text_redact_pii"):
        plan = _plan(entrymod.queries()[q](spark, SF))
        assert ") Exchange" not in plan, (q, plan)
