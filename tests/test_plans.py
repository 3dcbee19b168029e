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


def test_corpus_filter_is_map_only(spark):
    """The cleaning cascade must stay a zero-shuffle scan (its whole point
    at 100 TB)."""
    plan = _plan(entrymod.queries()["corpus_filter"](spark, SF))
    assert ") Exchange" not in plan, plan
    assert "Join" not in plan


def test_text_dup_tokens_is_map_only(spark):
    plan = _plan(entrymod.queries()["text_dup_tokens"](spark, SF))
    assert ") Exchange" not in plan, plan


def test_decontaminate_broadcasts_eval_side(spark):
    """The corpus side must never shuffle: eval grams broadcast, the only
    Exchange is the per-pair count aggregation (∝ contaminated pairs)."""
    plan = _plan(entrymod.queries()["decontaminate"](spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan.replace("SortMergeJoin(skew=", "")
    assert plan.count(") Exchange") == 1, plan


def test_bm25_single_one_row_exchange(spark):
    """BM25 = map pass + ONE 1-row stats aggregate broadcast back — no
    explode, no data shuffle, no sort-merge join."""
    plan = _plan(entrymod.queries()["search_bm25"](spark, SF))
    assert "Generate" not in plan  # no explode anywhere
    assert "SortMergeJoin" not in plan
    assert plan.count(") Exchange") == 1, plan


def test_token_budget_offsets_broadcast_back(spark):
    """The two-level prefix sum joins its (tiny) bucket-offset table back as
    a broadcast — the data side is shuffled only by the window's
    (domain, bucket) partitioning, never sort-merge-joined."""
    plan = _plan(entrymod.queries()["sample_token_budget"](spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan.replace("SortMergeJoin(skew=", "")


def test_frame_sampling_is_map_only(spark):
    """Frame sampling = sequence/explode over duration metadata: one
    Generate, zero exchanges (a 100-TB video catalog samples in one scan)."""
    plan = _plan(entrymod.queries()["multimodal_doc_frames"](spark, SF))
    assert ") Exchange" not in plan, plan
    assert "Generate" in plan


def test_triangles_all_equi_joins(spark):
    """Degree-ordered triangle counting must stay in hash/sort equi-joins:
    no BroadcastNestedLoopJoin / CartesianProduct anywhere (the naive
    all-pairs formulation would smuggle one in)."""
    plan = _plan(entrymod.queries()["graph_triangles"](spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_pagerank_all_equi_joins(spark):
    """Every PageRank superstep is an equi-join + partial-agg'd groupBy —
    no nested-loop joins, no cartesian products, nothing collected."""
    plan = _plan(entrymod.queries()["graph_pagerank"](spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
