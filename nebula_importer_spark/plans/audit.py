"""Physical-plan shape audit: the ``.explain`` discipline as a
checkable artifact.

Every operator in this repo was built against plan-shape expectations
(filters pushed to the scan, small sides broadcast, one exchange where
one suffices, no Python in the hot path). The test suite asserts those
shapes with ad-hoc string probes; this module is the same probe as a
reusable REPORT, so a pipeline can gate itself ("this nightly job grew
a second shuffle — fail before it runs for six hours") and a human can
read WHAT the plan does without parsing explain() output.

Driver-side only: reads the executed-plan string of an un-collected
DataFrame — no job runs, no data moves. The counters are substring
counts over Spark's stable physical-operator names; they are a smoke
instrument, not a parser (stated) — a rename in a future Spark major
would surface as an obviously-wrong zero, not a silent misread.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

#: (report field, physical-plan marker) pairs counted by plan_audit.
_MARKERS = [
    ("exchanges", "Exchange "),
    ("broadcasts", "BroadcastExchange"),
    ("sort_merge_joins", "SortMergeJoin"),
    ("broadcast_hash_joins", "BroadcastHashJoin"),
    ("nested_loop_joins", "BroadcastNestedLoopJoin"),
    ("global_sorts", "rangepartitioning("),
    ("python_evals", "BatchEvalPython"),
    ("arrow_evals", "ArrowEvalPython"),
    ("map_in_pandas", "MapInPandas"),
    ("scans", "FileScan"),
]


@dataclass
class PlanReport:
    """Counters + raw text; ``ok(...)`` gates on ceilings."""

    exchanges: int = 0
    broadcasts: int = 0
    sort_merge_joins: int = 0
    broadcast_hash_joins: int = 0
    nested_loop_joins: int = 0
    global_sorts: int = 0
    python_evals: int = 0
    arrow_evals: int = 0
    map_in_pandas: int = 0
    scans: int = 0
    codegen_spans: int = 0
    pushed_filters: list[str] = field(default_factory=list)
    plan_text: str = ""

    @property
    def shuffle_exchanges(self) -> int:
        """Exchanges that move data between executors (broadcasts are
        replication, not repartitioning — the cheap kind)."""
        return self.exchanges - self.broadcasts

    def ok(
        self,
        *,
        max_shuffles: int | None = None,
        forbid_python: bool = False,
        forbid_global_sort: bool = False,
        forbid_nested_loop: bool = False,
    ) -> tuple[bool, list[str]]:
        """Gate the plan: (passed, violations). Each violation names
        the ceiling and the observed count — ready for a log line or an
        assert message."""
        bad: list[str] = []
        if max_shuffles is not None and self.shuffle_exchanges > max_shuffles:
            bad.append(
                f"shuffle_exchanges={self.shuffle_exchanges} > "
                f"max_shuffles={max_shuffles}"
            )
        if forbid_python and (self.python_evals or self.arrow_evals):
            bad.append(
                f"python in plan: BatchEvalPython={self.python_evals}, "
                f"ArrowEvalPython={self.arrow_evals}"
            )
        if forbid_global_sort and self.global_sorts:
            bad.append(f"global_sorts={self.global_sorts}")
        if forbid_nested_loop and self.nested_loop_joins:
            bad.append(f"nested_loop_joins={self.nested_loop_joins}")
        return (not bad, bad)


def plan_audit(df: DataFrame) -> PlanReport:
    """Audit a DataFrame's EXECUTED physical plan (post-AQE initial
    plan; no action is triggered). See module docstring for scope."""
    text = df._jdf.queryExecution().executedPlan().toString()
    rep = PlanReport(plan_text=text)
    for attr, marker in _MARKERS:
        setattr(rep, attr, text.count(marker))
    # AQE initial plans (isFinalPlan=false) carry no *(n) codegen
    # annotations — the span count is only meaningful on final or
    # non-adaptive plans (0 otherwise, stated).
    rep.codegen_spans = len(set(re.findall(r"\*\((\d+)\)", text)))
    rep.pushed_filters = [
        m.strip()
        for m in re.findall(r"PushedFilters: \[([^\]]*)\]", text)
        if m.strip()
    ]
    return rep
