"""Run metrics, lineage, and failure accounting (M1-M4).

The reference keeps mutex-guarded running counters and logs failed records
with full payload+context (pkg/stats/concurrency_stats.go:9-74,
pkg/manager/manager.go:374-440, pkg/errors/import.go:108-122). Spark-side,
counters come from DataFrame actions over the (cached) scan, lineage from
``input_file_name()`` aggregates, and failed rows land in a rejects table —
the north rule's "failed-row rejection files".

Exit semantics (M4, reference pkg/stats/stats.go:26-28): the run is failed if
any record was rejected or any element write failed.
"""

from __future__ import annotations

import json
import threading
import time
from dataclasses import asdict, dataclass, field
from pathlib import Path


@dataclass
class ElementStats:
    """Per tag/edge element counters (mirrors the reference's per-element
    failed/total processed, pkg/stats/stats.go:11-23)."""

    name: str
    kind: str  # "tag" | "edge"
    source: str
    total: int = 0  # rows seen by this element (post CSV parse)
    filtered: int = 0  # rows silently skipped by the row filter (F1)
    rejected: int = 0  # null key / unmatched UPDATE → rejects table
    written: int = 0  # rows that reached the table


@dataclass
class RunResult:
    space: str
    elements: list[ElementStats] = field(default_factory=list)
    csv_rejects: int = 0
    duration_sec: float = 0.0
    rejects_path: str | None = None
    metrics_path: str | None = None

    @property
    def total_written(self) -> int:
        return sum(e.written for e in self.elements)

    @property
    def total_rejected(self) -> int:
        return self.csv_rejects + sum(e.rejected for e in self.elements)

    def is_failed(self) -> bool:
        """M4: nonzero exit if anything was rejected."""
        return self.total_rejected > 0

    def records_per_sec(self) -> float:
        return self.total_written / self.duration_sec if self.duration_sec else 0.0

    def to_json(self) -> str:
        d = asdict(self)
        d["total_written"] = self.total_written
        d["total_rejected"] = self.total_rejected
        d["records_per_sec"] = self.records_per_sec()
        d["failed"] = self.is_failed()
        return json.dumps(d, indent=2)

    def save(self, path: str | Path) -> None:
        Path(path).write_text(self.to_json())


class StatsMeter:
    """Periodic progress meter (M2): emits a records/s + active-task line
    every ``interval_sec`` while a run is in flight — the Spark analog of
    the reference's 10 s ticker (pkg/stats/stats.go:67-78, statsInterval in
    manager config). Completed-element counts come from ``add()``; live
    executor activity from ``SparkContext.statusTracker()`` (no listener
    plumbing through Py4J needed).

    Usage::

        meter = StatsMeter(spark, interval_sec=10)
        with meter:            # or meter.start() / meter.stop()
            ... run stages, meter.add(n) as counts land ...
    """

    def __init__(self, spark=None, interval_sec: float = 10.0, sink=None):
        import sys

        self.spark = spark
        self.interval_sec = interval_sec
        # stderr by default: stdout carries the run's JSON result contract
        self.sink = sink or (
            lambda line: print(line, file=sys.stderr, flush=True)
        )
        self._records = 0
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        self._t0 = 0.0
        self.ticks = 0

    def add(self, n: int) -> None:
        with self._lock:
            self._records += n

    def _line(self) -> str:
        elapsed = max(time.time() - self._t0, 1e-9)
        with self._lock:
            rec = self._records
        active = ""
        if self.spark is not None:
            try:
                st = self.spark.sparkContext.statusTracker()
                stages = st.getActiveStageIds()
                n_tasks = sum(
                    (st.getStageInfo(s).numActiveTasks if st.getStageInfo(s) else 0)
                    for s in stages
                )
                active = f" activeStages={len(stages)} activeTasks={n_tasks}"
            except Exception:  # pragma: no cover — tracker gone at shutdown
                pass
        return (
            f"[stats] elapsed={elapsed:.1f}s records={rec} "
            f"records/s={rec / elapsed:.1f}{active}"
        )

    def _loop(self) -> None:
        while not self._stop.wait(self.interval_sec):
            self.ticks += 1
            self.sink(self._line())

    def start(self) -> "StatsMeter":
        self._t0 = time.time()
        self._stop.clear()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=2.0)
            self._thread = None
        self.sink(self._line() + " (final)")

    def __enter__(self) -> "StatsMeter":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.stop()
