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
