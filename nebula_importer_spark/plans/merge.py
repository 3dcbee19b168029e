"""Versioned parquet table store with merge semantics + snapshot manifest.

Plays the role of the reference's NebulaGraph sink (W1-W7): INSERT statements
become key-deduplicated upserts, UPDATE becomes matched-only merge, DELETE
becomes anti-join removal (reference statement builders
pkg/spec/v3/node.go:149-262, edge.go:195-363; mode enum pkg/spec/base/mode.go).

Storage layout (Iceberg-shaped, dependency-free — the real deployment swaps
this for an Iceberg catalog; the snapshot/manifest discipline is identical):

    <root>/<table>/v=<N>/*.parquet      immutable snapshot N
    <root>/_manifest.json               current version per table + stage log

Snapshots make every run resumable (checkpoint analog of the north rule):
a crashed run re-reads the manifest and continues from the last committed
version; stages record completion so re-runs skip finished work.

Scale notes: each commit writes a full new snapshot of the table in this
dependency-free implementation — on Iceberg the same logic is MERGE INTO with
file-level pruning. Merge joins shuffle on the key columns only; incoming
batches are deduplicated map-side first (last-write-wins by _seq, the
statement-order analog).
"""

from __future__ import annotations

import json
import os
import time
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from nebula_importer_spark.config.model import Mode
from nebula_importer_spark.sources.reader import SEQ_COL

MANIFEST = "_manifest.json"


class TableStore:
    def __init__(self, root: str | Path, spark: SparkSession):
        self.root = Path(root)
        self.spark = spark
        self.root.mkdir(parents=True, exist_ok=True)

    # -- manifest ---------------------------------------------------------
    def _manifest_path(self) -> Path:
        return self.root / MANIFEST

    def read_manifest(self) -> dict:
        p = self._manifest_path()
        if p.exists():
            return json.loads(p.read_text())
        return {"tables": {}, "stages": {}}

    def _write_manifest(self, m: dict) -> None:
        tmp = self._manifest_path().with_suffix(".tmp")
        tmp.write_text(json.dumps(m, indent=2, sort_keys=True))
        os.replace(tmp, self._manifest_path())  # atomic snapshot commit

    def current_version(self, table: str) -> int | None:
        t = self.read_manifest()["tables"].get(table)
        return None if t is None else t["version"]

    def stage_completed(self, stage: str) -> bool:
        return bool(self.read_manifest()["stages"].get(stage, {}).get("completed"))

    def mark_stage(self, stage: str, **info) -> None:
        m = self.read_manifest()
        m["stages"][stage] = {"completed": True, "at": time.time(), **info}
        self._write_manifest(m)

    # -- reads ------------------------------------------------------------
    def read(self, table: str, version: int | None = None) -> DataFrame | None:
        """Read a table at its current (or any historical) snapshot version —
        snapshots are immutable, so time travel is just a different path."""
        v = self.current_version(table) if version is None else version
        if v is None:
            return None
        path = self.root / table / f"v={v}"
        if version is not None and not path.exists():
            raise FileNotFoundError(f"{table} has no snapshot v={version}")
        return self.spark.read.parquet(str(path))

    def versions(self, table: str) -> list[int]:
        base = self.root / table
        if not base.exists():
            return []
        return sorted(int(p.name.split("=")[1]) for p in base.glob("v=*"))

    # -- merge + commit ----------------------------------------------------
    def _dedup_incoming(self, df: DataFrame, key_cols: list[str]) -> DataFrame:
        """Last-write-wins inside one load, by _seq when present (statement
        order analog — later INSERT overwrites earlier within a batch)."""
        order = F.col(SEQ_COL).desc() if SEQ_COL in df.columns else F.lit(1).asc()
        w = Window.partitionBy(*key_cols).orderBy(order)
        return (
            df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn", *([SEQ_COL] if SEQ_COL in df.columns else []))
        )

    def apply(
        self, df: DataFrame, table: str, mode: Mode, key_cols: list[str]
    ) -> tuple[DataFrame, int]:
        """Return (new_table_state, unmatched_update_count).

        INSERT: upsert — incoming replaces existing rows on key
                (Nebula INSERT overwrites existing element props).
        UPDATE: matched keys get new prop values; rows addressing missing
                keys are dropped and counted (the reference's UPDATE on a
                missing element errors → rejected record).
        DELETE: rows with matching keys removed.
        """
        current = self.read(table)
        incoming = self._dedup_incoming(df, key_cols)
        drop_meta = [c for c in incoming.columns if c.startswith("_")]
        incoming = incoming.drop(*drop_meta)
        unmatched = 0
        if mode == Mode.INSERT:
            if current is None:
                return incoming, 0
            kept = current.join(incoming.select(*key_cols), on=key_cols, how="left_anti")
            return kept.unionByName(incoming), 0
        if current is None:
            # UPDATE/DELETE against an empty table: everything is unmatched.
            if mode == Mode.UPDATE:
                return self.spark.createDataFrame([], incoming.schema), incoming.count()
            # DELETE: no table state to change, but still run ONE action over
            # the incoming frame so caller-attached observe() metrics fire.
            incoming.count()
            return None, 0  # type: ignore[return-value]
        keys = incoming.select(*key_cols)
        if mode == Mode.UPDATE:
            unmatched = incoming.join(current.select(*key_cols), key_cols, "left_anti").count()
            matched_new = incoming.join(current.select(*key_cols), key_cols, "left_semi")
            kept = current.join(keys, key_cols, "left_anti")
            return kept.unionByName(matched_new), unmatched
        if mode == Mode.DELETE:
            return current.join(keys, key_cols, "left_anti"), 0
        raise ValueError(f"unsupported mode {mode}")

    def commit(self, df: DataFrame, table: str) -> int:
        """Write a new immutable snapshot and advance the manifest pointer."""
        m = self.read_manifest()
        prev = m["tables"].get(table, {}).get("version", 0)
        v = prev + 1
        out = self.root / table / f"v={v}"
        df.write.mode("overwrite").parquet(str(out))
        m["tables"][table] = {"version": v}
        m["tables"][table].setdefault("history", [])
        self._write_manifest(m)
        return v

    def merge_commit(
        self, df: DataFrame, table: str, mode: Mode, key_cols: list[str]
    ) -> tuple[int, int]:
        state, unmatched = self.apply(df, table, mode, key_cols)
        if state is None:
            return self.current_version(table) or 0, unmatched
        return self.commit(state, table), unmatched
