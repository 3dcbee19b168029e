"""Pipeline: schema config → vertex/edge DataFrames → materialized tables.

The Spark re-expression of the reference's manager+importer data plane
(pkg/manager/manager.go:161-245, pkg/importer/importer.go:99-124): one scan
per source, fan-out to every tag/edge spec bound to it (G7 single-scan
multi-sink, reference pkg/config/v3/source.go:42-62), each spec compiled to a
filter + select of Column expressions (no per-row code), modes materialized
through the snapshot TableStore, rejects + per-file lineage metrics written
per run.

Library surface (entry point 3 analog, reference pkg/manager/manager.go:68-91):

    p = Pipeline(cfg, spark)
    p.vertices("Person")      # mapped vertex DF (vid, props...)
    p.edges("KNOWS")          # mapped edge DF (src, dst, rank, props...)
    result = p.run(out_dir)   # materialize everything + rejects + metrics
"""

from __future__ import annotations

import contextlib
import logging
import re
import time
from pathlib import Path

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from nebula_importer_spark.config.model import (
    EdgeSpec,
    GraphConfig,
    HookSpec,
    NodeSpec,
    SourceSpec,
)


class HookError(RuntimeError):
    """A before/after hook statement failed — the run is aborted (reference
    pkg/manager/manager.go:285-336 error semantics)."""


# NebulaGraph-server DDL statements that appear in reference example hooks
# (examples/*/`*.yaml`): space/tag/edge/index management has no Spark analog
# (namespaces are implicit in the TableStore), so these execute as no-ops.
_NGQL_DDL = re.compile(
    r"^\s*(CREATE\s+(SPACE|TAG|EDGE)\b|USE\s+|DROP\s+(SPACE|TAG|EDGE)\b"
    r"|REBUILD\s+|SUBMIT\s+JOB\b)",
    re.IGNORECASE,
)
from nebula_importer_spark.functions.filter_dsl import compile_filter
from nebula_importer_spark.functions.picker import compile_id, compile_prop, compile_rank
from nebula_importer_spark.plans.merge import TableStore
from nebula_importer_spark.plans.metrics import ElementStats, RunResult, StatsMeter

ARROW_BATCH_KEY = "spark.sql.execution.arrow.maxRecordsPerBatch"


@contextlib.contextmanager
def _arrow_batch_override(spark: SparkSession, batch: int | None):
    """Per-source Arrow batch override (S11, reference
    pkg/config/base/source.go:30-33: a source may override the manager
    batch). Scoped to the source's stages; restores the session value."""
    if batch is None:
        yield
        return
    try:
        old = spark.conf.get(ARROW_BATCH_KEY)
    except Exception:  # pragma: no cover — key unset
        old = None
    spark.conf.set(ARROW_BATCH_KEY, str(batch))
    try:
        yield
    finally:
        if old is None:
            spark.conf.unset(ARROW_BATCH_KEY)
        else:
            spark.conf.set(ARROW_BATCH_KEY, old)
from nebula_importer_spark.sources.reader import FILE_COL, SEQ_COL, read_source

VID = "vid"
SRC = "src"
DST = "dst"
RANK = "rank"


def map_node(df: DataFrame, spec: NodeSpec) -> DataFrame:
    """Tag mapping (G1): filter → id → ordered props. Lineage cols pass through."""
    cols = [c for c in df.columns if c not in (FILE_COL, SEQ_COL)]
    if spec.filter:
        df = df.filter(compile_filter(spec.filter, cols))
    exprs = [compile_id(spec.id, cols, VID)]
    exprs += [compile_prop(p, cols) for p in spec.props]
    exprs += [F.col(c) for c in (FILE_COL, SEQ_COL) if c in df.columns]
    return df.select(*exprs)


def map_edge(df: DataFrame, spec: EdgeSpec) -> DataFrame:
    """Edge mapping (G2/G3): filter → src,dst,rank → props."""
    cols = [c for c in df.columns if c not in (FILE_COL, SEQ_COL)]
    if spec.filter:
        df = df.filter(compile_filter(spec.filter, cols))
    exprs = [compile_id(spec.src, cols, SRC), compile_id(spec.dst, cols, DST)]
    if spec.rank_index is not None:
        exprs.append(compile_rank(spec.rank_index, cols))
    else:
        # Rank defaults to 0 and is always part of the edge key
        # (reference pkg/spec/v3/edge.go: src->dst[@rank]).
        exprs.append(F.lit(0).cast("long").alias(RANK))
    exprs += [compile_prop(p, cols) for p in spec.props]
    exprs += [F.col(c) for c in (FILE_COL, SEQ_COL) if c in df.columns]
    return df.select(*exprs)


class Pipeline:
    def __init__(
        self,
        config: GraphConfig,
        spark: SparkSession,
        staging_dir: str | None = None,
    ):
        config.validate()
        self.config = config
        self.spark = spark
        # CSV staging location (one parsed-parquet write per source; see
        # sources/reader.py) — pass a shared-filesystem path on a cluster.
        self.staging_dir = staging_dir
        self._scans: dict[int, tuple[DataFrame, DataFrame]] = {}

    # -- scans -------------------------------------------------------------
    def _scan(self, i: int, spec: SourceSpec) -> tuple[DataFrame, DataFrame]:
        if i not in self._scans:
            # read_source stages the parsed CSV scan once: a single pass
            # over the raw text feeds every tag/edge projection plus the
            # rejects split (G7). readerConcurrency caps its parallelism.
            self._scans[i] = read_source(
                self.spark,
                spec,
                self.staging_dir,
                reader_concurrency=self.config.reader_concurrency,
            )
        return self._scans[i]

    # -- library reads (no side effects) ------------------------------------
    def vertices(self, tag: str) -> DataFrame:
        """Union of every source's mapping for this tag; null vids excluded
        (they are rejects in run())."""
        parts = []
        for i, s in enumerate(self.config.sources):
            for t in s.tags:
                if t.name == tag:
                    good, _ = self._scan(i, s)
                    parts.append(map_node(good, t).filter(F.col(VID).isNotNull()))
        if not parts:
            raise KeyError(f"tag {tag!r} not in config")
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p, allowMissingColumns=True)
        return out.drop(FILE_COL, SEQ_COL)

    def edges(self, edge: str) -> DataFrame:
        parts = []
        for i, s in enumerate(self.config.sources):
            for e in s.edges:
                if e.name == edge:
                    good, _ = self._scan(i, s)
                    parts.append(
                        map_edge(good, e).filter(
                            F.col(SRC).isNotNull() & F.col(DST).isNotNull()
                        )
                    )
        if not parts:
            raise KeyError(f"edge {edge!r} not in config")
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p, allowMissingColumns=True)
        return out.drop(FILE_COL, SEQ_COL)

    def statements(
        self, name: str, batch: int | None = None, kind: str | None = None
    ) -> DataFrame:
        """Render the nGQL statements the reference would emit for this
        tag/edge — (statement, n_records) rows, batched at the manager (or
        per-source) batch size. Tag and edge names are independent
        namespaces in the reference; pass ``kind`` ("tag"/"edge") to
        disambiguate when a config uses one name for both. The literal
        statement plane of the sink; see plans/ngql.py for the format."""
        from nebula_importer_spark.plans.ngql import (
            render_edge_statements,
            render_node_statements,
        )

        parts = []
        for i, s in enumerate(self.config.sources):
            b = batch or s.batch or self.config.batch
            if kind in (None, "tag"):
                for t in s.tags:
                    if t.name == name:
                        good, _ = self._scan(i, s)
                        mapped = map_node(good, t).filter(F.col(VID).isNotNull())
                        parts.append(render_node_statements(mapped, t, batch=b))
            if kind in (None, "edge"):
                for e in s.edges:
                    if e.name == name:
                        good, _ = self._scan(i, s)
                        mapped = map_edge(good, e).filter(
                            F.col(SRC).isNotNull() & F.col(DST).isNotNull()
                        )
                        parts.append(render_edge_statements(mapped, e, batch=b))
        if not parts:
            raise KeyError(f"element {name!r} not in config")
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    # -- full run ------------------------------------------------------------
    def run(self, out_dir: str | Path, resume: bool = False) -> RunResult:
        """Materialize all tags+edges into <out_dir>/<space>; write rejects +
        per-file lineage metrics; resumable per (source, element) stage."""
        from nebula_importer_spark.logging_util import build_logger

        t0 = time.time()
        log = build_logger(self.config.log, self.spark)
        store = TableStore(
            Path(out_dir) / self.config.space,
            self.spark,
            write_partitions=self.config.importer_concurrency,
        )
        result = RunResult(space=self.config.space)
        rejects_dir = Path(out_dir) / self.config.space / "_rejects"
        mpath = Path(out_dir) / self.config.space / "_metrics"
        log.info(
            "import start: space=%s sources=%d out=%s",
            self.config.space,
            len(self.config.sources),
            out_dir,
        )

        for hook in self.config.before_hooks:  # W6 before-hooks
            self._run_hook(hook)

        # M2: periodic records/s + active-task meter (reference statsInterval)
        meter = StatsMeter(self.spark, interval_sec=self.config.stats_interval_sec)
        meter.start()
        try:
            for i, src in enumerate(self.config.sources):
                with _arrow_batch_override(self.spark, src.batch):
                    self._run_source(
                        i, src, store, result, rejects_dir, mpath, resume, meter
                    )
        finally:
            meter.stop()

        for hook in self.config.after_hooks:  # W6 after-hooks
            self._run_hook(hook)

        result.metrics_path = str(mpath)
        result.rejects_path = str(rejects_dir)
        result.duration_sec = time.time() - t0
        for es in result.elements:
            log.info(
                "element %s/%s: total=%d filtered=%d written=%d rejected=%d",
                es.kind,
                es.name,
                es.total,
                es.filtered,
                es.written,
                es.rejected,
            )
        failed = result.is_failed()
        log.log(
            logging.WARNING if failed else logging.INFO,
            "import %s: written=%d rejected=%d in %.1fs",
            "FAILED" if failed else "done",
            result.total_written,
            result.total_rejected,
            result.duration_sec,
        )
        return result

    def _run_source(
        self, i, src, store, result, rejects_dir, mpath, resume, meter
    ) -> None:
        good, csv_rejects = self._scan(i, src)
        # The rejects count rides the rejects write (observe — no standalone
        # .count() pass; at scale every extra count is a full scan of the
        # staged source). The write is a resumable stage of its own: a
        # resumed run must not append the same reject rows twice.
        rej_stage = f"s{i}/rejects"
        if not (resume and store.stage_completed(rej_stage)):
            rej_obs = Observation()
            csv_rejects.observe(
                rej_obs, F.count(F.lit(1)).alias("n")
            ).write.mode("append").parquet(str(rejects_dir / "csv"))
            n_rej = int(rej_obs.get["n"])
            result.csv_rejects += n_rej
            store.mark_stage(rej_stage, rejected=n_rej)
        else:
            result.csv_rejects += int(
                store.read_manifest()["stages"][rej_stage].get("rejected", 0)
            )

        for kind, specs in (("tag", src.tags), ("edge", src.edges)):
            for spec in specs:
                stage = f"s{i}/{kind}/{spec.name}/{spec.mode.value}"
                if resume and store.stage_completed(stage):
                    continue
                es = ElementStats(name=spec.name, kind=kind, source=src.path)
                # Both counters ride the merge-commit write action:
                # pre-filter source rows (g_obs, below the element filter)
                # and mapped/bad rows (m_obs) cost ZERO extra passes over
                # the data (M1 analog).
                g_obs = Observation()
                src_rows = good.observe(g_obs, F.count(F.lit(1)).alias("n_src"))
                if kind == "tag":
                    mapped = map_node(src_rows, spec)  # type: ignore[arg-type]
                    keys = [VID]
                    table = f"tags/{spec.name}"
                    null_key = F.col(VID).isNull()
                else:
                    mapped = map_edge(src_rows, spec)  # type: ignore[arg-type]
                    keys = [SRC, DST, RANK]
                    table = f"edges/{spec.name}"
                    null_key = F.col(SRC).isNull() | F.col(DST).isNull()
                m_obs = Observation()
                mapped = mapped.observe(
                    m_obs,
                    F.count(F.lit(1)).alias("n_mapped"),
                    F.sum(null_key.cast("long")).alias("n_bad"),
                )
                ok = mapped.filter(~null_key)
                _, unmatched = store.merge_commit(ok, table, spec.mode, keys)
                n_good = int(g_obs.get["n_src"])
                n_mapped = int(m_obs.get["n_mapped"])
                n_bad = int(m_obs.get["n_bad"] or 0)
                es.total = n_good
                es.filtered = n_good - n_mapped
                if n_bad:
                    bad = mapped.filter(null_key)
                    bad.select(
                        F.col(FILE_COL),
                        F.col(SEQ_COL),
                        F.lit("null_key").alias("reason"),
                        F.to_json(F.struct(*[c for c in bad.columns])).alias("raw"),
                    ).write.mode("append").parquet(str(rejects_dir / kind))
                n_ok = n_mapped - n_bad
                # Per-file lineage metrics (M3 analog) written as a
                # DataFrame — never .collect()ed: at 100 TB the file count
                # is 10^5-10^6 rows, which belongs on disk, not in a
                # driver-side Python list.
                ok.groupBy(FILE_COL).agg(F.count("*").alias("rows")).select(
                    F.lit(stage).alias("stage"),
                    F.col(FILE_COL).alias("file"),
                    "rows",
                ).write.mode("append").parquet(str(mpath))
                es.rejected = n_bad + unmatched
                es.written = n_ok - unmatched
                store.mark_stage(stage, written=es.written, rejected=es.rejected)
                result.elements.append(es)
                meter.add(es.written)

    def _run_hook(self, hook) -> None:
        """Pre/post hooks (W6). A failing statement ABORTS the run, matching
        the reference (pkg/manager/manager.go:285-336: exec error in a hook
        returns an ImportError and stops the import — a typo'd hook must not
        silently vanish). After a hook's statements succeed, its ``wait`` is
        slept (reference hooks.go:10-22 settle delay, e.g. waiting for
        schema agreement). Accepts a HookSpec or a bare SQL string."""
        if isinstance(hook, str):
            hook = HookSpec(statements=[hook])
        for sql in hook.statements:
            for stmt in filter(None, (s.strip() for s in sql.split(";"))):
                if _NGQL_DDL.match(stmt):
                    # Recognized NebulaGraph server DDL (CREATE SPACE/TAG/...,
                    # USE) from reference-shaped configs: the TableStore
                    # creates spaces/tables implicitly, so these are declared
                    # no-ops — NOT silently-swallowed failures.
                    continue
                try:
                    self.spark.sql(stmt)
                except Exception as e:  # noqa: BLE001 — re-raise typed
                    raise HookError(f"hook statement failed: {stmt!r}: {e}") from e
        if hook.wait_sec:
            time.sleep(hook.wait_sec)
