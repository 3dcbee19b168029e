"""Source scans: CSV (dialect-aware, permissive w/ rejection) / parquet / json.

Reference parity:
  S1-S7  file/object-store scans → spark.read over file:/ s3a:/ hdfs:/ gs:/
         URIs (Hadoop FS connectors replace the per-protocol Go sources,
         reference pkg/source/*.go). FTP/SFTP are intentionally out of scope
         (no Hadoop FS; reference pkg/source/ftp.go, sftp.go).
  S8     glob expansion is native to spark.read paths; a zero-match glob is
         an error (reference pkg/config/base/source.go:59-61) surfaced as
         SourceError.
  S9/F2/F3/F4  CSV dialect: delimiter / comment / header-skip / lazyQuotes;
         malformed rows are rejected-and-continue via PERMISSIVE mode +
         corrupt-record column (reference pkg/reader/csv.go:33-91).
  S10    byte accounting → Spark task metrics; we carry per-row lineage
         (_file, _seq) instead.
  S11    batching → Arrow maxRecordsPerBatch at pandas-UDF boundaries;
         write-side batching is the writer's job.

Every scan appends two lineage columns used by metrics/rejects (M3):
  _file: input_file_name()   _seq: monotonically_increasing_id()
``_seq`` also provides the deterministic last-write-wins order inside one
load (statement order analog, reference pkg/reader/batch.go).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.utils import AnalysisException
from pyspark.sql.window import Window

from nebula_importer_spark.config.model import SourceSpec

CORRUPT_COL = "_corrupt"
FILE_COL = "_file"
SEQ_COL = "_seq"
META_COLS = (FILE_COL, SEQ_COL)


class SourceError(RuntimeError):
    pass


def _csv_reader(spark: SparkSession, spec: SourceSpec):
    o = spec.csv
    r = (
        spark.read.format("csv")
        .option("sep", o.delimiter)
        .option("header", False)  # header handled below: skip, never interpret
        .option("inferSchema", False)
        .option("mode", "PERMISSIVE")
        .option("escape", '"')  # RFC4180 "" quoting (Go encoding/csv default)
    )
    if o.comment:
        r = r.option("comment", o.comment)
    if o.lazy_quotes:
        # Go lazyQuotes: bare quotes / embedded newlines tolerated. multiLine
        # sacrifices input-split parallelism per file — only enabled here.
        r = r.option("unescapedQuoteHandling", "STOP_AT_CLOSING_QUOTE").option(
            "multiLine", True
        )
    return r


def _read_csv(spark: SparkSession, spec: SourceSpec) -> DataFrame:
    # Pass 1: let Spark size the row width from the data (cheap: schema
    # inference with inferSchema=false reads only the first rows).
    try:
        probe = _csv_reader(spark, spec).load(spec.path)
    except AnalysisException as e:
        raise SourceError(f"source {spec.path!r}: no files matched ({e})") from e
    width = len(probe.columns)
    # Pass 2: explicit all-string schema + corrupt-record column so malformed
    # rows (wrong arity / broken quoting) become rejects instead of nulls.
    schema = T.StructType(
        [T.StructField(f"_c{i}", T.StringType(), True) for i in range(width)]
        + [T.StructField(CORRUPT_COL, T.StringType(), True)]
    )
    df = (
        _csv_reader(spark, spec)
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .schema(schema)
        .load(spec.path)
    )
    if spec.csv.with_header:
        # Skip — never interpret — the first line of each FILE
        # (reference pkg/reader/csv.go:66-76).
        w = F.row_number().over(
            Window.partitionBy(F.input_file_name()).orderBy(
                F.monotonically_increasing_id()
            )
        )
        df = df.withColumn("_rn", w).filter(F.col("_rn") > 1).drop("_rn")
    return df


def read_source(spark: SparkSession, spec: SourceSpec) -> tuple[DataFrame, DataFrame]:
    """Scan one source → (good_rows, rejects).

    good_rows: positional string columns ``_c0.._cN`` + lineage cols.
    rejects:   (_file, _seq, reason, raw) — the failed-row rejection stream
               (reference pkg/reader/csv.go:82-91 continue-error semantics).
    """
    if spec.format == "csv":
        df = _read_csv(spark, spec)
    elif spec.format in ("parquet", "json"):
        try:
            raw = spark.read.format(spec.format).load(spec.path)
        except AnalysisException as e:
            raise SourceError(f"source {spec.path!r}: no files matched ({e})") from e
        # Positional binding over typed files: column order IS the index space.
        df = raw.select(
            *[F.col(c).alias(f"_c{i}") for i, c in enumerate(raw.columns)]
        ).withColumn(CORRUPT_COL, F.lit(None).cast("string"))
    else:  # pragma: no cover — config validation rejects earlier
        raise SourceError(f"unsupported format {spec.format!r}")

    # Lineage columns MUST be computed before the cache boundary below:
    # input_file_name() evaluates to "" on top of an InMemoryRelation.
    df = df.withColumn(FILE_COL, F.input_file_name()).withColumn(
        SEQ_COL, F.monotonically_increasing_id()
    )
    if spec.format == "csv":
        # Spark refuses plans whose only referenced file column is the
        # corrupt-record column; the documented workaround is caching the
        # parsed scan (we also want the cache: every source fans out to
        # multiple tag/edge projections + a rejects split — G7). At 100 TB
        # the equivalent is a single-pass write of the parsed scan to a
        # staging table, then reading good/reject splits from it.
        df = df.cache()
    data_cols = [c for c in df.columns if c not in (CORRUPT_COL, FILE_COL, SEQ_COL)]
    good = df.filter(F.col(CORRUPT_COL).isNull()).select(*data_cols, FILE_COL, SEQ_COL)
    # Spark disallows queries whose only referenced file column is the corrupt
    # record column (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN);
    # referencing a data column in the projection lifts that without caching
    # the whole scan.
    rejects = df.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(FILE_COL),
        F.col(SEQ_COL),
        F.lit("csv_parse_error").alias("reason"),
        F.coalesce(F.col(CORRUPT_COL), *[F.col(c) for c in data_cols[:1]]).alias("raw"),
    )
    return good, rejects
