"""Local replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry at a given SF dir on Spark,
runs the matching ``oracle_sql()`` on DuckDB over the same parquet files, and
compares row count + schema (column names) + an order-insensitive value hash
(columns sorted by name, rows sorted, canonical string rendering).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _canon(v) -> str:
    import datetime
    import math

    import numpy as np

    if v is None:
        return "NULL"
    if isinstance(v, np.generic):
        # pandas fetch path yields numpy scalars; unwrap to the Python value
        # so int64 renders "4" and float64 renders "4.0" exactly as the
        # driver's pandas canonicalizer sees them.
        v = v.item()
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 9))
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    return str(v)


def value_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rendered = sorted(
        "|".join(_canon(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for line in rendered:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> int:
    import duckdb

    import __spark_entry__ as entrymod
    from nebula_importer_spark.session import get_spark

    import os

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    # NIS_CHECK_SHUFFLE=200 reproduces the driver's default conf (the round-2
    # sessionize red row did not reproduce under the checker's 16 partitions).
    spark = get_spark(
        "oracle-check",
        shuffle_partitions=int(os.environ.get("NIS_CHECK_SHUFFLE", "16")),
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, osql = entrymod.queries(), entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            cols = df.columns
            # Fetch through pandas (Arrow) — the driver canonicalizes via
            # pandas, and value rendering must match that path, not
            # Row.collect() (round-3 lesson: HUGEINT->float64 divergences are
            # invisible to a fetchall()-based replica).
            pdf = df.toPandas()
            rows = [tuple(r) for r in pdf.itertuples(index=False, name=None)]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error {type(e).__name__}: {str(e)[:200]}")
            failures += 1
            continue
        dt = time.time() - t0
        if name not in osql:
            print(f"rows  {name}: {len(rows)} rows ({dt:.1f}s) [no oracle: rows-only]")
            if len(rows) == 0 and name != "expected_empty":
                print(f"      WARNING {name}: zero rows")
            continue
        try:
            orel = con.sql(osql[name])
            ocols = list(orel.columns)
            otypes = [str(t).upper() for t in orel.types]
            odf = orel.df()
            orows = [tuple(r) for r in odf.itertuples(index=False, name=None)]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error {str(e)[:200]}")
            failures += 1
            continue
        problems = []
        # Hard audit: a HUGEINT (or >BIGINT decimal) projection converts to
        # float64 under pandas and silently hash-diverges from Spark longs.
        # Every oracle must cast such columns explicitly (round-3 red row).
        for c, t in zip(ocols, otypes):
            flagged = "HUGEINT" in t
            m = re.match(r"DECIMAL\((\d+)", t)
            if m and int(m.group(1)) > 18:
                flagged = True  # wider than int64 → pandas object/float64
            if flagged:
                problems.append(f"oracle type audit: column {c} is {t} "
                                "(cast to BIGINT/DECIMAL(18,*) in the "
                                "oracle SQL — pandas converts wider types "
                                "to float64/object and hash-diverges)")
        if sorted(cols) != sorted(ocols):
            problems.append(f"schema {sorted(cols)} vs {sorted(ocols)}")
        if len(rows) != len(orows):
            problems.append(f"rowcount {len(rows)} vs {len(orows)}")
        if not problems:
            hs, ho = value_hash(cols, rows), value_hash(ocols, orows)
            if hs != ho:
                problems.append(f"valuehash {hs} vs {ho}")
                # show a sample diff
                s_set = {tuple(_canon(v) for v in r) for r in rows}
                o_set = {tuple(_canon(v) for v in r) for r in orows}
                for x in list(s_set - o_set)[:2]:
                    problems.append(f"  spark-only: {x}")
                for x in list(o_set - s_set)[:2]:
                    problems.append(f"  oracle-only: {x}")
        if problems:
            failures += 1
            print(f"FAIL  {name} ({dt:.1f}s): " + "; ".join(problems[:1]))
            for p in problems[1:]:
                print("      " + p)
        else:
            print(f"OK    {name}: {len(rows)} rows ({dt:.1f}s)")
    print("failures:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
