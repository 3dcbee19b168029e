"""Static-ish schema-alignment audit: for every registry entry with an
oracle, build the Spark plan (no execution beyond what plan construction
itself requires) and compare its column set against DuckDB's DESCRIBE of
the oracle SQL over the same parquet views.

This is the cheap half of the correctness gate — it catches exactly the
class of regression where a query or its oracle changes output schema
(aliases, added/dropped columns) without the other side moving, e.g. the
round-4 ``hybrid_search`` incident (``n_legs/rrf_scaled`` vs
``n_systems/rrf_micro``). Run it before the full value-hash sweep; it
finishes in a few minutes at sf0.001 where the sweep takes much longer.

Usage: python tools/check_schemas.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main() -> int:
    import duckdb

    import __spark_entry__ as entry
    from nebula_importer_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    spark = get_spark(
        "check-schemas", master="local[8]", shuffle_partitions=8
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM"
            f" read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, osql = entry.queries(), entry.oracle_sql()
    bad: list[tuple[str, str, str]] = []
    n = 0
    t0 = time.time()
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name not in osql:
            continue
        n += 1
        try:
            cols = sorted(fn(spark, sf_dir).columns)
        except Exception as ex:  # noqa: BLE001 — report, don't die
            bad.append((name, "spark-build", str(ex)[:200]))
            continue
        try:
            ocols = sorted(
                r[0] for r in con.execute("DESCRIBE " + osql[name]).fetchall()
            )
        except Exception as ex:  # noqa: BLE001
            bad.append((name, "duckdb-describe", str(ex)[:200]))
            continue
        if cols != ocols:
            bad.append((name, "schema", f"spark={cols} oracle={ocols}"))
    for name, kind, detail in bad:
        print(f"FAIL  {name} [{kind}]: {detail}")
    print(f"checked {n} queries in {time.time() - t0:.1f}s; failures: {len(bad)}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
