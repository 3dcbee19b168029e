"""spark-submit entry point (spark-submit cannot run ``-m`` modules).

Cluster usage:

    python -m zipfile -c nebula_importer_spark.zip nebula_importer_spark
    spark-submit --py-files nebula_importer_spark.zip \
        tools/submit.py kg --turns 1000000000 -o s3a://bucket/kg [--resume]

Forwards argv to the same CLI as ``python -m nebula_importer_spark``; the
SparkSession comes from spark-submit's conf (master/memory/executors), which
``get_spark`` respects because builder.config never overrides an existing
master setting supplied by spark-submit.
"""

from __future__ import annotations

import sys

from nebula_importer_spark.__main__ import main

if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
