"""Two-parallelism scaling run (the sandbox stand-in for N vs 4N executors).

Runs the SAME transcript→triple job on the SAME input at local[N] and
local[4N] in separate subprocesses (fresh JVM each), reports turns/s at both
and the scaling efficiency  eff = throughput(4N) / (4 × throughput(N)).
Target (BASELINE.json): eff ≥ 0.8.

Usage: python tools/bench_scaling.py [n_small] [turns]
"""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

_CHILD = """
import json, sys, time
sys.path.insert(0, {repo!r})
from nebula_importer_spark.session import get_spark
from nebula_importer_spark.transcripts.generate import gen_transcripts_spark
from nebula_importer_spark.transcripts.pipeline import TranscriptPipeline

cores = int(sys.argv[1]); turns = int(sys.argv[2])
spark = get_spark("scaling", master=f"local[{{cores}}]", shuffle_partitions=cores)
spark.sparkContext.setLogLevel("ERROR")
transcripts = gen_transcripts_spark(spark, n_turns=turns, n_convs=max(turns // 100, 10))
transcripts = transcripts.localCheckpoint(eager=True)  # materialize input OUTSIDE the timed region
pipe = TranscriptPipeline(spark, salt_buckets=max(cores * 2, 32))
# Warm the Python worker pool (one tiny mapInPandas wave): workers are
# long-lived on a real cluster; cold-starting {{cores}} pandas interpreters
# at once costs ~0.5s/core and would measure import time, not throughput.
pipe.triples_surface(transcripts.limit(cores * 10).repartition(cores)).count()
t0 = time.time()
n = pipe.triples_surface(transcripts).count()
dt = time.time() - t0
print(json.dumps({{"cores": cores, "turns": turns, "sec": round(dt, 3),
                   "turns_per_sec": round(turns / dt, 1), "triples": n}}))
"""


def run(cores: int, turns: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", _CHILD.format(repo=str(REPO)), str(cores), str(turns)],
        capture_output=True,
        text=True,
        timeout=1800,
        check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    n_small = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    # sized so the local[N] run takes ~30s+: short jobs measure scheduler +
    # Python-worker startup overhead, not throughput scaling
    turns = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000
    small = run(n_small, turns)
    big = run(n_small * 4, turns)
    eff = big["turns_per_sec"] / (4 * small["turns_per_sec"])
    print(
        json.dumps(
            {
                "metric": "scaling_efficiency",
                "value": round(eff, 3),
                "unit": "ratio",
                "small": small,
                "big": big,
                "target": 0.8,
                "pass": eff >= 0.8,
            }
        )
    )


if __name__ == "__main__":
    main()
