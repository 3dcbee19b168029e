"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Headline set = the engine surface that matters at scale: config-driven
vertex/edge mapping (the reference's core), join+agg+window relational
queries, LSH dedup, similarity search, and the transcript→triple KG pipeline
throughput (north star; measured in turns/s over a Spark-generated corpus).

Scaling-efficiency evidence (N vs 4N cores on the same input) lives in
tools/bench_scaling.py → reported in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

HEADLINE = [
    "vertex_customer",
    "edge_orders",
    "pricing_summary",
    "revenue_topk",
    "window_top_order",
    "events_hourly",
    "asof_click_error",
    "sessionize_users",
    "text_fingerprint",
    "dedup_minhash_lsh",
    "ann_cosine_topk",
    "kg_triples",
]

# Second group: the round-4 operator surface (the 12-query headline
# predates ~200 of the 260 registry entries) — iterative graph BSP, the
# NB classifier's end-to-end grade, BPE train→encode, exact AUC rank
# statistics, and exact dedup. Timed identically (best-of-N) and
# reported separately so regressions here are visible without moving the
# headline_total baseline series.
EXTENDED = [
    "graph_pagerank",
    "nb_confusion_langs",
    "bpe_token_counts",
    "auc_doc_length",
    "dedup_exact",
]

KG_BENCH_TURNS = int(os.environ.get("SPARK_GRAFT_KG_TURNS", "1000000"))
# Best-of-N: co-tenant noise dominated two rounds of single-shot driver
# numbers (BASELINE.md records same-binary spreads of 14.6-34.7s); the
# minimum over a few repetitions is the standard noise-robust estimator
# for a deterministic workload.
BENCH_REPS = int(os.environ.get("SPARK_GRAFT_REPS", "3"))


def main() -> None:
    import __spark_entry__ as entrymod
    from nebula_importer_spark.session import get_spark
    from nebula_importer_spark.transcripts.generate import gen_transcripts_spark
    from nebula_importer_spark.transcripts.pipeline import TranscriptPipeline

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("bench", master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    qs = entrymod.queries()
    times: dict[str, float] = {}
    # warm the JVM/codegen path AND the Python worker pool once (excluded
    # from timings — workers are long-lived on a real cluster; cold-starting
    # `cpus` pandas interpreters measures import time, not throughput)
    qs["pricing_summary"](spark, sf_dir).collect()
    gen_transcripts_spark(spark, n_turns=cpus * 100, n_convs=10).repartition(
        cpus
    ).mapInPandas(lambda it: it, "conv_id string, turn_idx int, role string,"
                  " text string, tool string, ts timestamp").count()

    def _time(name: str, into: dict[str, float]) -> None:
        best = float("inf")
        for _ in range(BENCH_REPS):
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            n = df.count()
            best = min(best, time.time() - t0)
            assert n >= 0
        into[name] = round(best, 3)

    for name in HEADLINE:
        if name == "kg_triples":
            continue
        _time(name, times)

    extended: dict[str, float] = {}
    for name in EXTENDED:
        _time(name, extended)

    # KG pipeline throughput: Spark-generated corpus, extraction+linking only
    # (the per-turn hot path), measured in turns/s.
    kg_sec = float("inf")
    for _ in range(BENCH_REPS):
        t0 = time.time()
        transcripts = gen_transcripts_spark(
            spark, n_turns=KG_BENCH_TURNS, n_convs=2000
        )
        pipe = TranscriptPipeline(spark)
        surface = pipe.triples_surface(transcripts)
        n_triples = surface.count()
        kg_sec = min(kg_sec, time.time() - t0)
        assert n_triples > 0
    times["kg_triples"] = round(kg_sec, 3)

    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_total",
                "value": total,
                "unit": "sec",
                "queries": times,
                "extended": extended,
                "extended_total": round(sum(extended.values()), 3),
                "sf": sf_dir,
                "cpus": cpus,
                "reps": BENCH_REPS,
                "kg_turns": KG_BENCH_TURNS,
                "kg_turns_per_sec": round(KG_BENCH_TURNS / kg_sec, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
