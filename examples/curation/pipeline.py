"""End-to-end training-data curation over the repo's operator surface.

One composed pipeline — the shape a pretraining-data team actually runs,
each stage a library operator that is individually oracle-gated in
``__spark_entry__``:

    read → normalize + annotate (lang-id, quality, token counts)
         → quality gate
         → exact dedup (sha2 on normalized text)
         → near-dup dedup (MinHash-LSH pairs → connected components
            → quality-aware survivor selection)
         → decontamination (n-gram overlap vs a held-out eval set)
         → per-domain token-budget sampling
         → fixed-budget sequence packing
         → parquet out + per-stage counts

Every stage is declarative DataFrame code: the whole pipeline is a
handful of Catalyst plans, the only Python-side loops are inside the
bounded-round components operator. Run it on any documents-shaped
parquet directory:

    PYTHONPATH=/root/repo python examples/curation/pipeline.py \
        /root/testdata/sf0.01 /tmp/curated
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nebula_importer_spark.operators.decontaminate import (
    contaminated_ids,
    ngram_overlap,
)
from nebula_importer_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    select_survivors,
)
from nebula_importer_spark.operators.connected_components import (
    connected_components,
)
from nebula_importer_spark.operators.packing import pack_documents
from nebula_importer_spark.operators.sampling import token_budget_sample
from nebula_importer_spark.operators.text import (
    lang_id,
    normalize_text,
    quality_score,
    token_count,
)


def curate(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str | None = None,
    *,
    min_quality: float = 0.35,
    near_dup_threshold: float = 0.7,
    decontam_ngram: int = 5,
    token_budget: int = 20_000,
    pack_budget: int = 512,
) -> dict:
    """Run the full curation pipeline; returns per-stage counts."""
    counts: dict[str, int] = {}

    docs = spark.read.parquet(str(Path(sf_dir) / "documents.parquet"))
    counts["input"] = docs.count()

    # -- annotate: normalized text + language + quality + token count ----
    ann = docs.select(
        "doc_id",
        "source",
        "text",
        normalize_text(F.col("text")).alias("norm"),
        lang_id(F.col("text")).alias("lang_pred"),
        quality_score("text").alias("quality"),
        token_count(F.col("text")).cast("long").alias("n_tokens"),
    )

    # -- quality gate -----------------------------------------------------
    kept = ann.filter(F.col("quality") >= min_quality)
    counts["after_quality"] = kept.count()

    # -- exact dedup on the NORMALIZED text (case/space-insensitive) ------
    exact_ids = exact_dedup(kept, id_col="doc_id", text_col="norm").select(
        "doc_id"
    )
    kept = kept.join(exact_ids, "doc_id")
    counts["after_exact_dedup"] = kept.count()

    # -- near-dup dedup: LSH pairs → components → best-quality survivor --
    pairs = minhash_lsh_pairs(
        kept, id_col="doc_id", text_col="norm",
        threshold=near_dup_threshold,
    )
    comps = connected_components(
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    ).select(
        F.col("node").alias("doc_id"), F.col("component").alias("canonical_id")
    )
    survivors = select_survivors(
        comps,
        kept.select("doc_id", F.col("quality").alias("score")),
    )
    drop = survivors.filter(
        F.col("doc_id") != F.col("survivor_id")
    ).select("doc_id")
    kept = kept.join(drop, "doc_id", "left_anti")
    counts["after_near_dedup"] = kept.count()

    # -- decontamination vs a deterministic held-out eval slice ----------
    eval_df = docs.filter(F.col("doc_id") % 499 == 0).select(
        F.col("doc_id").alias("eval_id"), "text"
    )
    contaminated = contaminated_ids(
        ngram_overlap(
            kept, eval_df, n=decontam_ngram,
            eval_id_col="eval_id", min_overlap=1,
        )
    )
    kept = kept.join(contaminated, "doc_id", "left_anti")
    counts["after_decontam"] = kept.count()

    # -- per-domain token budget -----------------------------------------
    sampled = token_budget_sample(
        kept, token_budget, domain_col="source",
        tokens_col="n_tokens",
    )
    counts["after_budget"] = sampled.count()

    # -- sequence packing -------------------------------------------------
    packed = pack_documents(
        sampled, budget=pack_budget, token_col="n_tokens", n_shards=16
    )
    counts["packs"] = packed.select("shard", "pack_id").distinct().count()
    counts["packed_docs"] = packed.count()

    if out_dir is not None:
        out = Path(out_dir)
        packed.write.mode("overwrite").parquet(str(out / "packed"))
        (
            sampled.groupBy("source")
            .agg(
                F.count("*").alias("docs"),
                F.sum("n_tokens").alias("tokens"),
            )
            .write.mode("overwrite")
            .parquet(str(out / "_metrics" / "by_source"))
        )
        (out / "_manifest.json").parent.mkdir(parents=True, exist_ok=True)
        (out / "_manifest.json").write_text(json.dumps(counts, indent=2))
    return counts


def main() -> None:
    from nebula_importer_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/curated"
    spark = get_spark("curation", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    counts = curate(spark, sf_dir, out_dir)
    print(json.dumps(counts))


if __name__ == "__main__":
    main()
