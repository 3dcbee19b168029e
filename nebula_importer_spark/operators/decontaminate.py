"""Eval-set decontamination: n-gram overlap between a training corpus and a
benchmark/eval set (training-data pipeline surface).

The standard contamination check (GPT-3 §C / Llama / FineWeb): a training
document is contaminated if it shares ≥ ``min_overlap`` distinct word
n-grams with any eval document. Output is the (corpus doc, eval doc,
overlap) candidate table a pipeline would then join back to drop or flag
documents.

Scale shape (the part that matters at 100 TB):
- Gram STRINGS never travel through a shuffle — each side's distinct grams
  are reduced to ``xxhash64`` keys before the join (collision odds across
  a 10^12-gram corpus are ~m²/2^65 — negligible, and a collision only
  inflates one pair's count by 1).
- The eval side is tiny relative to the corpus (benchmark suites are
  ~10^5-10^7 grams), so it BROADCASTS: the corpus-side pass is then a
  map-only scan + broadcast-hash-join + partial-agg — the 100-TB corpus is
  never shuffled at all. ``broadcast_eval=False`` is the degrade path
  (sort-merge on 64-bit keys) for an eval side too big to broadcast.
- Per-pair counts come from a groupBy keyed by (corpus doc, eval doc);
  map-side combine keeps the shuffle proportional to contaminated pairs,
  not to gram matches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nebula_importer_spark.operators.linking import word_ngrams


def ngram_overlap(
    corpus: DataFrame,
    eval_df: DataFrame,
    *,
    n: int = 3,
    min_overlap: int = 1,
    id_col: str = "doc_id",
    eval_id_col: str = "eval_id",
    text_col: str = "text",
    eval_text_col: str = "text",
    broadcast_eval: bool = True,
) -> DataFrame:
    """Distinct shared word-``n``-gram counts between each corpus document
    and each eval document.

    Returns ``(id_col, eval_id_col, n_overlap)`` for every pair sharing at
    least ``min_overlap`` distinct grams. ``word_ngrams`` dedups per
    document, so the join row count per pair IS the distinct intersection
    size — no per-pair array intersection pass.
    """
    if eval_id_col == id_col:
        raise ValueError(
            "eval_id_col must differ from id_col (both survive into the "
            f"output); rename one side, got {id_col!r} for both"
        )
    for reserved in ("_g", "_h"):
        if reserved in (id_col, eval_id_col):
            raise ValueError(
                f"id_col/eval_id_col may not be the reserved scratch name "
                f"{reserved!r} (used internally for the gram/hash columns); "
                "rename the column before calling ngram_overlap"
            )
    co = corpus.select(
        F.col(id_col),
        F.explode(word_ngrams(F.col(text_col), n)).alias("_g"),
    ).select(id_col, F.xxhash64("_g").alias("_h"))
    ev = eval_df.select(
        F.col(eval_id_col),
        F.explode(word_ngrams(F.col(eval_text_col), n)).alias("_g"),
    ).select(eval_id_col, F.xxhash64("_g").alias("_h"))
    if broadcast_eval:
        ev = F.broadcast(ev)
    return (
        co.join(ev, "_h")
        .groupBy(id_col, eval_id_col)
        .agg(F.count("*").alias("n_overlap"))
        .filter(F.col("n_overlap") >= min_overlap)
    )


def contaminated_ids(pairs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Distinct corpus doc ids to drop, given an ``ngram_overlap`` output —
    the aggregate a cleaning pipeline anti-joins against the corpus."""
    return pairs.select(id_col).distinct()
