"""Keyword relevance search: BM25 scoring over a document corpus
(training-data pipeline surface — corpus QA / targeted subset extraction,
e.g. "pull every doc relevant to these probe terms").

Scale shape: for a literal query-term list the whole operator is
  1. one map pass     — per-term tf via word-bounded ``regexp_count`` plus
                        doc length (no tokenize-and-explode; the corpus is
                        scanned once and never exploded),
  2. one 1-row agg    — N, avgdl, per-term document frequencies (partial
                        aggregation collapses this to bytes per task),
  3. one broadcast    — the 1-row stats table crossJoins back,
  4. one map pass     — the BM25 formula, pure JVM arithmetic.
Zero explodes, zero data shuffles (the only exchange carries one row).
At 100 TB this is scan → scan; an inverted index would only win once the
query set is large and reused, which is out of scope for corpus QA probes.

idf = ln(1 + (N − df + 0.5)/(df + 0.5))   (Robertson–Sparck Jones, the
Lucene variant — always positive, so score>0 ⟺ ≥1 term matched).
score = Σ_t idf_t · tf_t·(k1+1) / (tf_t + k1·(1 − b + b·dl/avgdl)).

Every step has an exact DuckDB twin (regexp_extract_all lengths, AVG over
integral doubles, left-associated sum), so the driver oracle value-checks
it bit-for-bit after the shared ROUND(·, 6).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nebula_importer_spark.operators.text import token_count


def _term_pattern(term: str) -> str:
    """Word-boundary-wrapped pattern for one lowercased query term.

    ``\\b`` is only meaningful next to a word character: ``\\bc\\+\\+\\b``
    can never match ('+' is a non-word char, so the trailing boundary
    requires a word char right after the final '+') — terms like ``c++`` or
    ``.net`` would silently score 0 everywhere. Anchor each side with
    ``\\b`` only when that side of the term starts/ends with a word
    character; otherwise the literal non-word character itself delimits."""
    t = term.lower()
    pre = r"\b" if re.match(r"\w", t) else ""
    suf = r"\b" if re.search(r"\w$", t) else ""
    return pre + re.escape(t) + suf


def bm25_scores(
    df: DataFrame,
    terms: list[str],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Score every document against a bag of query ``terms``.

    Returns ``(id_col, score)`` for documents matching at least one term
    (score > 0). Terms are matched case-insensitively on word boundaries.
    Deterministic: tf/df/dl are integer-valued (exact in double regardless
    of aggregation order), and the per-term score sum is left-associated in
    both engines.
    """
    if not terms:
        raise ValueError("bm25_scores requires at least one query term")
    if any(not t or not t.strip() for t in terms):
        raise ValueError("bm25_scores terms must be non-empty")
    low = F.lower(F.coalesce(F.col(text_col), F.lit("")))
    base = df.select(
        F.col(id_col),
        token_count(text_col).cast("double").alias("_dl"),
        *[
            F.regexp_count(low, F.lit(_term_pattern(t)))
            .cast("double")
            .alias(f"_tf{i}")
            for i, t in enumerate(terms)
        ],
    )
    stats = base.agg(
        F.count("*").cast("double").alias("_n"),
        F.avg("_dl").alias("_avgdl"),
        *[
            F.sum((F.col(f"_tf{i}") > 0).cast("long")).cast("double").alias(f"_df{i}")
            for i in range(len(terms))
        ],
    )
    scored = base.crossJoin(F.broadcast(stats))
    score = None
    for i in range(len(terms)):
        tf = F.col(f"_tf{i}")
        idf = F.log(
            F.lit(1.0)
            + (F.col("_n") - F.col(f"_df{i}") + 0.5) / (F.col(f"_df{i}") + 0.5)
        )
        # avgdl == 0 (corpus of only empty/null texts) would make dl/avgdl
        # NaN, and Spark orders NaN > everything so `score > 0` would pass —
        # returning every doc with a NaN score where the oracle returns none.
        dl_ratio = F.when(
            F.col("_avgdl") > 0, F.col("_dl") / F.col("_avgdl")
        ).otherwise(F.lit(0.0))
        norm = tf + F.lit(k1) * (F.lit(1.0) - F.lit(b) + F.lit(b) * dl_ratio)
        # tf == 0 short-circuits BEFORE the division: with b=1.0 an
        # empty-text doc has norm == 0, and 0/0 is DIVIDE_BY_ZERO under
        # ANSI sessions (NULL-then-filtered under ANSI-off — right answer,
        # wrong reason). tf > 0 implies dl ≥ tf > 0, so norm > 0 there.
        term_score = F.when(
            tf > 0, idf * tf * F.lit(k1 + 1.0) / norm
        ).otherwise(F.lit(0.0))
        score = term_score if score is None else score + term_score
    return scored.select(F.col(id_col), score.alias("score")).filter(
        F.col("score") > 0
    )
