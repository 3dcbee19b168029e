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


def inverted_index(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 1,
    max_df: int | None = None,
) -> DataFrame:
    """Build the inverted index — ``term → sorted posting list`` — the
    structure the BM25 header note defers to "once the query set is large
    and reused": per term, document frequency, total term frequency, and
    the doc-ordered postings rendered ``"<doc_id>:<tf>"``.

    Tokens are the repo-wide explicit-whitespace convention
    (operators/text.py:NOT_WS — RE2/DuckDB-identical), lowercased.

    Scale shape: ONE shuffle keyed by the fixed-width ``(term, doc)``
    pair (tf partial-aggregates map-side), then a term-keyed agg whose
    per-group state is that term's posting list. The posting list is the
    OUTPUT, so that memory is irreducible — except for stop terms, which
    is what ``max_df`` bounds: terms in more than ``max_df`` documents
    are dropped AFTER their df is known (one cheap pre-agg over distinct
    (term, doc)), the same capped-universe semantics as
    dedup.ngram_jaccard_pairs' stop-shingle cap. At 100 TB you always set
    ``max_df`` — a posting list for "the" is a hot key by construction.
    ``min_df`` drops hapax noise post-agg (no extra pass).

    Returns ``(term, doc_freq, total_tf, postings array<string>)``,
    postings sorted by doc id ascending.
    """
    for c in (text_col, id_col):
        if c not in df.columns:
            raise ValueError(f"column {c!r} not in input: {df.columns}")
    if min_df < 1:
        raise ValueError(f"min_df must be >= 1, got {min_df}")
    if max_df is not None and max_df < min_df:
        raise ValueError(f"max_df {max_df} < min_df {min_df}")

    from nebula_importer_spark.operators.text import NOT_WS

    toks = df.select(
        F.col(id_col).alias("_doc"),
        F.explode(
            F.expr(
                f"regexp_extract_all(lower(coalesce({text_col}, '')),"
                f" '{NOT_WS}+', 0)"
            )
        ).alias("term"),
    )
    tf = toks.groupBy("term", "_doc").agg(
        F.count(F.lit(1)).cast("long").alias("_tf")
    )
    if max_df is not None:
        df_counts = tf.groupBy("term").agg(
            F.count(F.lit(1)).alias("_df")
        )
        keep = df_counts.filter(F.col("_df") <= max_df).select("term")
        tf = tf.join(keep, "term")
    out = tf.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("doc_freq"),
        F.sum("_tf").cast("long").alias("total_tf"),
        F.transform(
            F.sort_array(
                F.collect_list(F.struct(F.col("_doc").alias("d"),
                                        F.col("_tf").alias("t")))
            ),
            lambda s: F.concat_ws(":", s["d"].cast("string"),
                                  s["t"].cast("string")),
        ).alias("postings"),
    )
    return out.filter(F.col("doc_freq") >= min_df)


#: RRF contributions are integer micro-units: 10**6 div (k + rank).
RRF_MICRO = 10**6


def rrf_fuse(
    rankings: list[DataFrame],
    *,
    id_col: str = "doc_id",
    score_col: str = "score",
    query_col: str | None = None,
    k: int = 60,
    max_rows: int | None = 100_000,
) -> DataFrame:
    """Reciprocal Rank Fusion (Cormack et al., SIGIR 2009) — the
    hybrid-retrieval standard for combining heterogeneous rankings
    (BM25 lexical + ANN semantic, or any scored candidate lists)
    without score calibration: each system contributes
    ``1/(k + rank)``, so agreement near the top dominates and scales
    never need reconciling.

    Pinned exactness: per system, ranks are ``row_number`` over
    ``(score desc, id asc)`` (the id tiebreak makes equal scores
    deterministic); each contribution floors to
    ``10⁶ div (k + rank)`` micro-units, so the fused score is a small
    sum of exact integers — order-proof and hash-stable where the
    textbook float sum is not. Items missing from a system simply
    contribute nothing (the standard semantics).

    Distributed shape: one window per input ranking (partitioned by
    ``query_col`` when given — global rankings use the
    order-preserving caveat that a single-system global ranking is a
    one-partition window, so PRE-LIMIT per-system candidates to top-N
    per query upstream, which is how RRF is used in practice), then a
    full-outer union aggregated on (query, id). Returns
    ``(query_col?, id_col, n_systems, rrf_micro, best_rank)``.

    The pre-truncate contract is ENFORCED, not advised: without
    ``query_col`` the per-system ranking is a single-partition global
    window, so a ranking wider than ``max_rows`` (default 10^5) raises
    at execution time — the same capped-universe discipline as the other
    bounded-fan-out operators. The guard is a ``raise_error`` on the
    already-computed row_number, so it costs zero extra jobs or
    exchanges. Pass ``max_rows=None`` only for query-partitioned inputs
    where per-query lists are bounded by construction.
    """
    if not rankings or len(rankings) < 2:
        raise ValueError("rrf_fuse needs at least two rankings")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if max_rows is not None and max_rows < 1:
        raise ValueError(f"max_rows must be >= 1 or None, got {max_rows}")
    from pyspark.sql.window import Window as W

    parts = []
    for idx, df in enumerate(rankings):
        for c in filter(None, [id_col, score_col, query_col]):
            if c not in df.columns:
                raise ValueError(
                    f"column {c!r} not in ranking {idx}: {df.columns}"
                )
        w = (
            W.partitionBy(query_col) if query_col else W.partitionBy()
        ).orderBy(F.col(score_col).desc(), F.col(id_col).asc())
        sel = [F.col(id_col).alias("_id")]
        if query_col:
            sel.append(F.col(query_col).alias("_q"))
        ranked = df.select(*sel, F.row_number().over(w).alias("_r"))
        if max_rows is not None and not query_col:
            ranked = ranked.withColumn(
                "_r",
                F.when(
                    F.col("_r") > max_rows,
                    F.raise_error(
                        F.lit(
                            f"rrf_fuse: ranking {idx} exceeds max_rows="
                            f"{max_rows} without query_col — pre-truncate "
                            "each system to its top-N candidates (the "
                            "global ranking window is single-partition)"
                        )
                    ).cast("int"),
                ).otherwise(F.col("_r")),
            )
        parts.append(
            ranked.select(
                "*",
                F.expr(f"div({RRF_MICRO}L, {int(k)} + _r)").alias("_c"),
            )
        )
    from functools import reduce

    uni = reduce(lambda a, b: a.unionByName(b), parts)
    keys = (["_q"] if query_col else []) + ["_id"]
    out = uni.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("long").alias("n_systems"),
        F.sum("_c").cast("long").alias("rrf_micro"),
        F.min("_r").cast("long").alias("best_rank"),
    )
    renames = [F.col("_id").alias(id_col)]
    if query_col:
        renames.insert(0, F.col("_q").alias(query_col))
    return out.select(*renames, "n_systems", "rrf_micro", "best_rank")
