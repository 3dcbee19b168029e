"""Multi-phrase blocklist tagging over a document corpus.

The operation every safety/compliance pass in a training-data pipeline
needs: given a phrase table (possibly millions of entries — profanity
lists, PII trigger phrases, licensed-content titles), tag each document
with the phrases it contains under TOKEN-BOUNDARY semantics ("ark" must
not hit "spark"; "big query" must match the two-token run, not the
substring of "bigquery").

Scale design (the phrase table is a TABLE, not a broadcast literal):

1. normalize: collapse whitespace runs to single spaces on both sides
   (map-only) so token-boundary matching is a literal substring check
   against ``' '+text+' '``.
2. candidate generation by FIRST-TOKEN equi-join: explode each document
   into its DISTINCT tokens (id + token only — the text column never
   rides the explode), join against the phrase table keyed by its first
   token. Fan-out is bounded by (distinct tokens per doc) × (phrases per
   first token) — no doc×phrase cross product ever materializes.
3. verify: join the deduplicated (doc, phrase) candidates back to the
   documents table on the doc id (text shuffles exactly once, on the id)
   and keep pairs where ``' '+text+' '`` contains ``' '+phrase+' '``.

Single-token phrases skip verification entirely: for them the token join
IS the proof (the exploded token equals the phrase), saving the text-side
join work for the common dictionary shape where most entries are unigrams.

A small phrase list (the common interactive case) still plans the same
way — Catalyst broadcasts the tiny phrase side of the token join and the
tiny candidate side of the verify join, so the corpus is never shuffled.

Reference anchor: nebula-importer's filter hook drops rows by expression
(/root/reference/pkg/spec/base/filter.go); this operator is the corpus-
scale generalization where the "expression" is membership of any of N
phrases and N is itself data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Same explicit whitespace class as operators/text.py (RE2/Java parity).
WS = "[\t\n\f\r ]"

_RESERVED = ("_norm", "_tok", "_first_tok", "phrase")


def _normalize(c: Column) -> Column:
    """Whitespace-run collapse + trim: token-boundary matching becomes a
    literal substring check. NULL text → empty (matches nothing)."""
    return F.trim(F.regexp_replace(F.coalesce(c, F.lit("")), WS + "+", " "))


def blocklist_hits(
    docs: DataFrame,
    phrases: DataFrame | list[str],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    phrase_col: str = "phrase",
) -> DataFrame:
    """One row per (document, phrase) hit: ``(id_col, phrase)``.

    ``phrases`` is a DataFrame with ``phrase_col`` (the scale path) or a
    plain list of strings (wrapped into a single-column DataFrame).
    Phrases are whitespace-normalized with the same kernel as documents;
    empty/NULL phrases are dropped.
    """
    if id_col in _RESERVED or text_col in _RESERVED:
        raise ValueError(
            f"id_col/text_col may not collide with reserved names {_RESERVED}"
        )
    if isinstance(phrases, list):
        spark = docs.sparkSession
        phrases = spark.createDataFrame(
            [(p,) for p in phrases], f"{phrase_col} string"
        )

    p = (
        phrases.select(_normalize(F.col(phrase_col)).alias("phrase"))
        .filter(F.col("phrase") != "")
        .distinct()
        .withColumn("_first_tok", F.split(F.col("phrase"), " ").getItem(0))
        .withColumn("_is_multi", F.instr(F.col("phrase"), " ") > 0)
    )

    d = docs.select(F.col(id_col), _normalize(F.col(text_col)).alias("_norm"))

    # distinct tokens per doc — id + token only; text never explodes
    toks = d.select(
        F.col(id_col), F.explode(F.split(F.col("_norm"), " ")).alias("_tok")
    ).distinct()

    cand = toks.join(p, toks["_tok"] == p["_first_tok"]).select(
        id_col, "phrase", "_is_multi"
    )

    # unigram phrases: the token join IS the verification
    uni = cand.filter(~F.col("_is_multi")).select(id_col, "phrase")

    # multi-token phrases: verify the full run against the text, shuffled
    # once on the doc id
    multi = (
        cand.filter(F.col("_is_multi"))
        .select(id_col, "phrase")
        .distinct()
        .join(d, id_col)
        .filter(
            F.contains(
                F.concat(F.lit(" "), F.col("_norm"), F.lit(" ")),
                F.concat(F.lit(" "), F.col("phrase"), F.lit(" ")),
            )
        )
        .select(id_col, "phrase")
    )
    return uni.unionByName(multi)


def blocklist_summary(
    docs: DataFrame,
    phrases: DataFrame | list[str],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    phrase_col: str = "phrase",
) -> DataFrame:
    """Per-document verdict: ``(id_col, n_blocked, blocked)`` where
    ``n_blocked`` counts distinct phrases hit (0 for clean docs — the
    common case rides a cheap left join) and ``blocked`` is the flag a
    downstream filter consumes."""
    hits = blocklist_hits(
        docs, phrases, id_col=id_col, text_col=text_col, phrase_col=phrase_col
    )
    per_doc = hits.groupBy(id_col).agg(
        F.count_distinct("phrase").alias("n_blocked")
    )
    return (
        docs.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_blocked", F.lit(0)).cast("long").alias("n_blocked"),
            (F.coalesce("n_blocked", F.lit(0)) > 0).alias("blocked"),
        )
    )
