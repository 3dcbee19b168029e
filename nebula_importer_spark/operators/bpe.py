"""Iterative BPE tokenizer training (Sennrich 2016) over a distributed
word-frequency vocabulary.

The tokenizer-training step of a training-data pipeline: learn the top-N
byte-pair merges from the corpus. Classic trainers are single-machine;
the distributed formulation here exploits the standard observation that
BPE statistics live on the WORD VOCABULARY, not the corpus — one corpus
scan builds (word, count), and every merge round is a bounded DataFrame
aggregation over the vocabulary (|V| rows, not |corpus|).

Per-round shape:
- pair counting: map-side adjacent-pair explode over the symbol arrays,
  one partial-agg'd groupBy (weighted by word count);
- argmax: ``orderBy(count desc, pair asc).limit(1)`` — plans as
  TakeOrderedAndProject, ONE row crosses to the driver per round (the
  same driver-scalar discipline as the k-core convergence probe);
- merge application: a map-side ``F.aggregate`` fold over each symbol
  array — greedy left-to-right non-overlapping replacement, the exact
  semantics of the reference BPE algorithm (``aaa`` + merge (a,a) →
  ``[aa, a]``);
- ``localCheckpoint`` each round truncates the lineage (the measured
  k-core OOM lesson — iterative loops grow plans 4×/round otherwise).

Determinism contract: counts are exact integers; ties break on the pair's
(left, right) string order (binary collation on both engines); the fold is
order-free because it is per-row. The whole merge table is therefore
hash-stable — the DuckDB oracle unrolls the same rounds as CTEs with
``list_reduce`` folds and must agree merge-for-merge.

At 100 TB: the corpus scan is one groupBy(word); the vocabulary (10^7–10^9
words) stays distributed; each round shuffles only (pair, count) rows
(bounded by Σ word lengths over the vocab, with map-side combine). The
driver holds n_merges rows total. No Python touches row data.

Reference analog: none — nebula-importer has no text surface (SURVEY
§2.7); this extends the text family (operators/text.py:bpe_pair_counts is
the single-round probe this trainer iterates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import NOT_WS

END_OF_WORD = "</w>"


def _word_vocab(docs: DataFrame, text_col: str) -> DataFrame:
    """(word, count) over NOT_WS-run tokens — the one corpus-sized pass."""
    toks = F.regexp_extract_all(
        F.coalesce(F.col(text_col), F.lit("")), F.lit(NOT_WS + "+"), F.lit(0)
    )
    return (
        docs.select(F.explode(toks).alias("_w"))
        .groupBy("_w")
        .agg(F.count(F.lit(1)).cast("long").alias("_cnt"))
    )


def _initial_symbols(vocab: DataFrame) -> DataFrame:
    chars = F.expr("transform(sequence(1, length(_w)), i -> substring(_w, i, 1))")
    return vocab.select(
        F.concat(chars, F.array(F.lit(END_OF_WORD))).alias("_syms"), "_cnt"
    )


def _pair_counts(words: DataFrame) -> DataFrame:
    pairs = F.expr(
        "transform(sequence(1, size(_syms) - 1), "
        "i -> struct(element_at(_syms, i) AS l, element_at(_syms, i + 1) AS r))"
    )
    return (
        words.filter(F.size("_syms") >= 2)
        .select(F.explode(pairs).alias("_p"), "_cnt")
        .groupBy("_p.l", "_p.r")
        .agg(F.sum("_cnt").cast("long").alias("pair_count"))
    )


def _apply_merge(words: DataFrame, left: str, right: str) -> DataFrame:
    merged = left + right
    fold = F.aggregate(
        F.col("_syms"),
        F.expr("CAST(array() AS array<string>)"),
        lambda acc, s: F.when(
            (F.get(acc, F.size(acc) - 1) == F.lit(left)) & (s == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )
    return words.select(fold.alias("_syms"), "_cnt")


def bpe_train(
    docs: DataFrame,
    *,
    text_col: str = "text",
    n_merges: int = 10,
    min_pair_count: int = 2,
) -> DataFrame:
    """Learn ``n_merges`` BPE merges; returns the merge table
    ``(round, left_sym, right_sym, merged, pair_count)`` ordered by round.

    Stops early when the best remaining pair's weighted count falls below
    ``min_pair_count`` (or no pairs remain). The returned DataFrame is
    driver-materialized by construction (n_merges rows — the model, not
    data) so it parallelizes as a broadcast to any downstream tokenizer.
    """
    if n_merges <= 0:
        raise ValueError(f"n_merges must be positive, got {n_merges}")
    if min_pair_count < 1:
        raise ValueError(f"min_pair_count must be >= 1, got {min_pair_count}")
    if text_col not in docs.columns:
        raise ValueError(f"column {text_col!r} not in input: {docs.columns}")

    spark = docs.sparkSession
    words = _initial_symbols(_word_vocab(docs, text_col)).localCheckpoint()
    merges: list[tuple[int, str, str, str, int]] = []
    for rnd in range(1, n_merges + 1):
        best = (
            _pair_counts(words)
            .orderBy(F.desc("pair_count"), F.asc("l"), F.asc("r"))
            .limit(1)
            .collect()
        )
        if not best or best[0]["pair_count"] < min_pair_count:
            break
        l, r, cnt = best[0]["l"], best[0]["r"], int(best[0]["pair_count"])
        merges.append((rnd, l, r, l + r, cnt))
        words = _apply_merge(words, l, r).localCheckpoint()
    return spark.createDataFrame(
        merges,
        "round long, left_sym string, right_sym string, merged string, "
        "pair_count long",
    )


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    *,
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Apply a learned merge list to a corpus: per NOT_WS token, char-split
    + ``</w>`` then replay the merges in order — map-only, the same greedy
    fold as training, whole-stage codegen, no shuffle. ``merges`` is the
    (left, right) list from ``bpe_train`` (driver-sized by contract)."""
    if text_col not in docs.columns:
        raise ValueError(f"column {text_col!r} not in input: {docs.columns}")
    toks = F.regexp_extract_all(
        F.coalesce(F.col(text_col), F.lit("")), F.lit(NOT_WS + "+"), F.lit(0)
    )
    col = F.transform(
        toks,
        lambda w: F.concat(_chars_of(w), F.array(F.lit(END_OF_WORD))),
    )
    def _merge_step(left: str, right: str):
        # closure factory: PySpark counts lambda params, so the pair must
        # be captured, not passed as defaults
        return lambda s: _fold_merge(s, left, right, left + right)

    for left, right in merges:
        col = F.transform(col, _merge_step(left, right))
    return docs.withColumn(out_col, F.flatten(col))


def _chars_of(w):
    return F.transform(
        F.sequence(F.lit(1), F.length(w)),
        lambda i: F.substr(w, i, F.lit(1)),
    )


def _fold_merge(syms, left: str, right: str, merged: str):
    return F.aggregate(
        syms,
        F.expr("CAST(array() AS array<string>)"),
        lambda acc, s: F.when(
            (F.get(acc, F.size(acc) - 1) == F.lit(left)) & (s == F.lit(right)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def unigram_vocab(
    docs: DataFrame,
    *,
    text_col: str = "text",
    max_piece_len: int = 4,
    min_count: int = 2,
) -> DataFrame:
    """Unigram-LM tokenizer vocabulary (the SentencePiece family, Kudo
    2018, simplified to the deterministic core): every character
    n-gram (1..``max_piece_len``) of the corpus words with frequency ≥
    ``min_count`` — single characters are ALWAYS kept so every word
    stays segmentable — scored ``floor(ln(count/total)·10⁶)`` micro-nats
    over the kept-piece total. One corpus scan builds the word-frequency
    table (the BPE observation: tokenizer statistics live on the WORD
    VOCABULARY); piece enumeration is a bounded JVM transform over it.

    Returns ``(piece, count, score_micro)``.
    """
    if not 1 <= max_piece_len <= 8:
        raise ValueError(f"max_piece_len must be in [1, 8], got {max_piece_len}")
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    if text_col not in docs.columns:
        raise ValueError(f"column {text_col!r} not in input: {docs.columns}")
    vocab = _word_vocab(docs, text_col)
    pieces = F.expr(
        f"flatten(transform(sequence(1, length(_w)), i -> "
        f"transform(sequence(i, least(i + {max_piece_len - 1}, length(_w))), "
        f"j -> substring(_w, i, j - i + 1))))"
    )
    counts = (
        vocab.select(F.explode(pieces).alias("piece"), "_cnt")
        .groupBy("piece")
        .agg(F.sum("_cnt").cast("long").alias("count"))
        .filter((F.col("count") >= min_count) | (F.length("piece") == 1))
    )
    tot = counts.agg(F.sum("count").cast("long").alias("_t"))
    return counts.join(F.broadcast(tot)).select(
        "piece",
        "count",
        F.floor(F.log(F.col("count").cast("double") / F.col("_t")) * 10**6)
        .cast("long")
        .alias("score_micro"),
    )


def unigram_word_segments(
    docs: DataFrame,
    vocab: DataFrame,
    *,
    text_col: str = "text",
    max_piece_len: int = 4,
) -> DataFrame:
    """Viterbi segmentation of every DISTINCT corpus word under a
    unigram-LM vocabulary — the tokenize step of the SentencePiece
    family, exactly checkable because the objective is an integer:
    maximize total piece score in micro-nats, ties to the FEWEST
    pieces (the DP state is the single packed integer
    ``score·100 − pieces``, whose natural ordering IS that
    lexicographic rule — exact for any word under 100 pieces).

    Distributed shape: segmentation runs once per DISTINCT word (the
    vocabulary-distinct discipline of entity linking), as an
    Arrow-batched ``mapInPandas`` kernel with the piece-score dict a
    broadcast plan constant (tokenizer vocabularies are bounded —
    ≤ |char n-grams| under the min_count cut); per-word cost is
    ``len·max_piece_len`` dict probes. Words over 96 characters (the
    packing bound) and words with unreachable positions (characters
    outside the vocabulary) return NULL segment stats — visible, never
    dropped.

    Returns ``(word, count, best_micro, n_pieces)`` — per-document
    token counts are one weighted join-back away.
    """
    if not 1 <= max_piece_len <= 8:
        raise ValueError(f"max_piece_len must be in [1, 8], got {max_piece_len}")
    for c, d, side in ((text_col, docs, "docs"), ("piece", vocab, "vocab"),
                       ("score_micro", vocab, "vocab")):
        if c not in d.columns:
            raise ValueError(f"column {c!r} not in {side} input: {d.columns}")
    import pandas as pd

    scores = {
        r["piece"]: int(r["score_micro"])
        for r in vocab.select("piece", "score_micro").collect()
    }
    L = int(max_piece_len)
    words = _word_vocab(docs, text_col).select(
        F.col("_w").alias("word"), F.col("_cnt").alias("count")
    )

    def kernel(batches):
        for pdf in batches:
            outs = []
            for word, cnt in zip(pdf["word"], pdf["count"]):
                n = len(word)
                if n == 0 or n > 96:
                    outs.append((word, int(cnt), None, None))
                    continue
                v = [None] * (n + 1)
                v[0] = 0
                for i in range(1, n + 1):
                    best = None
                    for j in range(max(0, i - L), i):
                        if v[j] is None:
                            continue
                        s = scores.get(word[j:i])
                        if s is None:
                            continue
                        cand = v[j] + s * 100 - 1
                        if best is None or cand > best:
                            best = cand
                    v[i] = best
                if v[n] is None:
                    outs.append((word, int(cnt), None, None))
                else:
                    # packed = 100·Σscore − pieces; pieces ≤ 96 < 100
                    pieces = (-v[n]) % 100
                    score = (v[n] + pieces) // 100
                    outs.append((word, int(cnt), score, pieces))
            yield pd.DataFrame(
                outs, columns=["word", "count", "best_micro", "n_pieces"]
            )

    return words.mapInPandas(
        kernel,
        schema="word string, count long, best_micro long, n_pieces long",
    )
