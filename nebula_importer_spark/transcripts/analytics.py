"""Conversation-level analytics over transcript tables.

The input is the pipeline's canonical transcript shape (BASELINE
input_hint): ``(conv_id string, turn_idx int, role string, text string,
tool string, ts timestamp)`` — the same table the KG-construction
pipeline consumes (reference analog: nebula-importer's per-file record
streams, pkg/reader + pkg/stats; here the unit is the conversation, not
the CSV file). These are the corpus-QA queries an owner of a transcript
lake runs before and after KG construction: per-conversation shape
stats, agent tool-call chain mining, user→assistant response latency,
and template-level conversation dedup.

Scale shape, uniformly:

- Per-turn derivations (lengths, hashes, epoch casts) are projected
  MAP-SIDE first, so the conversation shuffle moves fixed-width
  integers — the turn text itself never travels as a shuffle key or
  grouped value (template_dedup hashes each turn before grouping).
- Every aggregate is partial-aggregable (sum/count/min/max/min_by/
  max_by), so the single conv_id exchange ships combiner output.
- Conversations are bounded (turns per conv ≪ partition size), so a
  per-conv collect_list of (turn_idx, tool-id/hash) structs is a small
  array, never a mega-group; the window ops partition by conv_id, the
  one natural key.

All outputs are integers/strings only (driver-gate discipline: no
doubles on either side of an oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "conv_stats",
    "tool_chains",
    "response_latency",
    "template_dedup",
    "sft_pairs",
    "conv_qa_flags",
]


def _ordered_field(field: str) -> "F.Column":
    """Per-conv values of `field` in turn order, as an array — via
    array_sort over (turn_idx, field) structs (turn_idx is unique within
    a conversation, so the sort is total and partition-order-proof)."""
    return F.transform(
        F.array_sort(F.collect_list(F.struct("turn_idx", field))),
        lambda s: s[field],
    )


def conv_stats(
    df: DataFrame,
    *,
    conv_col: str = "conv_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-conversation shape report: turn counts by role, tool-call
    count, distinct tools, total text chars, first/last role in turn
    order, and wall-clock duration in whole seconds.

    ONE shuffle on conv_id; every input to it is a map-side projected
    integer (text length, epoch seconds), and every aggregate has a
    partial, so the exchange carries combiner rows. first/last role ride
    min_by/max_by on the unique turn_idx — no window, no second sort.
    """
    per = df.select(
        F.col(conv_col).alias("conv_id"),
        "turn_idx",
        "role",
        "tool",
        F.length("text").alias("_chars"),
        F.col(ts_col).cast("long").alias("_ts"),
    )
    return per.groupBy("conv_id").agg(
        F.count("*").cast("long").alias("n_turns"),
        F.sum(F.when(F.col("role") == "user", 1).otherwise(0)).alias("n_user"),
        F.sum(F.when(F.col("role") == "assistant", 1).otherwise(0)).alias(
            "n_assistant"
        ),
        F.sum(F.col("tool").isNotNull().cast("int")).alias("n_tool_calls"),
        F.count_distinct("tool").alias("n_distinct_tools"),
        F.sum("_chars").alias("total_chars"),
        F.min_by("role", "turn_idx").alias("first_role"),
        F.max_by("role", "turn_idx").alias("last_role"),
        (F.max("_ts") - F.min("_ts")).alias("duration_sec"),
    )


def tool_chains(
    df: DataFrame,
    *,
    conv_col: str = "conv_id",
    sep: str = ">",
    max_chain: int = 1000,
) -> DataFrame:
    """Agent tool-call chain mining: the turn-ordered sequence of tool
    invocations per conversation, collapsed to a `sep`-joined chain
    string, counted corpus-wide → ``(chain, n_convs)``.

    Conversations with no tool calls are absent by definition (an empty
    chain is not a behavior). Non-tool turns are filtered BEFORE the
    conv shuffle, so only (turn_idx, tool) pairs travel; `max_chain`
    truncates a runaway agent loop (slice after sort — deterministic
    prefix) so one pathological conversation cannot produce an unbounded
    grouped array. Two shuffles total: conv_id, then the chain key —
    both partial-agg'd.
    """
    t = df.filter(F.col("tool").isNotNull()).select(
        F.col(conv_col).alias("conv_id"), "turn_idx", "tool"
    )
    chains = t.groupBy("conv_id").agg(
        F.array_join(
            F.slice(_ordered_field("tool"), 1, max_chain), sep
        ).alias("chain")
    )
    return chains.groupBy("chain").agg(F.count("*").cast("long").alias("n_convs"))


def response_latency(
    df: DataFrame,
    *,
    conv_col: str = "conv_id",
    ts_col: str = "ts",
) -> DataFrame:
    """User→assistant response latency per conversation: for every user
    turn whose NEXT turn (by turn_idx) is an assistant turn, the gap in
    whole seconds; aggregated to ``(conv_id, n_responses,
    total_latency_sec, max_latency_sec)``. Conversations with no such
    adjacent pair are absent.

    One window over (conv_id ORDER BY turn_idx) = one exchange; the
    follow-up groupBy reuses the same hash partitioning (no second
    exchange — Catalyst sees the co-partitioning). Integer seconds only.
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    per = df.select(
        F.col(conv_col).alias("conv_id"),
        "turn_idx",
        "role",
        F.col(ts_col).cast("long").alias("_ts"),
    )
    lat = (
        per.withColumn("_nrole", F.lead("role").over(w))
        .withColumn("_nts", F.lead("_ts").over(w))
        .filter((F.col("role") == "user") & (F.col("_nrole") == "assistant"))
        .select("conv_id", (F.col("_nts") - F.col("_ts")).alias("_lat"))
    )
    return lat.groupBy("conv_id").agg(
        F.count("*").cast("long").alias("n_responses"),
        F.sum("_lat").alias("total_latency_sec"),
        F.max("_lat").alias("max_latency_sec"),
    )


def conv_qa_flags(
    df: DataFrame,
    *,
    conv_col: str = "conv_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Conversation-level QA validation — the transcript analog of
    nebula-importer's per-record validation/rejection plane (reference:
    pkg/reader CSV validation + failed-row files; here the record is the
    conversation). One integer flag column per defect class →
    ``(conv_id, has_empty_turn, has_role_repeat, has_turn_gap,
    has_ts_regression, starts_with_user, n_defects)``:

    - has_empty_turn: any NULL/whitespace-only text
    - has_role_repeat: same role on consecutive turn_idx (broken
      alternation; tool turns count as their own role)
    - has_turn_gap: turn_idx sequence has holes or doesn't start at 0
    - has_ts_regression: a later turn_idx with an earlier timestamp
    - starts_with_user: turn 0 exists and is a user turn (the one
      POSITIVE gate)
    - n_defects: sum of the four defect flags — filter `n_defects = 0`
      for the clean corpus.

    Gap detection is agg-only (max+1 == count AND min == 0 — exact for
    duplicate-free turn_idx, which the pipeline's ordering invariant
    guarantees); repeat/regression ride one lag() window, the same
    conv_id exchange the final groupBy reuses. Integers only.
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    per = df.select(
        F.col(conv_col).alias("conv_id"),
        "turn_idx",
        "role",
        (F.col("text").isNull() | (F.trim(F.col("text")) == "")).cast("int").alias(
            "_empty"
        ),
        F.col(ts_col).cast("timestamp").cast("long").alias("_ts"),
    )
    lagged = per.withColumns(
        {
            "_prole": F.lag("role").over(w),
            "_pts": F.lag("_ts").over(w),
        }
    )
    return lagged.groupBy("conv_id").agg(
        F.max("_empty").alias("has_empty_turn"),
        F.coalesce(
            F.max((F.col("role") == F.col("_prole")).cast("int")), F.lit(0)
        ).alias("has_role_repeat"),
        (
            ~(
                (F.max("turn_idx") + 1 == F.count("*"))
                & (F.min("turn_idx") == 0)
            )
        )
        .cast("int")
        .alias("has_turn_gap"),
        F.coalesce(
            F.max((F.col("_ts") < F.col("_pts")).cast("int")), F.lit(0)
        ).alias("has_ts_regression"),
        F.max(
            ((F.col("turn_idx") == 0) & (F.col("role") == "user")).cast("int")
        ).alias("starts_with_user"),
    ).select(
        "conv_id",
        "has_empty_turn",
        "has_role_repeat",
        "has_turn_gap",
        "has_ts_regression",
        "starts_with_user",
        (
            F.col("has_empty_turn")
            + F.col("has_role_repeat")
            + F.col("has_turn_gap")
            + F.col("has_ts_regression")
        ).alias("n_defects"),
    )


def sft_pairs(
    df: DataFrame,
    *,
    conv_col: str = "conv_id",
    max_context_turns: int = 3,
    sep: str = "\n",
) -> DataFrame:
    """SFT training-pair mining: every adjacent user→assistant turn pair
    becomes ``(conv_id, turn_idx, context, prompt, response)`` — prompt =
    the user turn's text, response = the next turn's text, context = up to
    `max_context_turns` PRECEDING turns rendered as ``role: text`` lines
    joined by `sep` (empty string when the user turn opens the
    conversation). This is the transcript→instruction-data step of a
    training pipeline.

    One window exchange on conv_id serves both the lead() adjacency and
    the bounded-frame context collect (the frame is ROWS BETWEEN
    -max_context_turns AND -1, so per-row state is a constant-size array —
    no whole-conversation materialization, mega-threads included).
    """
    if max_context_turns < 0:
        raise ValueError(f"max_context_turns must be >= 0, got {max_context_turns}")
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    line = F.concat(F.col("role"), F.lit(": "), F.col("text"))
    per = df.select(
        F.col(conv_col).alias("conv_id"), "turn_idx", "role", "text"
    ).withColumns(
        {
            "_ctx": F.array_join(
                F.collect_list(line).over(
                    w.rowsBetween(-max_context_turns, -1)
                ),
                sep,
            ),
            "_nrole": F.lead("role").over(w),
            "_ntext": F.lead("text").over(w),
        }
    )
    return per.filter(
        (F.col("role") == "user") & (F.col("_nrole") == "assistant")
    ).select(
        "conv_id",
        "turn_idx",
        F.col("_ctx").alias("context"),
        F.col("text").alias("prompt"),
        F.col("_ntext").alias("response"),
    )


def normalize_template(col: "F.Column") -> "F.Column":
    """Template normalization: lowercase, digit runs → '0', whitespace
    runs → one space, trimmed. Conversations that differ only in
    numbers/ids/spacing normalize to the same template."""
    c = F.lower(col)
    c = F.regexp_replace(c, "[0-9]+", "0")
    c = F.regexp_replace(c, "\\s+", " ")
    return F.trim(c)


def template_dedup(
    df: DataFrame,
    *,
    conv_col: str = "conv_id",
) -> DataFrame:
    """Conversation-template dedup: two conversations are duplicates
    when their turn-ordered sequences of NORMALIZED turn texts
    (normalize_template) are identical. Returns ``(conv_id,
    canon_conv_id)`` — the canonical survivor is the MIN conv_id of the
    template group, for every conversation (survivors map to
    themselves).

    The scale move: each turn's normalized text is hashed to a 64-bit
    xxhash64 MAP-SIDE, so the conv shuffle groups fixed-width longs and
    the corpus text never travels. The conversation fingerprint is
    xxhash64 over the turn-ordered hash sequence; the canonical id is a
    min-window over the fingerprint (same discipline as exact_dedup's
    hash-keyed survivor — collisions are xxhash64-rare and would surface
    as an oracle hash mismatch, since the DuckDB twin groups by the
    actual normalized text sequence).
    """
    per = df.select(
        F.col(conv_col).alias("conv_id"),
        "turn_idx",
        F.xxhash64(normalize_template(F.col("text"))).cast("string").alias("_h"),
    )
    fp = per.groupBy("conv_id").agg(
        F.xxhash64(F.array_join(_ordered_field("_h"), ",")).alias("_fp")
    )
    w = Window.partitionBy("_fp")
    return fp.select(
        "conv_id", F.min("conv_id").over(w).alias("canon_conv_id")
    )


def context_suffix(
    transcripts: DataFrame,
    token_budget: int,
    *,
    conv: str = "conv_id",
    turn: str = "turn_idx",
    text_col: str = "text",
) -> DataFrame:
    """Chat-template context truncation as a set operator: per
    conversation, the longest SUFFIX of turns whose total whitespace-token
    count fits ``token_budget`` — the standard "keep the most recent
    context" rule every SFT/packing pipeline applies before tokenizing
    for real. Turn-granular: a final turn that alone exceeds the budget
    yields zero kept turns (this operator never splits a turn — compose
    with chunk_documents when splitting is wanted).

    Distributed shape: token counts are a map-side expression (same
    RE2-pinned whitespace class as operators/text.py); the reverse
    running sum rides ONE conversation-keyed window (ordered by
    ``turn DESC``, rows unbounded-preceding..current), and the summary
    aggregation reuses that window's partitioning — one exchange total.

    Returns ``(conv, n_turns_kept, first_kept_turn, last_turn,
    tokens_kept)`` — one row per conversation with ≥1 kept turn;
    conversations whose final turn overflows the budget are absent
    (count them against the input for the drop metric).
    """
    from pyspark.sql.window import Window

    from nebula_importer_spark.operators.text import NOT_WS

    if token_budget < 1:
        raise ValueError(f"token_budget must be >= 1, got {token_budget}")
    toks = transcripts.select(
        conv,
        turn,
        F.expr(
            f"size(regexp_extract_all(coalesce({text_col}, ''), "
            f"'{NOT_WS}+', 0))"
        ).alias("_tok"),
    )
    w = (
        Window.partitionBy(conv)
        .orderBy(F.desc(turn))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    kept = toks.withColumn("_cum", F.sum("_tok").over(w)).filter(
        F.col("_cum") <= token_budget
    )
    return kept.groupBy(conv).agg(
        F.count("*").cast("long").alias("n_turns_kept"),
        F.min(turn).cast("int").alias("first_kept_turn"),
        F.max(turn).cast("int").alias("last_turn"),
        F.sum("_tok").cast("long").alias("tokens_kept"),
    )


def conv_diversity(
    df: DataFrame,
    *,
    conv_col: str = "conv_id",
    role_col: str = "role",
    tool_col: str = "tool",
    scale: int = 1_000_000,
) -> DataFrame:
    """Per-conversation participation diversity — the SFT-filter feature
    conv_stats' raw counts don't give directly: how evenly are turns
    spread across roles, and tool calls across tools? Measured with the
    GINI-SIMPSON index ``1 − Σ pᵢ²`` instead of Shannon entropy
    deliberately: it is a RATIONAL function of the counts, so
    ``(n² − Σcᵢ²)·scale div n²`` is one exact truncating DECIMAL(38,0)
    div — engine/partition-proof where a float ``ln`` is not (the
    monologue→0, uniform→(k−1)/k reading is the same).

    Also emits the dominant share ``max cᵢ·scale div n`` (the
    "one role does all the talking" flag) with the min-role tie-break,
    and the tool twin over non-NULL tool calls (NULL diversity when the
    conversation never calls a tool — visible, not a fake 0).

    Distributed shape: one (conv, role) partial agg + one conv agg (and
    the tool twin), then one equi-join of two conversation-keyed frames
    — the conv_stats discipline; nothing data-sized shuffles twice.

    Returns ``(conv_id, n_turns, n_roles, role_gini_ppm,
    dominant_role, dominant_share_ppm, n_tool_calls, n_tools,
    tool_gini_ppm)``.
    """
    for c in (conv_col, role_col, tool_col):
        if c not in df.columns:
            raise ValueError(f"column {c!r} not in input: {df.columns}")
    if scale < 1:
        raise ValueError(f"scale must be >= 1, got {scale}")
    d38 = "decimal(38,0)"

    def _gini(sum_sq: str, n: str) -> F.Column:
        return F.expr(
            f"((CAST({n} AS {d38}) * {n} - {sum_sq}) * {scale})"
            f" div (CAST({n} AS {d38}) * {n})"
        ).cast("long")

    rc = (
        df.select(F.col(conv_col).alias("conv_id"), F.col(role_col).alias(
            "_r"))
        .groupBy("conv_id", "_r")
        .agg(F.count(F.lit(1)).cast("long").alias("_c"))
    )
    roles = rc.groupBy("conv_id").agg(
        F.sum("_c").cast("long").alias("n_turns"),
        F.count(F.lit(1)).cast("long").alias("n_roles"),
        F.sum(F.col("_c").cast(d38) * F.col("_c").cast(d38)).alias("_ss"),
        F.max(F.struct(F.col("_c"), F.col("_r"))).alias("_dom"),
    )
    # struct max = (max count, max role) — flip role for a MIN-role
    # tie-break by re-aggregating on the negated comparison? Simpler:
    # max(struct(c, r)) breaks count ties toward the LARGER role string;
    # redo with min over candidates at max count for a stable MIN rule.
    top = rc.join(
        roles.select("conv_id", F.col("_dom._c").alias("_mx")),
        "conv_id",
    ).filter(F.col("_c") == F.col("_mx")).groupBy("conv_id").agg(
        F.min("_r").alias("dominant_role")
    )
    tc = (
        df.filter(F.col(tool_col).isNotNull())
        .select(
            F.col(conv_col).alias("conv_id"), F.col(tool_col).alias("_t")
        )
        .groupBy("conv_id", "_t")
        .agg(F.count(F.lit(1)).cast("long").alias("_c"))
    )
    tools = tc.groupBy("conv_id").agg(
        F.sum("_c").cast("long").alias("n_tool_calls"),
        F.count(F.lit(1)).cast("long").alias("n_tools"),
        F.sum(F.col("_c").cast(d38) * F.col("_c").cast(d38)).alias("_tss"),
    )
    return (
        roles.join(top, "conv_id")
        .join(tools, "conv_id", "left")
        .select(
            "conv_id",
            "n_turns",
            "n_roles",
            _gini("_ss", "n_turns").alias("role_gini_ppm"),
            "dominant_role",
            F.expr(
                f"(CAST(_dom._c AS {d38}) * {scale}) div n_turns"
            )
            .cast("long")
            .alias("dominant_share_ppm"),
            F.coalesce("n_tool_calls", F.lit(0))
            .cast("long")
            .alias("n_tool_calls"),
            F.coalesce("n_tools", F.lit(0)).cast("long").alias("n_tools"),
            F.when(
                F.col("n_tool_calls") > 0, _gini("_tss", "n_tool_calls")
            )
            .cast("long")
            .alias("tool_gini_ppm"),
        )
    )
