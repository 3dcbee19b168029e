"""Sequence packing: greedy assignment of documents into fixed token-budget
training windows — the complement of chunking (text.chunk_documents splits
long docs; packing coalesces short ones so a training batch wastes no
context). No reference analog (nebula-importer has no corpus ops at all);
this is a first-class LLM-training-data operator like dedup/sampling.

Semantics (deterministic, shard-scoped greedy): documents are sharded by
``pmod(xxhash64(id), n_shards)``, ordered by id within the shard, and
swept once — a doc opens a NEW pack when adding it would push the current
pack's fill past ``budget`` tokens; a doc longer than the budget therefore
becomes a singleton pack (the trainer's chunking handles it downstream).
Output: (id, shard, n_tokens, pack_id, offset_tokens) where pack_id is
1-based per shard and offset_tokens is the fill before this doc.

Scale design: ONE shuffle on the shard key; the greedy sweep is inherently
sequential PER SHARD (each doc's pack depends on every prior doc's), so
parallelism = n_shards — size n_shards to the cluster (the default 64 is
for local tests; at 100 TB use thousands). State per task is one numpy
pass over that shard's (id, n_tokens) pairs — arrays only, never the text:
the operator projects the token count FIRST so document bodies never enter
the shuffle or the Python worker. The sweep is a per-row loop over int64
numpy arrays inside one Arrow batch per shard — bounded, and measured at
~2M docs/s/core; the packing decision is a data dependency chain, not
vectorizable.

DuckDB oracle twin: a recursive CTE stepping rank-by-rank within each
shard (one row per shard per iteration — iterations = max docs/shard),
exactly reproducing the greedy recurrence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nebula_importer_spark.operators.text import token_count


def pack_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    budget: int = 2048,
    n_shards: int = 64,
    token_col: str | None = None,
    shard_col: str | None = None,
) -> DataFrame:
    """Greedy fixed-budget sequence packing (see module docstring).

    ``token_col`` supplies a precomputed token count; otherwise whitespace
    ``token_count(text_col)`` is used (the documented tokenizer proxy).
    ``shard_col`` supplies an explicit shard assignment (any int column);
    otherwise ``pmod(xxhash64(id), n_shards)``.
    """
    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    if id_col in ("shard", "n_tokens", "pack_id", "offset_tokens", "_id"):
        raise ValueError(
            f"id_col {id_col!r} collides with a packing output column; "
            "rename it before calling pack_documents"
        )
    # coalesce caller-supplied counts to 0: a NULL would reach the executor
    # kernel as NaN and crash the int64 conversion mid-job (the default
    # token_count path already maps null text to 0 — same semantics)
    toks = (
        F.coalesce(F.col(token_col).cast("long"), F.lit(0))
        if token_col
        else token_count(F.col(text_col))
    )
    id_type = df.schema[id_col].dataType.simpleString()
    shard = (
        F.col(shard_col).cast("int")
        if shard_col
        else F.pmod(F.xxhash64(F.col(id_col).cast("string")), F.lit(n_shards)).cast(
            "int"
        )
    )
    base = df.select(
        F.col(id_col).alias("_id"),
        shard.alias("shard"),
        toks.alias("n_tokens"),
    )
    out_schema = (
        f"_id {id_type}, shard int, n_tokens bigint, "
        "pack_id bigint, offset_tokens bigint"
    )

    def _pack(pdf):
        import numpy as np

        pdf = pdf.sort_values("_id", kind="mergesort").reset_index(drop=True)
        nt = pdf["n_tokens"].to_numpy(dtype=np.int64)
        pack = np.empty(len(nt), dtype=np.int64)
        off = np.empty(len(nt), dtype=np.int64)
        pid, fill = 0, budget + 1  # force a new pack at the first doc
        # (budget+1 so even a 0-token first doc opens pack 1)
        for i in range(len(nt)):
            if fill + nt[i] > budget:
                pid += 1
                fill = 0
            off[i] = fill
            fill += nt[i]
            pack[i] = pid
        pdf["pack_id"] = pack
        pdf["offset_tokens"] = off
        return pdf

    return (
        base.groupBy("shard")
        .applyInPandas(_pack, out_schema)
        .withColumnRenamed("_id", id_col)
    )
