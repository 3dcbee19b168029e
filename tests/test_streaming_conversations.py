"""Streaming incremental conversation stats: stream/batch equivalence
with one conversation's turns SPLIT across micro-batches (out of order),
replay idempotence of the partition-keyed partials, and compaction."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from nebula_importer_spark.streaming.conversations import (
    compact_conv_stats,
    read_conv_stats,
    run_incremental_conv_stats,
)
from nebula_importer_spark.transcripts.analytics import conv_stats

# conv "a" is split across drops with the LATER turns arriving FIRST —
# the merge must still reproduce the batch result (order-free combine).
DROP0 = [
    ("a", 2, "tool", "search", "find it", 120),
    ("a", 3, "assistant", None, "found", 140),
    ("b", 0, "user", None, "hello", 200),
    ("b", 1, "assistant", None, "hi", 230),
]
DROP1 = [
    ("a", 0, "user", None, "please look", 100),
    ("a", 1, "assistant", None, "on it", 110),
    ("c", 0, "user", None, "solo", 300),
]


def _turns_df(spark, rows):
    return spark.createDataFrame(
        [(c, i, r, t, x, s) for c, i, r, t, x, s in rows],
        "conv_id string, turn_idx int, role string, tool string, text string, _sec long",
    ).select(
        "conv_id", "turn_idx", "role", "tool", "text",
        F.timestamp_seconds("_sec").alias("ts"),
    )


TURN_SCHEMA = (
    "conv_id string, turn_idx int, role string, tool string, text string, "
    "ts timestamp"
)


def _run(spark, indir, out, ckpt):
    stream = (
        spark.readStream.schema(TURN_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(indir / "drop*"))
    )
    run_incremental_conv_stats(stream, out, ckpt)


def _rows(df):
    return {r["conv_id"]: tuple(r)[1:] for r in df.collect()}


def test_stream_matches_batch_with_split_conversation(spark, tmp_path):
    indir, out, ckpt = tmp_path / "in", tmp_path / "out", tmp_path / "ckpt"
    _turns_df(spark, DROP0).coalesce(1).write.parquet(str(indir / "drop0"))
    _turns_df(spark, DROP1).coalesce(1).write.parquet(str(indir / "drop1"))
    _run(spark, indir, out, ckpt)

    got = _rows(read_conv_stats(spark, out))
    want = _rows(conv_stats(_turns_df(spark, DROP0 + DROP1)))
    assert got == want
    # the split conversation specifically: stats span BOTH batches
    a = {r["conv_id"]: r.asDict() for r in read_conv_stats(spark, out).collect()}["a"]
    assert a["n_turns"] == 4 and a["first_role"] == "user"
    assert a["last_role"] == "assistant" and a["duration_sec"] == 40
    assert a["n_distinct_tools"] == 1


def test_replay_is_idempotent(spark, tmp_path):
    indir, out, ckpt = tmp_path / "in", tmp_path / "out", tmp_path / "ckpt"
    _turns_df(spark, DROP0).coalesce(1).write.parquet(str(indir / "drop0"))
    _turns_df(spark, DROP1).coalesce(1).write.parquet(str(indir / "drop1"))
    _run(spark, indir, out, ckpt)
    before = _rows(read_conv_stats(spark, out))

    # simulate a crash-replay: wipe the checkpoint so BOTH batches re-run;
    # dynamic partition overwrite must rewrite, not double-count
    shutil.rmtree(str(ckpt))
    _run(spark, indir, out, tmp_path / "ckpt2")
    assert _rows(read_conv_stats(spark, out)) == before


def test_compaction_preserves_view(spark, tmp_path):
    indir, out, ckpt = tmp_path / "in", tmp_path / "out", tmp_path / "ckpt"
    _turns_df(spark, DROP0).coalesce(1).write.parquet(str(indir / "drop0"))
    _turns_df(spark, DROP1).coalesce(1).write.parquet(str(indir / "drop1"))
    _run(spark, indir, out, ckpt)
    before = _rows(read_conv_stats(spark, out))

    compact_conv_stats(spark, out)
    after_df = spark.read.parquet(str(out))
    assert after_df.select("_batch_id").distinct().count() == 1
    assert _rows(read_conv_stats(spark, out)) == before
