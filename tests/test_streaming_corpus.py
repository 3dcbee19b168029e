"""Streaming incremental n-gram novelty: stream/batch equivalence across
id-ordered multi-batch arrival, true cross-batch state (the gram store),
and replay idempotence of the partition-keyed writes."""

from __future__ import annotations

from pyspark.sql import functions as F

from nebula_importer_spark.operators.dedup import gram_novelty
from nebula_importer_spark.streaming.corpus import (
    read_document_stream,
    read_novelty,
    run_incremental_novelty,
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (3, "a completely different early document about spark and shuffles"),
    # second drop (ids above the first drop — id-ordered arrival)
    (10, "the quick brown fox jumps over the lazy dog near the river bend today"),
    (11, "a completely different early document about spark and shuffles"),
    (12, "fresh words that no earlier document used at all in any gram"),
]


def _doc_df(spark, rows):
    return spark.createDataFrame(
        [(i, t, "en", "src", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def _report(df):
    return {
        r["doc_id"]: (r["n_grams"], r["n_stale"], r["stale_frac"])
        for r in df.collect()
    }


def test_stream_matches_batch_across_batches(spark, tmp_path):
    indir, out, ckpt = tmp_path / "in", tmp_path / "out", tmp_path / "ckpt"
    # two id-ordered file drops → two micro-batches (maxFilesPerTrigger=1)
    _doc_df(spark, DOCS[:3]).coalesce(1).write.parquet(str(indir / "drop0"))
    _doc_df(spark, DOCS[3:]).coalesce(1).write.parquet(str(indir / "drop1"))
    stream = read_document_stream(spark, str(indir / "drop*"), max_files_per_trigger=1)
    seen = run_incremental_novelty(stream, out, ckpt, n=3)
    assert seen["batches"] == 2 and seen["docs"] == 6

    got = _report(read_novelty(spark, out))
    want = _report(gram_novelty(_doc_df(spark, DOCS), n=3))
    assert got == want
    # the cross-batch cases specifically: doc 11 duplicates doc 3 (earlier
    # BATCH) → fully stale; doc 12 is all-novel
    assert got[11][2] == 1.0
    assert got[12][1] == 0 and got[12][2] == 0.0
    # doc 10 near-duplicates doc 1 from the earlier batch (one token diff)
    assert got[10] == want[10] and 0.0 < got[10][2] < 1.0


def test_stream_replay_is_idempotent(spark, tmp_path):
    indir, out = tmp_path / "in", tmp_path / "out"
    _doc_df(spark, DOCS[:3]).coalesce(1).write.parquet(str(indir / "drop0"))
    _doc_df(spark, DOCS[3:]).coalesce(1).write.parquet(str(indir / "drop1"))
    # run twice with FRESH checkpoints: the second run replays every batch
    # against an already-populated store — partition-keyed dynamic
    # overwrite plus the `_batch_id < current` store filter must leave the
    # tables byte-identical, not doubled and not staled by self-reads
    for ckpt in (tmp_path / "ckpt1", tmp_path / "ckpt2"):
        stream = read_document_stream(
            spark, str(indir / "drop*"), max_files_per_trigger=1
        )
        run_incremental_novelty(stream, out, ckpt, n=3)
    got = _report(read_novelty(spark, out))
    want = _report(gram_novelty(_doc_df(spark, DOCS), n=3))
    assert got == want
    # the gram store holds one partition per batch, no duplicates
    store = spark.read.parquet(str(out / "grams"))
    assert store.groupBy("_h", "_batch_id").count().filter("count > 1").count() == 0


def test_stream_single_batch_degenerates_to_batch(spark, tmp_path):
    indir, out, ckpt = tmp_path / "in", tmp_path / "out", tmp_path / "ckpt"
    _doc_df(spark, DOCS).coalesce(1).write.parquet(str(indir))
    stream = read_document_stream(spark, str(indir), max_files_per_trigger=100)
    seen = run_incremental_novelty(stream, out, ckpt, n=3)
    assert seen["batches"] == 1
    assert _report(read_novelty(spark, out)) == _report(
        gram_novelty(_doc_df(spark, DOCS), n=3)
    )
