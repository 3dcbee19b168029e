"""Sequence packing: greedy fixed-budget windows, per-shard recurrence
checked against a brute-force Python model on randomized corpora."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from nebula_importer_spark.operators.packing import pack_documents


def _model(rows, budget):
    """rows: [(id, n_tokens)] for ONE shard, any order → {id: (pack, off)}"""
    out = {}
    pid, fill = 0, budget + 1
    for i, nt in sorted(rows):
        if fill + nt > budget:
            pid, fill = pid + 1, 0
        out[i] = (pid, fill)
        fill += nt
    return out


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_pack_random_parity_with_model(spark):
    rng = random.Random(11)
    texts = [" ".join("w" for _ in range(rng.randrange(0, 30))) for _ in range(300)]
    n_shards, budget = 4, 40
    df = _docs(spark, texts).withColumn(
        "sh", F.pmod(F.col("doc_id"), F.lit(n_shards))
    )
    got = {
        r["doc_id"]: (r["shard"], r["pack_id"], r["offset_tokens"], r["n_tokens"])
        for r in pack_documents(df, budget=budget, shard_col="sh").collect()
    }
    assert len(got) == 300
    for sh in range(n_shards):
        rows = [(i, len(texts[i].split())) for i in range(300) if i % n_shards == sh]
        want = _model(rows, budget)
        for i, (pack, off) in want.items():
            assert got[i] == (sh, pack, off, dict(rows)[i]), i
    # every pack respects the budget except oversize singletons
    by_pack = {}
    for i, (sh, pack, off, nt) in got.items():
        by_pack.setdefault((sh, pack), []).append(nt)
    for docs in by_pack.values():
        assert sum(docs) <= 40 or len(docs) == 1


def test_pack_oversize_singleton_and_zero_tokens(spark):
    texts = ["w " * 100, "", "w w", "w"]  # 100, 0, 2, 1 tokens; one shard
    df = _docs(spark, texts).withColumn("sh", F.lit(0))
    got = {
        r["doc_id"]: (r["pack_id"], r["offset_tokens"])
        for r in pack_documents(df, budget=10, shard_col="sh").collect()
    }
    # doc 0 (100 tokens > budget) is pack 1 alone; docs 1-3 fill pack 2
    assert got == {0: (1, 0), 1: (2, 0), 2: (2, 0), 3: (2, 2)}


def test_pack_deterministic_across_parallelism(spark):
    texts = [f"{'w ' * (i % 17)}" for i in range(200)]
    df = _docs(spark, texts)
    a = pack_documents(df.repartition(1), budget=32, n_shards=8)
    b = pack_documents(df.repartition(16), budget=32, n_shards=8)
    key = lambda r: (r["doc_id"], r["shard"], r["pack_id"], r["offset_tokens"])
    assert sorted(map(key, a.collect())) == sorted(map(key, b.collect()))


def test_pack_rejects_bad_args(spark):
    df = _docs(spark, ["w"])
    with pytest.raises(ValueError, match="budget"):
        pack_documents(df, budget=0)
    with pytest.raises(ValueError, match="n_shards"):
        pack_documents(df, n_shards=0)
    bad = df.withColumnRenamed("doc_id", "pack_id")
    with pytest.raises(ValueError, match="collides"):
        pack_documents(bad, id_col="pack_id")


def test_pack_text_never_enters_shuffle(spark):
    """The operator projects token counts before the shard shuffle: the
    exchange must not carry the text column."""
    import contextlib
    import io

    df = _docs(spark, ["w w", "w"])
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        pack_documents(df, budget=8, n_shards=2).explain("formatted")
    plan = buf.getvalue()
    # collect the detail block of every Exchange node ("(N) Exchange" header
    # through the following blank line) and assert text never rides it
    import re

    blocks, cur, inside = [], [], False
    for line in plan.splitlines():
        if re.match(r"\(\d+\) Exchange", line):
            inside = True
        if inside:
            if line.strip() == "":
                inside = False
                blocks.append("\n".join(cur))
                cur = []
            else:
                cur.append(line)
    if cur:
        blocks.append("\n".join(cur))
    assert blocks, plan  # the shard shuffle must exist
    assert "text" not in "\n".join(blocks), plan
