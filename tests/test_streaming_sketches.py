"""Incremental count-min maintenance: stream/batch sketch equality across
multi-batch arrival (mergeability in anger) and replay idempotence of the
batch-keyed partitions."""

from __future__ import annotations

from pyspark.sql import functions as F

from nebula_importer_spark.operators.sketch import cms_estimate, cms_matrix
from nebula_importer_spark.streaming.sketches import read_cms, run_incremental_cms


def _events(spark, rows):
    return spark.createDataFrame(rows, "event_id long, user_id long")


def _cells(df):
    return {(r.r, r.c): r.cnt for r in df.collect()}


def _stream(spark, path):
    return (
        spark.readStream.schema("event_id long, user_id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )


def test_stream_cms_equals_batch_across_batches(spark, tmp_path):
    indir, out, ckpt = tmp_path / "in", tmp_path / "out", tmp_path / "ckpt"
    drop0 = [(i, i % 17) for i in range(200)]
    drop1 = [(i + 200, (i * 7) % 23) for i in range(150)]
    _events(spark, drop0).coalesce(1).write.parquet(str(indir / "d0"))
    _events(spark, drop1).coalesce(1).write.parquet(str(indir / "d1"))

    seen = run_incremental_cms(
        _stream(spark, str(indir / "d*")),
        str(out),
        str(ckpt),
        col="user_id",
        depth=3,
        width=64,
    )
    assert seen["batches"] == 2

    merged = read_cms(spark, str(out))
    batch = cms_matrix(
        _events(spark, drop0 + drop1), "user_id", depth=3, width=64
    )
    assert _cells(merged) == _cells(batch)

    # and the merged sketch answers point queries like the batch one
    keys = spark.createDataFrame([(5,), (16,), (99,)], "user_id long")
    got = {
        r.user_id: r.est_count
        for r in cms_estimate(merged, keys, "user_id", depth=3, width=64).collect()
    }
    want = {
        r.user_id: r.est_count
        for r in cms_estimate(batch, keys, "user_id", depth=3, width=64).collect()
    }
    assert got == want


def test_stream_cms_replay_idempotent(spark, tmp_path):
    indir, out = tmp_path / "in", tmp_path / "out"
    rows = [(i, i % 9) for i in range(120)]
    _events(spark, rows).coalesce(1).write.parquet(str(indir / "d0"))

    run_incremental_cms(
        _stream(spark, str(indir / "d*")), str(out), str(tmp_path / "c1"),
        col="user_id", depth=3, width=64,
    )
    first = _cells(read_cms(spark, str(out)))
    # fresh checkpoint = full replay; batch-keyed dynamic overwrite must
    # leave the store unchanged, not doubled
    run_incremental_cms(
        _stream(spark, str(indir / "d*")), str(out), str(tmp_path / "c2"),
        col="user_id", depth=3, width=64,
    )
    assert _cells(read_cms(spark, str(out))) == first


def test_stream_hll_equals_batch_across_batches(spark, tmp_path):
    from nebula_importer_spark.operators.sketch import hll_distinct
    from nebula_importer_spark.streaming.sketches import (
        read_hll,
        run_incremental_hll,
    )

    indir, out, ckpt = tmp_path / "hin", tmp_path / "hout", tmp_path / "hckpt"
    drop0 = [(i, i % 300) for i in range(500)]
    drop1 = [(i + 500, (i * 11) % 450) for i in range(400)]
    _events(spark, drop0).coalesce(1).write.parquet(str(indir / "d0"))
    _events(spark, drop1).coalesce(1).write.parquet(str(indir / "d1"))

    seen = run_incremental_hll(
        _stream(spark, str(indir / "d*")),
        str(out),
        str(ckpt),
        col="user_id",
        p=10,
    )
    assert seen["batches"] == 2

    merged = read_hll(spark, str(out), p=10).collect()[0]
    batch = hll_distinct(
        _events(spark, drop0 + drop1), "user_id", p=10
    ).collect()[0]
    # max-merge: streamed registers == batch registers, bit-exact stats
    assert (merged.m, merged.v_zero, merged.s_scaled, merged.est_distinct) \
        == (batch.m, batch.v_zero, batch.s_scaled, batch.est_distinct)


def test_stream_hll_replay_cannot_overcount(spark, tmp_path):
    from nebula_importer_spark.streaming.sketches import (
        read_hll,
        run_incremental_hll,
    )

    indir, out = tmp_path / "hin", tmp_path / "hout"
    rows = [(i, i % 77) for i in range(300)]
    _events(spark, rows).coalesce(1).write.parquet(str(indir / "d0"))

    run_incremental_hll(
        _stream(spark, str(indir / "d*")), str(out), str(tmp_path / "hc1"),
        col="user_id", p=10,
    )
    first = read_hll(spark, str(out), p=10).collect()[0]
    # fresh checkpoint = full replay; max is idempotent, so even WITHOUT
    # the batch-keyed overwrite the estimate could not move — with it the
    # store is unchanged too
    run_incremental_hll(
        _stream(spark, str(indir / "d*")), str(out), str(tmp_path / "hc2"),
        col="user_id", p=10,
    )
    second = read_hll(spark, str(out), p=10).collect()[0]
    assert (first.s_scaled, first.est_distinct) == (
        second.s_scaled, second.est_distinct
    )


def test_incremental_buckets_equals_batch_cusum(spark, tmp_path):
    import datetime

    from pyspark.sql import functions as F

    from nebula_importer_spark.operators.temporal import (
        cusum_change,
        cusum_from_buckets,
    )
    from nebula_importer_spark.streaming.sketches import (
        read_cusum,
        run_incremental_buckets,
    )

    base = datetime.datetime(2024, 5, 1)
    rows = []
    # 'svc': level shift at hour 30; 'bg': flat
    for h in range(60):
        n = 2 if h < 30 else 9
        for i in range(n):
            rows.append((f"e{h}_{i}", base + datetime.timedelta(hours=h, minutes=i), "svc"))
        rows.append((f"b{h}", base + datetime.timedelta(hours=h), "bg"))
    df = spark.createDataFrame(rows, "event_id string, ts timestamp, event_type string")
    src_dir = tmp_path / "src"
    # several files so the stream sees multiple micro-batches
    df.repartition(5).write.parquet(str(src_dir))

    stream = (
        spark.readStream.format("parquet")
        .schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .load(str(src_dir))
    )
    res = run_incremental_buckets(
        stream,
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
        ts_col="ts",
        key_col="event_type",
        bucket_sec=3600,
    )
    assert res["batches"] >= 2  # genuinely incremental
    got = {
        r.event_type: r.asDict()
        for r in read_cusum(
            spark, str(tmp_path / "out"), key_col="event_type"
        ).collect()
    }
    want = {
        r.event_type: r.asDict()
        for r in cusum_change(df, bucket_sec=3600).collect()
    }
    assert got == want
    # geometry: for a sustained up-shift the positive statistic peaks at
    # the LAST bucket, while the negative statistic (pre-shift deficit)
    # peaks exactly AT the change point — that's the detected shift
    first = int(base.replace(tzinfo=datetime.timezone.utc).timestamp()) // 3600
    assert got["svc"]["up_bucket"] == first + 59
    assert got["svc"]["down_bucket"] == first + 29
    assert got["svc"]["down_stat"] > 0

    # duplicate (key,bucket) partials re-sum: feeding split halves equals whole
    buckets = (
        df.select(
            F.col("event_type").alias("key"),
            F.floor(F.unix_timestamp("ts") / 3600).cast("long").alias("bucket"),
        )
        .groupBy("key", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    halves = buckets.withColumn("n", F.col("n") - F.lit(1)).filter("n > 0").unionByName(
        buckets.select("key", "bucket", F.lit(1).cast("long").alias("n"))
    )
    a = {r.key: r.asDict() for r in cusum_from_buckets(buckets).collect()}
    b = {r.key: r.asDict() for r in cusum_from_buckets(halves).collect()}
    # keys where n-1 dropped a bucket entirely differ; restrict to svc which
    # has n >= 2 everywhere
    assert a["svc"] == b["svc"]


def test_cusum_from_buckets_validation(spark):
    import pytest

    from nebula_importer_spark.operators.temporal import cusum_from_buckets

    df = spark.createDataFrame([("k", 1, 2)], "key string, bucket long, n long")
    with pytest.raises(ValueError, match="max_span_buckets"):
        cusum_from_buckets(df, max_span_buckets=0)
    with pytest.raises(ValueError, match="not in input"):
        cusum_from_buckets(df, n_col="zz")


def test_incremental_kmv_stream_equals_batch_and_replay(spark, tmp_path):
    import shutil

    from pyspark.sql import functions as F

    from nebula_importer_spark.operators.sketch import kmv_distinct
    from nebula_importer_spark.streaming.sketches import (
        read_kmv,
        run_incremental_kmv,
    )

    src = tmp_path / "src"
    rows = spark.range(3000).select(
        (F.col("id") % 3).cast("string").alias("g"),
        (F.col("id") % 700).alias("v"),
    )
    # three files -> three micro-batches under maxFilesPerTrigger=1
    rows.repartition(3).write.mode("overwrite").parquet(str(src))

    stream = (
        spark.readStream.format("parquet")
        .schema("g string, v long")
        .option("maxFilesPerTrigger", 1)
        .load(str(src))
    )
    out, ckpt = tmp_path / "out", tmp_path / "ckpt"
    res = run_incremental_kmv(
        stream, str(out), str(ckpt), col="v", k=64, group_cols=["g"]
    )
    assert res["batches"] >= 2  # genuinely multi-batch

    got = {
        r.g: (r.n_kept, r.est_distinct)
        for r in read_kmv(spark, str(out), k=64, group_cols=["g"]).collect()
    }
    want = {
        r.g: (r.n_kept, r.est_distinct)
        for r in kmv_distinct(rows, "v", k=64, group_cols=["g"]).collect()
    }
    assert got == want  # stream == batch, bit-exact

    # replay idempotence: wipe the checkpoint, re-drain everything
    shutil.rmtree(ckpt)
    stream2 = (
        spark.readStream.format("parquet")
        .schema("g string, v long")
        .option("maxFilesPerTrigger", 1)
        .load(str(src))
    )
    run_incremental_kmv(
        stream2, str(out), str(ckpt), col="v", k=64, group_cols=["g"]
    )
    got2 = {
        r.g: (r.n_kept, r.est_distinct)
        for r in read_kmv(spark, str(out), k=64, group_cols=["g"]).collect()
    }
    assert got2 == want
