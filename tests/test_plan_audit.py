"""plans/audit.py — the .explain discipline as a reusable gate."""

from pyspark.sql import functions as F

from nebula_importer_spark.plans.audit import plan_audit


def test_plan_audit_counts_shapes(spark):
    a = spark.range(1000).select(
        F.col("id"), (F.col("id") % 7).alias("k")
    )
    b = spark.range(10).select(F.col("id").alias("k"))
    # groupBy -> one shuffle; broadcast join -> broadcast, no extra shuffle
    agg = a.groupBy("k").count().join(F.broadcast(b), "k")
    rep = plan_audit(agg)
    assert rep.shuffle_exchanges == 1
    assert rep.broadcast_hash_joins == 1
    assert rep.broadcasts >= 1
    assert rep.python_evals == 0 and rep.map_in_pandas == 0
    ok, bad = rep.ok(max_shuffles=1, forbid_python=True)
    assert ok and bad == []
    ok2, bad2 = rep.ok(max_shuffles=0)
    assert not ok2 and "shuffle_exchanges=1" in bad2[0]

    # orderBy -> global sort visible and gateable (on an unordered col;
    # Range is already ordered by id, and Catalyst elides that sort)
    srt = a.orderBy("k")
    rs = plan_audit(srt)
    assert rs.global_sorts >= 1
    assert rs.ok(forbid_global_sort=True)[0] is False


def test_plan_audit_pushed_filters_and_python(spark, tmp_path):
    p = str(tmp_path / "t.parquet")
    spark.range(100).select(
        F.col("id"), (F.col("id") * 2).alias("v")
    ).write.parquet(p)
    df = spark.read.parquet(p).filter(F.col("id") > 50).select("v")
    rep = plan_audit(df)
    assert rep.scans == 1
    assert any("id" in f for f in rep.pushed_filters)  # pushdown visible

    # a python UDF is flagged
    from pyspark.sql.types import LongType

    udf = F.udf(lambda x: x + 1, LongType())
    pu = plan_audit(spark.range(10).select(udf("id").alias("x")))
    assert pu.python_evals >= 1
    assert pu.ok(forbid_python=True)[0] is False


def test_plan_audit_operator_shapes_hold(spark):
    """The audit reproduces shapes the suite asserts ad hoc: exact_dedup
    shuffles once on a hash, text ops are map-only."""
    from nebula_importer_spark.operators.dedup import exact_dedup
    from nebula_importer_spark.operators.text import fingerprint

    docs = spark.createDataFrame(
        [(1, "aa"), (2, "aa"), (3, "bb")], "doc_id long, text string"
    )
    rd = plan_audit(exact_dedup(docs))
    assert rd.ok(forbid_python=True)[0]
    mp = plan_audit(docs.select("doc_id", fingerprint("text").alias("f")))
    assert mp.shuffle_exchanges == 0  # map-only stays map-only
