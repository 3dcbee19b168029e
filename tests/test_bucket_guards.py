"""Int64-headroom guards on value-bucketed rank computations.

The shared ``((v - mn) * n_buckets) div (mx - mn + 1)`` bucket math
silently wraps int64 once the value span reaches ``2^62 div n_buckets``
(hash-like longs), producing negative buckets that corrupt the
order-preserving prefix sums — so every such site now routes through
``operators/_buckets.guarded_bucket`` and FAILS LOUDLY instead. These
tests prove: (a) wide spans raise, (b) normal spans are unchanged, and
(c) the zero-total-weight PPS guard raises instead of returning empty.
"""

from __future__ import annotations

import pytest
from pyspark.errors import PySparkException


WIDE = 2**62  # span that must trip every guard (any n_buckets >= 2)


def test_spearman_corr_wide_span_raises(spark):
    from nebula_importer_spark.operators.metrics import spearman_corr

    df = spark.createDataFrame(
        [(0, 1), (WIDE, 2), (5, 3)], "x long, y long"
    )
    with pytest.raises(Exception, match="span too wide"):
        spearman_corr(df, "x", "y").collect()
    # sane spans still produce the exact answer
    ok = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30)], "x long, y long"
    )
    r = spearman_corr(ok, "x", "y").collect()[0]
    assert r.rho == 1.0  # perfectly monotone


def test_quantile_normalize_wide_span_raises(spark):
    from nebula_importer_spark.operators.profile import quantile_normalize

    df = spark.createDataFrame(
        [(1, "g", 0), (2, "g", WIDE), (3, "g", 7)],
        "id long, g string, v long",
    )
    with pytest.raises(Exception, match="span too wide"):
        quantile_normalize(df, "g", "v", "id").collect()


def test_vocab_growth_guard_is_wired(spark):
    """vocab_growth buckets doc ids — plant a hash-like id to trip it."""
    from nebula_importer_spark.operators.text import vocab_growth

    df = spark.createDataFrame(
        [(0, "a b"), (WIDE, "b c")], "doc_id long, text string"
    )
    with pytest.raises(Exception, match="span too wide"):
        vocab_growth(df).collect()


def test_balanced_shards_wide_weight_span_raises(spark):
    from nebula_importer_spark.operators.layout import balanced_shards

    df = spark.createDataFrame(
        [(1, 0), (2, WIDE), (3, 9)], "id long, w long"
    )
    with pytest.raises(Exception, match="span too wide"):
        balanced_shards(df, n_shards=2, id_col="id", weight_col="w").collect()


def test_psi_drift_wide_span_raises(spark):
    from nebula_importer_spark.operators.profile import psi_drift

    df = spark.createDataFrame(
        [("a", 0), ("a", WIDE), ("b", 3)], "g string, v long"
    )
    with pytest.raises(Exception, match="span too wide"):
        psi_drift(df, "g", "v", "a", "b").collect()


def test_isotonic_calibration_wide_span_raises(spark):
    from nebula_importer_spark.operators.metrics import isotonic_calibration

    df = spark.createDataFrame(
        [(0, 0), (WIDE, 1)], "s long, y long"
    )
    with pytest.raises(ValueError, match="span too wide"):
        isotonic_calibration(df, score_col="s", y_col="y")


def test_systematic_sample_zero_total_weight_raises(spark):
    from nebula_importer_spark.operators.sampling import systematic_sample

    df = spark.createDataFrame(
        [(1, 0), (2, 0), (3, 0)], "doc_id long, w long"
    )
    with pytest.raises(PySparkException, match="total weight is 0"):
        systematic_sample(
            df, k=2, id_col="doc_id", weight_col="w"
        ).collect()
    # empty input stays an empty frame (no sample to take, nothing to
    # violate), and a normal weighted input still picks exactly k
    empty = spark.createDataFrame([], "doc_id long, w long")
    assert (
        systematic_sample(empty, k=2, id_col="doc_id", weight_col="w").count()
        == 0
    )
    ok = spark.createDataFrame(
        [(1, 5), (2, 1), (3, 4)], "doc_id long, w long"
    )
    picks = systematic_sample(ok, k=3, id_col="doc_id", weight_col="w")
    assert picks.agg({"n_picks": "sum"}).collect()[0][0] == 3
