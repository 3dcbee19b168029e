"""operators/search.py:inverted_index — posting-list construction."""

from __future__ import annotations

import pytest

from nebula_importer_spark.operators.search import inverted_index


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "the dog"),
            (3, "cat CAT cat"),
            (4, None),
            (5, ""),
        ],
        "doc_id long, text string",
    )


def test_inverted_index_postings_exact(spark):
    out = {
        r.term: (r.doc_freq, r.total_tf, list(r.postings))
        for r in inverted_index(_docs(spark)).collect()
    }
    assert out["the"] == (2, 3, ["1:2", "2:1"])
    assert out["cat"] == (2, 4, ["1:1", "3:3"])  # lowercased merge
    assert out["dog"] == (1, 1, ["2:1"])
    assert "" not in out  # empty/None docs contribute nothing


def test_inverted_index_min_max_df(spark):
    out = inverted_index(_docs(spark), min_df=2)
    terms = {r.term for r in out.collect()}
    assert terms == {"the", "cat"}
    capped = inverted_index(_docs(spark), max_df=1)
    terms = {r.term for r in capped.collect()}
    assert "the" not in terms and "cat" not in terms and "dog" in terms


def test_inverted_index_rejects_bad_args(spark):
    df = _docs(spark)
    with pytest.raises(ValueError):
        inverted_index(df, min_df=0)
    with pytest.raises(ValueError):
        inverted_index(df, min_df=3, max_df=2)
    with pytest.raises(ValueError):
        inverted_index(df, text_col="missing")


def test_inverted_index_single_pair_shuffle(spark):
    # one (term, doc) exchange then one term exchange; postings sorted
    plan = (
        inverted_index(_docs(spark))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") <= 2
