"""Blocklist phrase-tagging operator (operators/blocklist.py)."""

import pytest

from nebula_importer_spark.operators.blocklist import (
    blocklist_hits,
    blocklist_summary,
)


def _py_hits(docs, phrases):
    """Reference: token-boundary matching via normalized substring."""
    out = set()
    for doc_id, text in docs:
        norm = " " + " ".join((text or "").split()) + " "
        for ph in phrases:
            p = " ".join(ph.split())
            if p and (" " + p + " ") in norm:
                out.add((doc_id, p))
    return out


DOCS = [
    (1, "the spark engine runs a big query fast"),
    (2, "bigquery is one word and sparkly is not spark"),  # boundary traps
    (3, "a big   query\twith messy   whitespace"),  # run-collapse
    (4, None),
    (5, ""),
    (6, "big query big query big query"),  # repeats count once per phrase
    (7, "query big"),  # order matters: not a hit for 'big query'
]
PHRASES = ["spark", "big query", "nosuchphrase", "  big   query  "]


def test_blocklist_hits_matches_reference(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        (r.doc_id, r.phrase)
        for r in blocklist_hits(df, PHRASES).collect()
    }
    assert got == _py_hits(DOCS, PHRASES)
    # the traps, explicitly: substrings of words never match
    assert (2, "spark") in got  # trailing standalone token
    assert (2, "big query") not in got
    assert (3, "big query") in got  # whitespace normalization on both sides
    assert (7, "big query") not in got


def test_blocklist_phrase_table_input_and_dedup(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    # phrase TABLE (the scale path) with duplicates + empties + NULL
    pdf = spark.createDataFrame(
        [("spark",), ("spark",), ("",), (None,), (" big  query ",)],
        "phrase string",
    )
    got = sorted(
        (r.doc_id, r.phrase) for r in blocklist_hits(df, pdf).collect()
    )
    assert got == sorted(_py_hits(DOCS, ["spark", "big query"]))
    # normalized-distinct phrases: no duplicate hit rows
    assert len(got) == len(set(got))


def test_blocklist_summary_zeros_and_flags(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_blocked, r.blocked)
        for r in blocklist_summary(df, PHRASES).collect()
    }
    assert set(got) == {d for d, _ in DOCS}  # clean docs keep a row
    assert got[1] == (2, True)
    assert got[4] == (0, False) and got[5] == (0, False)
    assert got[6] == (1, True)  # distinct phrases, not occurrences


def test_blocklist_reserved_names_rejected(spark):
    df = spark.createDataFrame([(1, "x")], "phrase long, text string")
    with pytest.raises(ValueError, match="reserved"):
        blocklist_hits(df, ["x"], id_col="phrase")


def test_blocklist_no_cartesian_plan(spark):
    """The candidate funnel must be equi-joins — a doc×phrase nested-loop
    product is exactly what the operator exists to avoid."""
    import contextlib
    import io

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    out = blocklist_hits(df, PHRASES)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
