"""transcripts/coref.py — recency-heuristic pronoun resolution."""

from __future__ import annotations

from nebula_importer_spark.transcripts.coref import resolve_pronouns

SCHEMA = "conv_id string, turn_idx int, pos int, kind string, surface string"


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, SCHEMA)
    return {
        (r.conv_id, r.turn_idx, r.pos): (r.pronoun, r.antecedent, r.ante_turn)
        for r in resolve_pronouns(df, **kw).collect()
    }


def test_resolves_to_most_recent_preceding_entity(spark):
    rows = [
        ("c", 0, 0, "entity", "Ann"),
        ("c", 0, 1, "entity", "Bob"),
        ("c", 0, 2, "pronoun", "he"),    # -> Bob (more recent than Ann)
        ("c", 1, 0, "pronoun", "she"),   # -> Bob still (nothing newer)
        ("c", 1, 1, "entity", "Cara"),
        ("c", 1, 2, "pronoun", "they"),  # -> Cara
    ]
    got = _run(spark, rows)
    assert got[("c", 0, 2)] == ("he", "Bob", 0)
    assert got[("c", 1, 0)] == ("she", "Bob", 0)
    assert got[("c", 1, 2)] == ("they", "Cara", 1)


def test_leading_pronoun_is_kept_unresolved(spark):
    rows = [
        ("c", 0, 0, "pronoun", "it"),
        ("c", 0, 1, "entity", "Ann"),
        ("d", 0, 0, "pronoun", "she"),  # conv with no entities at all
    ]
    got = _run(spark, rows)
    # strictly-preceding frame: the later entity must NOT resolve it
    assert got[("c", 0, 0)] == ("it", None, None)
    assert got[("d", 0, 0)] == ("she", None, None)
    assert len(got) == 2  # entity rows are not emitted


def test_turn_gap_cutoff(spark):
    rows = [
        ("c", 0, 0, "entity", "Ann"),
        ("c", 2, 0, "pronoun", "she"),  # gap 2: inside
        ("c", 3, 0, "pronoun", "it"),   # gap 3: outside
    ]
    got = _run(spark, rows, max_turn_gap=2)
    assert got[("c", 2, 0)] == ("she", "Ann", 0)
    assert got[("c", 3, 0)] == ("it", None, None)
    # unbounded default keeps it
    got = _run(spark, rows)
    assert got[("c", 3, 0)] == ("it", "Ann", 0)


def test_conversations_are_independent(spark):
    rows = [
        ("a", 0, 0, "entity", "Ann"),
        ("b", 5, 0, "pronoun", "she"),  # other conv: must not see Ann
    ]
    got = _run(spark, rows)
    assert got[("b", 5, 0)] == ("she", None, None)


def test_single_window_exchange(spark):
    rows = [("c", 0, 0, "entity", "Ann"), ("c", 1, 0, "pronoun", "she")]
    df = spark.createDataFrame(rows, SCHEMA)
    plan = resolve_pronouns(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1  # one conv-keyed window shuffle
