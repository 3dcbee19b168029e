"""Per-entity KG profile cards (transcripts/entities.py)."""

from nebula_importer_spark.transcripts.entities import entity_cards

TRIPLES = [
    # conv_id, turn_idx, subj, pred, obj
    ("c1", 0, "ann", "works_at", "acme"),
    ("c1", 1, "ann", "works_at", "initech"),
    ("c2", 0, "ann", "knows", "bob"),
    ("c2", 1, "bob", "knows", "ann"),
    ("c3", 0, "bob", "lives_in", "springfield"),
]


def _cards(spark):
    df = spark.createDataFrame(
        TRIPLES, "conv_id string, turn_idx int, subj string, pred string, obj string"
    )
    return {r.entity: r.asDict() for r in entity_cards(df).collect()}


def test_entity_cards_counts(spark):
    got = _cards(spark)
    # every entity that appears in either role gets a card
    assert set(got) == {"ann", "bob", "acme", "initech", "springfield"}
    ann = got["ann"]
    assert (ann["n_subj"], ann["n_obj"]) == (3, 1)
    assert ann["n_preds"] == 2  # works_at + knows across both roles
    assert ann["n_convs"] == 2  # c1, c2
    bob = got["bob"]
    assert (bob["n_subj"], bob["n_obj"]) == (2, 1)
    assert bob["n_convs"] == 2  # c2, c3
    acme = got["acme"]
    assert (acme["n_subj"], acme["n_obj"]) == (0, 1)
    assert acme["top_pred"] == "works_at"


def test_entity_cards_top_pred_tiebreak(spark):
    got = _cards(spark)
    # ann: works_at ×2 beats knows ×2? counts: works_at 2 (subj), knows 2
    # (subj c2 + obj c2) → tie → lexicographically smaller predicate wins
    assert got["ann"]["top_pred"] == "knows"
    # bob: knows ×2 (subj + obj) beats lives_in ×1
    assert got["bob"]["top_pred"] == "knows"


def test_triple_spans(spark):
    from datetime import datetime

    from nebula_importer_spark.transcripts.entities import triple_spans

    t0 = datetime(2024, 1, 1)

    def ts(h):
        return datetime(2024, 1, 1, h)

    triples = spark.createDataFrame(
        [
            ("c1", 0, "ann", "knows", "bob"),
            ("c1", 2, "ann", "knows", "bob"),  # re-asserted later in c1
            ("c2", 0, "ann", "knows", "bob"),  # and again in c2
            ("c2", 1, "bob", "lives_in", "x"),
        ],
        "conv_id string, turn_idx int, subj string, pred string, obj string",
    )
    turn_ts = spark.createDataFrame(
        [
            ("c1", 0, ts(1)),
            ("c1", 1, ts(2)),
            ("c1", 2, ts(3)),
            ("c2", 0, ts(5)),
            ("c2", 1, ts(6)),
        ],
        "conv_id string, turn_idx int, ts timestamp",
    )
    got = {
        (r["subj"], r["pred"], r["obj"]): r.asDict()
        for r in triple_spans(triples, turn_ts).collect()
    }
    ann = got[("ann", "knows", "bob")]
    assert ann["n_support"] == 3 and ann["n_convs"] == 2
    assert (ann["first_ts"], ann["last_ts"]) == (ts(1), ts(5))
    bob = got[("bob", "lives_in", "x")]
    assert bob["n_support"] == 1 and bob["n_convs"] == 1
    assert bob["first_ts"] == bob["last_ts"] == ts(6)


def test_sorted_neighborhood_matches_definition(spark):
    """Prefix-bucketed two-level ranks must equal the single-sort
    definition: every pair within `window` sort positions, exactly
    once, ids ordered by rank."""
    import random
    import string

    from nebula_importer_spark.operators.linking import (
        sorted_neighborhood_pairs,
    )

    rng = random.Random(43)
    rows = [
        (i, "".join(rng.choice(string.ascii_lowercase) for _ in range(4)))
        for i in range(120)
    ]
    rows += [(200, "aaaa"), (201, "aaaa")]  # duplicate keys: id tie-break
    df = spark.createDataFrame(rows, "id long, k string")
    got = sorted(
        (r.id_a, r.id_b, r.rank_dist)
        for r in sorted_neighborhood_pairs(
            df, id_col="id", key_col="k", window=4, prefix_len=1
        ).collect()
    )
    order = sorted(rows, key=lambda t: (t[1], t[0]))
    want = sorted(
        (order[i][0], order[j][0], j - i)
        for i in range(len(order))
        for j in range(i + 1, min(i + 4, len(order)))
    )
    assert got == want
    # a longer prefix must produce the SAME pairs (ranks are global)
    got2 = sorted(
        (r.id_a, r.id_b, r.rank_dist)
        for r in sorted_neighborhood_pairs(
            df, id_col="id", key_col="k", window=4, prefix_len=3
        ).collect()
    )
    assert got2 == want


def test_sorted_neighborhood_validation(spark):
    import pytest

    from nebula_importer_spark.operators.linking import (
        sorted_neighborhood_pairs,
    )

    df = spark.createDataFrame([(1, None)], "id long, k string")
    assert sorted_neighborhood_pairs(
        df, id_col="id", key_col="k"
    ).count() == 0  # null keys excluded
    with pytest.raises(ValueError, match="window"):
        sorted_neighborhood_pairs(df, id_col="id", key_col="k", window=1)
    with pytest.raises(ValueError, match="not in input"):
        sorted_neighborhood_pairs(df, id_col="zz", key_col="k")
