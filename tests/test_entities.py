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
