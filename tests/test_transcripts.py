"""North-star pipeline tests: deterministic corpus, stable ordering
invariant, triple extraction P/R ≥ 0.95 vs the independent reference
extractor, and end-to-end materialization with skew present."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from nebula_importer_spark.transcripts.extract import extract_triples, ordered_turns
from nebula_importer_spark.transcripts.generate import gen_corpus_local
from nebula_importer_spark.transcripts.pipeline import TranscriptPipeline
from nebula_importer_spark.transcripts.reference import (
    precision_recall,
    reference_extract,
)


@pytest.fixture(scope="module")
def corpus():
    return gen_corpus_local(seed=42, n_convs=20, turns_per_conv=15, mega_conv_turns=120)


@pytest.fixture(scope="module")
def sdfs(spark, corpus):
    return corpus.to_spark(spark)


def test_generator_deterministic():
    a = gen_corpus_local(seed=7, n_convs=3, turns_per_conv=5)
    b = gen_corpus_local(seed=7, n_convs=3, turns_per_conv=5)
    pd.testing.assert_frame_equal(a.transcripts, b.transcripts)
    pd.testing.assert_frame_equal(a.golden_triples, b.golden_triples)


def test_generator_skew_present(corpus):
    counts = corpus.transcripts.groupby("conv_id").size()
    assert counts["conv_00000"] == 120  # mega-thread
    assert counts.drop("conv_00000").max() == 15


def test_stable_turn_ordering_invariant(spark, sdfs, corpus):
    """Per-turn text equality under stable ordering: rows are shuffled on
    disk; the ordering window must recover exactly the generated sequence."""
    got = (
        ordered_turns(sdfs["transcripts"])
        .filter(F.col("conv_id") == "conv_00003")
        .orderBy("turn_pos")
        .select("turn_idx", "text")
        .collect()
    )
    want = (
        corpus.transcripts[corpus.transcripts.conv_id == "conv_00003"]
        .sort_values("turn_idx")[["turn_idx", "text"]]
        .itertuples(index=False)
    )
    for g, w in zip(got, list(want), strict=True):
        assert g["turn_idx"] == w.turn_idx
        assert g["text"] == w.text  # per-turn text equality


def test_extraction_matches_reference_pr(spark, sdfs, corpus):
    """Engine triples vs independent reference extractor: P/R ≥ 0.95
    (BASELINE.json:metric)."""
    pipe = TranscriptPipeline(spark)
    got = pipe.triples_set(sdfs["transcripts"], sdfs["alias_dict"], sdfs["same_as"])
    want = reference_extract(
        [tuple(r) for r in corpus.transcripts[["conv_id", "turn_idx", "text"]].itertuples(index=False)],
        [tuple(r) for r in corpus.alias_dict.itertuples(index=False)],
        [tuple(r) for r in corpus.same_as.itertuples(index=False)],
    )
    p, r, f1 = precision_recall(got, want)
    assert p >= 0.95, f"precision {p:.3f} < 0.95 (|got|={len(got)}, |want|={len(want)})"
    assert r >= 0.95, f"recall {r:.3f} < 0.95"


def test_extraction_recall_vs_golden(spark, sdfs, corpus):
    """Sanity floor vs generation ground truth (typos make 100% unreachable
    by design; linking should recover most)."""
    pipe = TranscriptPipeline(spark)
    got = pipe.triples_set(sdfs["transcripts"], sdfs["alias_dict"], sdfs["same_as"])
    want = {
        (r.conv_id, r.turn_idx, r.subj, r.pred, r.obj)
        for r in corpus.golden_triples.itertuples(index=False)
    }
    p, r, _ = precision_recall(got, want)
    # 10% of mentions carry a deletion typo; typos on SHORT aliases (e.g.
    # "Pris" vs "Paris": 3-gram Jaccard 0.25) are unlinkable below the 0.5
    # threshold by design — in the engine AND the reference extractor alike
    # (which is why engine-vs-reference P/R stays ≥ 0.95 while the golden
    # ceiling sits lower).
    assert r >= 0.85, f"recall vs golden {r:.3f}"
    assert p >= 0.85, f"precision vs golden {p:.3f}"


def test_end_to_end_materialization(spark, sdfs, tmp_path):
    pipe = TranscriptPipeline(spark)
    res = pipe.run(sdfs["transcripts"], sdfs["alias_dict"], sdfs["same_as"], tmp_path)
    assert res.triples > 0
    assert res.turns == sdfs["transcripts"].count()
    from nebula_importer_spark.plans.merge import TableStore

    store = TableStore(tmp_path / "kg", spark)
    ent = store.read("tags/entity")
    rel = store.read("edges/relation")
    assert set(ent.columns) == {"vid", "kind", "name"}
    assert {"src", "dst", "rank", "pred"} <= set(rel.columns)
    # canonicalization: no __dup entity may survive as a vid
    assert ent.filter(F.col("vid").endswith("__dup")).count() == 0
    # resume: re-run skips extraction/link stages
    res2 = pipe.run(sdfs["transcripts"], sdfs["alias_dict"], sdfs["same_as"], tmp_path, resume=True)
    assert res2.stages.get("stage/surface_triples") is None


def test_extraction_coverage_keeps_zero_yield_convs(spark):
    from nebula_importer_spark.transcripts.pipeline import extraction_coverage

    transcripts = spark.createDataFrame(
        [("a", 0, "x"), ("a", 1, "y"), ("b", 0, "no entities here")],
        "conv_id string, turn_idx int, text string",
    )
    triples = spark.createDataFrame(
        [("a", 0, "e1", "knows", "e2"), ("a", 1, "e1", "uses", "e3")],
        "conv_id string, turn_idx int, subj string, pred string, obj string",
    )
    got = {
        r.conv_id: (r.n_turns, r.n_triples, r.n_entities)
        for r in extraction_coverage(transcripts, triples).collect()
    }
    # conv b yielded nothing: present with zeros, not dropped
    assert got == {"a": (2, 2, 3), "b": (1, 0, 0)}
