"""duplicate_spans — exact duplicated-substring span detection.

Reference semantics model: a position is duplicated iff its word n-gram
occurs >= min_count times corpus-wide (within- and cross-document
occurrences both count — the suffix-array criterion of Lee et al. 2022);
consecutive duplicated positions merge into maximal spans covering tokens
[start .. end_gram + n - 1], 1-based inclusive.
"""

from __future__ import annotations

import random
from collections import Counter

import pytest

from nebula_importer_spark.operators.dedup import duplicate_spans


def _ref_spans(docs, n=3, min_count=2):
    """Independent Python model: positional grams -> global counts ->
    duplicated positions -> maximal-run merge."""
    grams = {}
    for did, text in docs:
        toks = text.split()
        grams[did] = [tuple(toks[i : i + n]) for i in range(len(toks) - n + 1)]
    counts = Counter(g for gs in grams.values() for g in gs)
    out = []
    for did, gs in grams.items():
        dup = [i + 1 for i, g in enumerate(gs) if counts[g] >= min_count]
        run = []
        for p in dup:
            if run and p == run[-1] + 1:
                run.append(p)
            else:
                if run:
                    out.append((did, run[0], run[-1] + n - 1, len(run)))
                run = [p]
        if run:
            out.append((did, run[0], run[-1] + n - 1, len(run)))
    return sorted(out)


def _run(spark, docs, **kw):
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    rows = duplicate_spans(df, **kw).collect()
    return sorted(
        (r["doc_id"], r["span_start"], r["span_end"], r["n_dup_grams"]) for r in rows
    )


def test_cross_document_shared_passage(spark):
    docs = [(1, "a b c d e f"), (2, "x y a b c d q")]
    got = _run(spark, docs)
    assert got == [(1, 1, 4, 2), (2, 3, 6, 2)]
    assert got == _ref_spans(docs)


def test_within_document_repetition(spark):
    # "p q r s" repeated inside ONE doc is duplicated by the corpus-wide
    # occurrence criterion even though no other doc shares it
    docs = [(1, "p q r s p q r s"), (2, "totally different words here now")]
    got = _run(spark, docs)
    assert got == [(1, 1, 4, 2), (1, 5, 8, 2)]
    assert got == _ref_spans(docs)


def test_no_duplication_empty_output(spark):
    docs = [(1, "alpha beta gamma delta"), (2, "eps zeta eta theta"), (3, "")]
    assert _run(spark, docs) == []


def test_min_count_raises_bar(spark):
    docs = [(1, "a b c x"), (2, "a b c y"), (3, "a b c z")]
    # "a b c" occurs 3 times: present at min_count=2 and 3, gone at 4
    assert _run(spark, docs, min_count=3) == _ref_spans(docs, min_count=3) != []
    assert _run(spark, docs, min_count=4) == []


def test_short_docs_absent(spark):
    docs = [(1, "a b"), (2, "a b"), (3, "a b c"), (4, "a b c")]
    # docs 1-2 have no 3-gram; docs 3-4 share theirs
    assert _run(spark, docs) == [(3, 1, 3, 1), (4, 1, 3, 1)]


def test_randomized_vs_reference(spark):
    rng = random.Random(47)
    vocab = [f"w{i}" for i in range(12)]  # small vocab -> natural collisions
    docs = []
    for did in range(30):
        toks = [rng.choice(vocab) for _ in range(rng.randint(0, 25))]
        docs.append((did, " ".join(toks)))
    # plant an exact shared passage across three docs
    passage = "s1 s2 s3 s4 s5 s6"
    for did in (30, 31, 32):
        docs.append((did, f"{rng.choice(vocab)} {passage} {rng.choice(vocab)}"))
    for n, mc in ((3, 2), (2, 2), (3, 3), (1, 2)):
        assert _run(spark, docs, n=n, min_count=mc) == _ref_spans(
            docs, n=n, min_count=mc
        ), (n, mc)


def test_validation(spark):
    df = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        duplicate_spans(df, n=0)
    with pytest.raises(ValueError):
        duplicate_spans(df, min_count=1)


def test_gram_strings_never_shuffle(spark):
    df = spark.createDataFrame([(1, "a b c d"), (2, "a b c e")], ["doc_id", "text"])
    plan = duplicate_spans(df)._jdf.queryExecution().executedPlan().toString()
    exchanges = [ln for ln in plan.splitlines() if "Exchange hashpartitioning" in ln]
    assert exchanges, plan
    # exchange keys: the xxhash64 gram key and the doc id — never the gram
    # string column itself
    assert all("_g#" not in ln for ln in exchanges), exchanges
