import math
import random

import pytest

from nebula_importer_spark.operators.classify import nb_classify


def _python_nb(train, test, precision=10**6):
    """Independent pure-Python multinomial NB with the same pinned
    contract (add-one smoothing, micro-nat floors, smallest-label ties)."""
    counts, ntok, prior = {}, {}, {}
    vocab = set()
    for _, text, label in train:
        if label is None:
            continue
        prior[label] = prior.get(label, 0) + 1
        for w in (text or "").split():
            counts[(label, w)] = counts.get((label, w), 0) + 1
            ntok[label] = ntok.get(label, 0) + 1
            vocab.add(w)
    d = sum(prior.values())
    v = len(vocab)
    out = {}
    for did, text in test:
        toks = (text or "").split()
        if not toks:
            continue
        scores = {}
        for lab in prior:
            s = math.floor(math.log(prior[lab] / d) * precision)
            for w in toks:
                c = counts.get((lab, w), 0)
                s += math.floor(
                    math.log((c + 1) / (ntok.get(lab, 0) + v)) * precision
                )
            scores[lab] = s
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        margin = ranked[0][1] - ranked[1][1] if len(ranked) > 1 else None
        out[did] = (ranked[0][0], ranked[0][1], margin, len(toks))
    return out


def test_nb_classify_random_parity(spark):
    rng = random.Random(77)
    langs = {
        "aa": ["red", "blue", "green", "stone", "river", "cloud"],
        "bb": ["rot", "blau", "gruen", "stein", "fluss", "wolke"],
        "cc": ["rouge", "bleu", "vert", "pierre", "riviere", "nuage"],
    }
    shared = ["data", "x1", "xy"]
    train, test = [], []
    for i in range(60):
        lab = rng.choice(list(langs))
        words = [rng.choice(langs[lab] + shared) for _ in range(rng.randint(1, 12))]
        train.append((i, " ".join(words), lab))
    for i in range(100, 140):
        lab = rng.choice(list(langs))
        words = [rng.choice(langs[lab] + shared) for _ in range(rng.randint(0, 10))]
        test.append((i, " ".join(words)))
    tr = spark.createDataFrame(train, "doc_id long, text string, label string")
    te = spark.createDataFrame(test, "doc_id long, text string")
    got = {
        r.doc_id: (r.pred_label, r.score_micro, r.margin_micro, r.n_tokens)
        for r in nb_classify(tr, te).collect()
    }
    assert got == _python_nb(train, test)


def test_nb_classify_single_label_and_validation(spark):
    tr = spark.createDataFrame(
        [(1, "a b c", "only")], "doc_id long, text string, label string"
    )
    te = spark.createDataFrame([(2, "a b")], "doc_id long, text string")
    rows = nb_classify(tr, te).collect()
    assert len(rows) == 1 and rows[0].pred_label == "only"
    assert rows[0].margin_micro is None
    with pytest.raises(ValueError, match="not in train"):
        nb_classify(te, te)
    with pytest.raises(ValueError, match="precision"):
        nb_classify(tr, te, precision=0)
