"""DSIR importance resampling (operators/dsir.py) — parity against an
independent pure-Python model (hashlib.md5 buckets + math.log floored
micro-nats), plus selection ordering, empty/NULL-text handling, and
validation fail-fasts."""

from __future__ import annotations

import hashlib
import math
import random

import pytest
from pyspark.sql import functions as F

from nebula_importer_spark.operators.dsir import dsir_importance, dsir_topk

WORDS = ["spark", "table", "join", "scan", "la", "mesa", "datos", "agg", "key"]


def _bucket(term: str, salt: str, n_buckets: int) -> int:
    return int(hashlib.md5((salt + term).encode()).hexdigest()[:8], 16) % n_buckets


def _terms(text: str) -> list[str]:
    toks = text.split()
    return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def _py_dsir(raw, target, n_buckets=16, salt="dsir", precision=1_000_000):
    """Independent model: bucket counts with add-one smoothing, per-bucket
    floored micro-nat log-ratio, exact int per-doc sums."""
    ct: dict[int, int] = {}
    cr: dict[int, int] = {}
    for _i, text in raw:
        for t in _terms(text or ""):
            b = _bucket(t, salt, n_buckets)
            cr[b] = cr.get(b, 0) + 1
    for text in target:
        for t in _terms(text or ""):
            b = _bucket(t, salt, n_buckets)
            ct[b] = ct.get(b, 0) + 1
    T, R = sum(ct.values()), sum(cr.values())
    lam = {
        b: math.floor(math.log((ct.get(b, 0) + 1) / (T + n_buckets)) * precision)
        - math.floor(math.log((cr.get(b, 0) + 1) / (R + n_buckets)) * precision)
        for b in range(n_buckets)
    }
    out = {}
    for i, text in raw:
        ts = _terms(text or "")
        w = sum(lam[_bucket(t, salt, n_buckets)] for t in ts)
        out[i] = (len(ts), w)
    return out


def _mk(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_dsir_matches_python_model(spark):
    rng = random.Random(7)
    rows = [
        (
            i,
            " ".join(rng.choice(WORDS) for _ in range(rng.randint(1, 12))),
            rng.choice(["en", "es"]),
        )
        for i in range(60)
    ]
    df = _mk(spark, rows)
    got = {
        r["doc_id"]: (r["n_terms"], r["weight_unats"])
        for r in dsir_importance(
            df, df.filter(F.col("lang") == "en"), n_buckets=16
        ).collect()
    }
    want = _py_dsir(
        [(i, t) for i, t, _l in rows],
        [t for _i, t, l in rows if l == "en"],
        n_buckets=16,
    )
    assert got == want


def test_dsir_ranks_target_like_docs_higher(spark):
    # target speaks "la mesa datos"; raw mixes that with "spark join scan"
    rows = [(i, "la mesa datos la mesa", "x") for i in range(10)]
    rows += [(i + 10, "spark join scan spark join", "x") for i in range(10)]
    raw = _mk(spark, rows)
    target = _mk(spark, [(100 + i, "la mesa datos mesa la datos", "t") for i in range(5)])
    w = {
        r["doc_id"]: r["weight_unats"]
        for r in dsir_importance(raw, target, n_buckets=32).collect()
    }
    assert min(w[i] for i in range(10)) > max(w[i + 10] for i in range(10))
    top = dsir_topk(raw, target, 10, n_buckets=32).collect()
    assert sorted(r["doc_id"] for r in top) == list(range(10))
    # deterministic ordering: weight desc, id asc
    assert [r["doc_id"] for r in top] == sorted(
        range(10), key=lambda i: (-w[i], i)
    )


def test_dsir_empty_and_null_text_present_with_zero_weight(spark):
    raw = _mk(spark, [(1, "spark table", "en"), (2, "", "en"), (3, None, "en")])
    tgt = _mk(spark, [(9, "spark spark", "en")])
    rows = {r["doc_id"]: r for r in dsir_importance(raw, tgt, n_buckets=8).collect()}
    assert set(rows) == {1, 2, 3}
    for i in (2, 3):
        assert rows[i]["n_terms"] == 0
        assert rows[i]["weight_unats"] == 0
        assert rows[i]["avg_logratio"] == 0.0


def test_dsir_weight_sums_int64_and_avg_consistency(spark):
    raw = _mk(spark, [(1, "a b c a b", "en"), (2, "z z z", "en")])
    tgt = _mk(spark, [(9, "a b a b", "en")])
    for r in dsir_importance(raw, tgt, n_buckets=8).collect():
        assert isinstance(r["weight_unats"], int)
        if r["n_terms"]:
            assert r["avg_logratio"] == pytest.approx(
                r["weight_unats"] / (1e6 * r["n_terms"]), abs=1e-6
            )


def test_dsir_validation_errors(spark):
    df = _mk(spark, [(1, "x", "en")])
    with pytest.raises(ValueError, match="n_buckets"):
        dsir_importance(df, df, n_buckets=0)
    with pytest.raises(ValueError, match="not in raw"):
        dsir_importance(df.drop("text"), df)
    with pytest.raises(ValueError, match="not in target"):
        dsir_importance(df, df.drop("text"))
    with pytest.raises(ValueError, match="k must be"):
        dsir_topk(df, df, 0)
