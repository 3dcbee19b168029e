"""Unit tests for the corpus-QA operators added in round 3: Gopher-style
repetition signals, eval-set decontamination, and BM25 keyword scoring."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(
        [
            (1, "a a b"),
            (2, "x y x y x"),
            (3, ""),
            (4, None),
            (5, "solo"),
            (6, "  lead  and   trail  "),
        ],
        "doc_id long, text string",
    )


def test_dup_token_fraction(spark, docs):
    from nebula_importer_spark.operators.text import dup_token_fraction

    got = {
        r.doc_id: r.f
        for r in docs.select(
            "doc_id", F.round(dup_token_fraction("text"), 6).alias("f")
        ).collect()
    }
    assert got[1] == pytest.approx(1 / 3)
    assert got[2] == pytest.approx(3 / 5)
    assert got[3] == 0.0  # empty
    assert got[4] == 0.0  # null
    assert got[5] == 0.0  # single token
    assert got[6] == 0.0  # whitespace runs don't create empty tokens


def test_top_ngram_stats(spark, docs):
    from nebula_importer_spark.operators.text import top_ngram_stats

    rows = {r.doc_id: r for r in top_ngram_stats(docs, n=2).collect()}
    # doc 1: grams 'a a' and 'a b' tie at 1 -> lexicographically largest wins
    assert rows[1].top_gram == "a b" and rows[1].top_n == 1
    assert rows[1].top_gram_char_frac == pytest.approx(3 / 5)
    # doc 2: 'x y' x2 vs 'y x' x2 tie -> 'y x'; coverage 2*3/9
    assert rows[2].top_gram == "y x" and rows[2].top_n == 2
    assert rows[2].top_gram_char_frac == pytest.approx(6 / 9)
    # docs with < n tokens are absent (oracle's unnest mirrors this)
    assert 3 not in rows and 4 not in rows and 5 not in rows
    # doc 6: tokens ['lead','and','trail'] -> both grams unique; largest gram
    assert rows[6].top_gram == "lead and" and rows[6].top_n == 1


def test_ngram_overlap_and_contaminated_ids(spark):
    from nebula_importer_spark.operators.decontaminate import (
        contaminated_ids,
        ngram_overlap,
    )

    corpus = spark.createDataFrame(
        [(10, "p q r s t"), (11, "zz yy xx"), (12, "q r s only here")],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(1, "q r s t u"), (2, "totally disjoint words")],
        "eval_id long, text string",
    )
    pairs = {
        (r.doc_id, r.eval_id): r.n_overlap
        for r in ngram_overlap(corpus, ev, n=3).collect()
    }
    # doc 10 shares 'q r s' and 'r s t' with eval 1; doc 12 shares 'q r s'
    assert pairs == {(10, 1): 2, (12, 1): 1}
    # min_overlap filters; broadcast off must agree with broadcast on
    strict = ngram_overlap(corpus, ev, n=3, min_overlap=2, broadcast_eval=False)
    assert [(r.doc_id, r.eval_id, r.n_overlap) for r in strict.collect()] == [
        (10, 1, 2)
    ]
    assert sorted(r.doc_id for r in contaminated_ids(
        ngram_overlap(corpus, ev, n=3)).collect()) == [10, 12]


def test_ngram_overlap_null_and_short_docs(spark):
    from nebula_importer_spark.operators.decontaminate import ngram_overlap

    corpus = spark.createDataFrame(
        [(1, None), (2, "too short"), (3, "a b c")], "doc_id long, text string"
    )
    ev = spark.createDataFrame([(9, "a b c d")], "eval_id long, text string")
    got = ngram_overlap(corpus, ev, n=3).collect()
    assert [(r.doc_id, r.eval_id, r.n_overlap) for r in got] == [(3, 9, 1)]


def test_corpus_filter_flags(spark):
    from nebula_importer_spark.operators.text import corpus_filter_flags

    long_ok = (
        "the quick brown fox jumps over a lazy dog and it runs far "
        "because that open field is full of fresh air for everyone here"
    )  # 24 distinct tokens: no rule fires
    docs = spark.createDataFrame(
        [
            (1, "way too short"),
            (2, long_ok),  # ≥20 tokens, stopwords, low symbols -> keep
            (3, "the " + "!@#$%^&*()" * 40 + " " + "word " * 25),  # symbols
            (4, ("dup " * 30) + "the of and is it that in to for a"),  # repetition
            (5, "alpha beta gamma delta epsilon zeta eta theta iota kappa "
                "lamda mu nu xi omicron pi rho sigma tau upsilon"),  # no stopwords
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in corpus_filter_flags(docs).collect()}
    assert rows[1].reject_reason == "too_short" and not rows[1].keep
    assert rows[2].keep and rows[2].reject_reason is None
    assert rows[3].reject_reason == "high_symbol"
    assert rows[4].reject_reason == "repetition"
    assert rows[5].reject_reason == "low_stopword"
    # rule ORDER: doc 1 is also stopword-poor, but too_short wins (first rule)
    assert rows[1].reject_reason == "too_short"


def test_ngram_containment_pairs(spark):
    from nebula_importer_spark.operators.dedup import ngram_containment_pairs

    small = "alpha beta gamma delta epsilon"  # 3 distinct 3-grams
    big = small + " zeta eta theta iota kappa lamda mu nu xi omicron"
    docs = spark.createDataFrame(
        [(1, small), (2, big), (3, "totally different words here now")],
        "doc_id long, text string",
    )
    rows = {(r.id_a, r.id_b): r.containment for r in
            ngram_containment_pairs(docs, n=3, threshold=0.9).collect()}
    # small's 3 grams all inside big -> containment 1.0; Jaccard is only 3/13
    assert rows == {(1, 2): pytest.approx(1.0)}
    from nebula_importer_spark.operators.dedup import ngram_jaccard_pairs

    jac = ngram_jaccard_pairs(docs, n=3, threshold=0.9).collect()
    assert jac == []  # the pair Jaccard misses at the same threshold


def test_domain_vocab_stats(spark):
    from nebula_importer_spark.operators.text import domain_vocab_stats

    docs = spark.createDataFrame(
        [
            (1, "a", "x y x"),
            (2, "a", "x z"),
            (3, "b", ""),
            (4, "b", None),
        ],
        "doc_id long, source string, text string",
    )
    rows = {r.source: r for r in domain_vocab_stats(docs).collect()}
    assert (rows["a"].n_docs, rows["a"].total_tokens, rows["a"].vocab) == (2, 5, 3)
    assert rows["a"].ttr == pytest.approx(3 / 5)
    # empty domain: vocab 0, ttr 0 (left join + zero guard)
    assert (rows["b"].n_docs, rows["b"].total_tokens, rows["b"].vocab) == (2, 0, 0)
    assert rows["b"].ttr == 0.0


def test_token_budget_sample_matches_single_window(spark):
    """The two-level prefix sum must equal the naive one-window cumsum."""
    import hashlib

    from nebula_importer_spark.operators.sampling import token_budget_sample

    rows = [(i, f"d{i % 3}", "tok " * (5 + i % 17)) for i in range(120)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")

    def naive(budget):
        per_dom: dict[str, list[tuple[str, int, int]]] = {}
        for i, dom, text in rows:
            k = hashlib.md5(f"budget{i}".encode()).hexdigest()
            per_dom.setdefault(dom, []).append((k, i, len(text.split())))
        keep = {}
        for dom, docs in per_dom.items():
            cum = 0
            for k, i, nt in sorted(docs):
                cum += nt
                if cum > budget:
                    break
                keep[i] = cum
        return keep

    for budget, n_buckets in ((0, 64), (37, 64), (200, 2), (10**6, 16)):
        got = {
            r.doc_id: r.cum_tokens
            for r in token_budget_sample(
                df, budget, n_buckets=n_buckets
            ).collect()
        }
        assert got == naive(budget), (budget, n_buckets)


def test_token_budget_sample_validates(spark):
    from nebula_importer_spark.operators.sampling import token_budget_sample

    df = spark.createDataFrame([(1, "a", "x")], "doc_id long, source string, text string")
    with pytest.raises(ValueError):
        token_budget_sample(df, -1)
    with pytest.raises(ValueError):
        token_budget_sample(df, 10, n_buckets=3)  # does not divide 65536
    # precomputed token column path; a null count consumes 0 budget
    df2 = spark.createDataFrame(
        [(1, "a", 5), (2, "a", 7), (3, "a", None)],
        "doc_id long, source string, nt long",
    )
    got = token_budget_sample(df2, 12, tokens_col="nt").collect()
    assert sorted(r.doc_id for r in got) == [1, 2, 3]
    assert max(r.cum_tokens for r in got) == 12
    # decontamination: identical id/eval_id column names are rejected
    from nebula_importer_spark.operators.decontaminate import ngram_overlap

    with pytest.raises(ValueError):
        ngram_overlap(df, df, eval_id_col="doc_id")


def _bm25(tf, df, n, dl, avgdl, k1=1.2, b=0.75):
    idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    return idf * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))


def test_bm25_scores(spark):
    from nebula_importer_spark.operators.search import bm25_scores

    corp = spark.createDataFrame(
        [
            (1, "spark spark fast"),
            (2, "slow table"),
            (3, "spark table"),
            (4, "nothing relevant"),
            (5, None),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.score for r in bm25_scores(corp, ["Spark", "table"]).collect()}
    n, avgdl = 5, (3 + 2 + 2 + 2 + 0) / 5
    assert set(got) == {1, 2, 3}  # score>0 only; null/miss docs absent
    assert got[1] == pytest.approx(_bm25(2, 2, n, 3, avgdl))
    assert got[2] == pytest.approx(_bm25(1, 2, n, 2, avgdl))
    assert got[3] == pytest.approx(
        _bm25(1, 2, n, 2, avgdl) + _bm25(1, 2, n, 2, avgdl)
    )
    # word boundaries: 'spark' must not match inside 'sparkle'
    corp2 = spark.createDataFrame([(1, "sparkle")], "doc_id long, text string")
    assert bm25_scores(corp2, ["spark"]).count() == 0
    with pytest.raises(ValueError):
        bm25_scores(corp, [])


def test_word_ngrams_no_phantom_tokens(spark):
    """Leading/trailing non-space whitespace must not create empty tokens or
    phantom grams (F.trim strips spaces only; the \\S+-based oracles never
    see them)."""
    from nebula_importer_spark.operators.linking import word_ngrams

    df = spark.createDataFrame(
        [(1, "\ta b c"), (2, "a b c\n"), (3, "\t\n"), (4, "")],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: sorted(r.g)
        for r in df.select("doc_id", word_ngrams(F.col("text"), 3).alias("g")).collect()
    }
    assert got[1] == ["a b c"]  # no ' a b'
    assert got[2] == ["a b c"]
    assert got[3] == [] and got[4] == []
    uni = {
        r.doc_id: sorted(r.g)
        for r in df.select("doc_id", word_ngrams(F.col("text"), 1).alias("g")).collect()
    }
    assert uni[3] == [] and uni[4] == []  # no '' unigram


def test_bm25_non_word_boundary_terms(spark):
    """Terms starting/ending with non-word chars ('c++', '.net') must match;
    \\b next to a non-word char can never match."""
    from nebula_importer_spark.operators.search import bm25_scores

    df = spark.createDataFrame(
        [(1, "use c++ daily"), (2, "prefer rust"), (3, "the .net runtime")],
        "doc_id long, text string",
    )
    got = {r.doc_id for r in bm25_scores(df, ["c++"]).collect()}
    assert got == {1}
    got = {r.doc_id for r in bm25_scores(df, [".net"]).collect()}
    assert got == {3}
    # \b is still honored on word-char sides: 'rust' ⊄ 'prefer rusty'
    got = {r.doc_id for r in bm25_scores(df.withColumn(
        "text", F.regexp_replace("text", "rust$", "rusty")), ["rust"]).collect()}
    assert got == set()

    with pytest.raises(ValueError):
        bm25_scores(df, [""])
    with pytest.raises(ValueError):
        bm25_scores(df, ["ok", "  "])


def test_bm25_all_empty_corpus_returns_nothing(spark):
    """avgdl == 0 must not produce NaN scores that pass `score > 0`."""
    from nebula_importer_spark.operators.search import bm25_scores

    df = spark.createDataFrame(
        [(1, ""), (2, None), (3, "   ")], "doc_id long, text string"
    )
    assert bm25_scores(df, ["anything"]).count() == 0


def test_token_budget_sample_null_domain_kept(spark):
    """NULL-domain rows form a real group (window PARTITION BY semantics);
    the offsets join must be null-safe, not silently drop them."""
    from nebula_importer_spark.operators.sampling import token_budget_sample

    df = spark.createDataFrame(
        [(1, None, "one two three"), (2, None, "four five"), (3, "en", "a b c d")],
        "doc_id long, source string, text string",
    )
    out = token_budget_sample(df, 100, n_buckets=4)
    rows = {r.doc_id: r for r in out.collect()}
    assert set(rows) == {1, 2, 3}
    # the two NULL-domain docs share one running sum
    assert {rows[1].cum_tokens, rows[2].cum_tokens} == {3, 5} or {
        rows[1].cum_tokens,
        rows[2].cum_tokens,
    } == {2, 5}


def test_token_budget_sample_column_collisions(spark):
    from nebula_importer_spark.operators.sampling import token_budget_sample

    pre = spark.createDataFrame(
        [(1, "en", 7), (2, "en", 5)], "doc_id long, source string, n_tokens long"
    )
    # precomputed counts: tokens_col='n_tokens' is the documented path
    out = token_budget_sample(pre, 100, tokens_col="n_tokens", n_buckets=4)
    assert out.count() == 2 and "cum_tokens" in out.columns
    # ...but an ambiguous pre-existing n_tokens without tokens_col must raise
    with pytest.raises(ValueError, match="n_tokens"):
        token_budget_sample(
            pre.withColumn("text", F.lit("a b")), 100, n_buckets=4
        )
    # reserved/output name collisions fail fast, not mid-plan
    clash = spark.createDataFrame(
        [(1, "en", "a", 9)], "doc_id long, source string, text string, cum_tokens long"
    )
    with pytest.raises(ValueError, match="cum_tokens"):
        token_budget_sample(clash, 100, n_buckets=4)


def test_token_budget_sample_null_id_kept(spark):
    """A NULL id row must be kept AND counted — not counted-but-dropped
    (the md5 key hashes NULL ids under a reserved sentinel, so the bucket
    join never sees a NULL key)."""
    from nebula_importer_spark.operators.sampling import token_budget_sample

    df = spark.createDataFrame(
        [(1, "en", "one two three"), (None, "en", "four five"), (3, "en", "a b")],
        "doc_id long, source string, text string",
    )
    out = token_budget_sample(df, 100, n_buckets=4).collect()
    assert len(out) == 3
    assert sorted(r.cum_tokens for r in out)[-1] == 7  # all 3+2+2 counted
    # and the NULL-id row is genuinely present
    assert any(r.doc_id is None for r in out)


def test_bm25_b_one_empty_doc_no_division_hole(spark):
    """b=1.0 gives norm == 0 for an empty doc; the tf>0 short-circuit must
    keep that row out of the division entirely (ANSI sessions would raise
    DIVIDE_BY_ZERO; ANSI-off would pass only by 0/0→NULL accident)."""
    from nebula_importer_spark.operators.search import bm25_scores

    df = spark.createDataFrame(
        [(1, "spark rules"), (2, ""), (3, None)], "doc_id long, text string"
    )
    got = {r.doc_id for r in bm25_scores(df, ["spark"], b=1.0).collect()}
    assert got == {1}


def test_ngram_overlap_rejects_reserved_scratch_names(spark):
    """id columns named after internal scratch columns must fail fast with
    a clear error, not produce ambiguous mid-plan duplicates (ADVICE r3)."""
    import pytest

    from nebula_importer_spark.operators.decontaminate import ngram_overlap

    df = spark.createDataFrame([("a", "x y z")], "_g string, text string")
    ev = spark.createDataFrame([("e", "x y z")], "eval_id string, text string")
    with pytest.raises(ValueError, match="reserved scratch name"):
        ngram_overlap(df, ev, id_col="_g")
    ev2 = spark.createDataFrame([("e", "x y z")], "_h string, text string")
    ok = spark.createDataFrame([("a", "x y z")], "doc_id string, text string")
    with pytest.raises(ValueError, match="reserved scratch name"):
        ngram_overlap(ok, ev2, eval_id_col="_h")


# ---------------------------------------------------------------------------
# topic_tiles (TextTiling fixed-block segmentation)
# ---------------------------------------------------------------------------


def _tiles(spark, rows, **kw):
    from nebula_importer_spark.operators.text import topic_tiles

    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {
        (r.doc_id, r.seg_id): (r.start_blk, r.end_blk, r.n_blocks)
        for r in topic_tiles(df, **kw).collect()
    }


def test_topic_tiles_boundary_at_cohesion_drop(spark):
    # blocks of 4 tokens: two cohesive blocks on vocab A, then a hard
    # topic shift to vocab B -> boundary exactly at block 2
    text = "cat dog cat bird dog cat bird bird car bus car train bus car bus bus"
    got = _tiles(spark, [(1, text)], block_tokens=4)
    assert got == {(1, 1): (0, 1, 2), (1, 2): (2, 3, 2)}


def test_topic_tiles_single_block_and_empty(spark):
    got = _tiles(spark, [(1, "a b c"), (2, ""), (3, None)], block_tokens=16)
    # short doc = one block = one segment; empty/null text = no tokens = no rows
    assert got == {(1, 1): (0, 0, 1)}


def test_topic_tiles_threshold_extremes(spark):
    text = " ".join(f"w{i}" for i in range(32))  # fully disjoint blocks
    # threshold 0: nothing is ever below it -> one segment
    got = _tiles(spark, [(1, text)], block_tokens=8, threshold_scaled=0)
    assert got == {(1, 1): (0, 3, 4)}
    # threshold above scale: every adjacency is a boundary
    got = _tiles(
        spark, [(1, text)], block_tokens=8, threshold_scaled=10**12 + 1
    )
    assert got == {(1, s): (s - 1, s - 1, 1) for s in range(1, 5)}


def test_topic_tiles_jaccard_is_exact_integer(spark):
    # adjacent 4-token blocks: {a,b,c,d} vs {c,d,e,f} -> J = 2/6;
    # scaled floor = 333333333333 < 550000000000 default threshold -> split
    text = "a b c d c d e f"
    got = _tiles(spark, [(1, text)], block_tokens=4)
    assert got == {(1, 1): (0, 0, 1), (1, 2): (1, 1, 1)}
    # raise: with threshold 1/3 exactly, 2/6 floor is NOT below -> one segment
    got = _tiles(spark, [(1, text)], block_tokens=4,
                 threshold_scaled=333_333_333_333)
    assert got == {(1, 1): (0, 1, 2)}


def test_topic_tiles_validation(spark):
    import pytest

    from nebula_importer_spark.operators.text import topic_tiles

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        topic_tiles(df, block_tokens=0)
    df2 = spark.createDataFrame([(1, "x")], "blk long, text string")
    with pytest.raises(ValueError):
        topic_tiles(df2, id_col="blk")


# ---------------------------------------------------------------------------
# strip_boilerplate — line-level cross-document dedup


def _bp_docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_strip_boilerplate_basic(spark):
    from nebula_importer_spark.operators.text import strip_boilerplate

    rows = [
        (1, "cookie banner\nreal content one\nfooter"),
        (2, "cookie banner\nreal content two\nfooter"),
        (3, "totally unique document"),
    ]
    got = {
        r.doc_id: (r.clean_text, r.n_lines, r.n_dropped)
        for r in strip_boilerplate(_bp_docs(spark, rows)).collect()
    }
    assert got == {
        1: ("real content one", 3, 2),
        2: ("real content two", 3, 2),
        3: ("totally unique document", 1, 0),
    }


def test_strip_boilerplate_blank_trim_and_within_doc(spark):
    from nebula_importer_spark.operators.text import strip_boilerplate

    rows = [
        # within-doc repetition does NOT make a line boilerplate (df=1)
        (1, "chorus\nchorus\nchorus\nverse"),
        # blank lines are never dropped; ' header ' trims to match 'header'
        (2, " header \n\nbody two"),
        (3, "header\n\nbody three"),
        (4, None),
    ]
    got = {
        r.doc_id: (r.clean_text, r.n_lines, r.n_dropped)
        for r in strip_boilerplate(_bp_docs(spark, rows)).collect()
    }
    assert got[1] == ("chorus\nchorus\nchorus\nverse", 4, 0)
    assert got[2] == ("\nbody two", 3, 1)
    assert got[3] == ("\nbody three", 3, 1)
    assert got[4] == ("", 1, 0)


def test_strip_boilerplate_df_threshold_and_order(spark):
    from nebula_importer_spark.operators.text import strip_boilerplate

    rows = [(i, f"shared\nuniq{i}\nshared tail {i % 2}") for i in range(4)]
    got = {
        r.doc_id: r.clean_text
        for r in strip_boilerplate(_bp_docs(spark, rows), max_line_df=2).collect()
    }
    # 'shared' df=4 > 2 → dropped; 'shared tail 0/1' df=2 → kept
    for i in range(4):
        assert got[i] == f"uniq{i}\nshared tail {i % 2}"


def test_strip_boilerplate_shuffles_hash_not_line(spark):
    from nebula_importer_spark.operators.text import strip_boilerplate

    df = _bp_docs(spark, [(1, "a\nb"), (2, "a\nc")])
    plan = strip_boilerplate(df)._jdf.queryExecution().executedPlan().toString()
    exchanges = [ln for ln in plan.splitlines() if "Exchange hashpartitioning" in ln]
    assert exchanges, plan
    assert all("_line#" not in ln and "_t#" not in ln for ln in exchanges), exchanges
    assert "xxhash64" in plan


def test_strip_boilerplate_validation(spark):
    from nebula_importer_spark.operators.text import strip_boilerplate

    df = _bp_docs(spark, [(1, "x")])
    with pytest.raises(ValueError, match="max_line_df"):
        strip_boilerplate(df, max_line_df=0)
    with pytest.raises(ValueError, match="not in input"):
        strip_boilerplate(df, text_col="zz")


# ---------------------------------------------------------------------------
# hashed_features — hashing-trick bag-of-terms featurization


def _hf_model(rows, n_buckets=16, use_bigrams=True, salt="hf"):
    import hashlib
    import re as _re

    out = {}
    for did, text in rows:
        toks = _re.findall(r"[^\t\n\f\r ]+", text or "")
        terms = list(toks)
        if use_bigrams:
            terms += [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        vec = [0] * n_buckets
        for t in terms:
            h = int(hashlib.md5((salt + t).encode()).hexdigest()[:8], 16)
            vec[h % n_buckets] += 1
        out[did] = (vec, len(terms))
    return out


def test_hashed_features_matches_model(spark):
    from nebula_importer_spark.operators.text import hashed_features

    rows = [
        (1, "the quick brown fox"),
        (2, "the the the"),
        (3, ""),
        (4, None),
        (5, "solo"),
    ]
    df = _bp_docs(spark, rows)
    for bg in (True, False):
        got = {
            r.doc_id: (list(r.features), r.n_terms)
            for r in hashed_features(
                df, n_buckets=16, use_bigrams=bg
            ).collect()
        }
        assert got == _hf_model(rows, 16, bg), bg
    # empty/null docs present with zero vectors
    assert got[3] == ([0] * 16, 0) and got[4] == ([0] * 16, 0)


def test_hashed_features_random_parity(spark):
    import random

    from nebula_importer_spark.operators.text import hashed_features

    rng = random.Random(23)
    words = [f"w{i}" for i in range(40)]
    rows = [
        (i, " ".join(rng.choice(words) for _ in range(rng.randint(0, 30))))
        for i in range(30)
    ]
    got = {
        r.doc_id: (list(r.features), r.n_terms)
        for r in hashed_features(_bp_docs(spark, rows), n_buckets=32).collect()
    }
    assert got == _hf_model(rows, 32)


def test_hashed_features_validation(spark):
    from nebula_importer_spark.operators.text import hashed_features

    df = _bp_docs(spark, [(1, "x")])
    with pytest.raises(ValueError, match="n_buckets"):
        hashed_features(df, n_buckets=0)
    with pytest.raises(ValueError, match="not in input"):
        hashed_features(df, id_col="zz")


# ----------------------------------------------------------- normalize_text


def test_normalize_case_accent_whitespace(spark):
    from nebula_importer_spark.operators.text import normalize_text

    df = spark.createDataFrame(
        [
            (1, "  Héllo\t\tWÖRLD  "),
            (2, "hello world"),
            (3, "Grüße — Straße"),
            (4, "a\x00b\x0bc"),
            (5, None),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.n for r in df.select("doc_id", normalize_text("text").alias("n")).collect()}
    assert got[1] == "hello world"
    assert got[1] == got[2]  # case/accent/ws variants become EXACT dups
    assert got[3] == "grusse — strasse"
    assert got[4] == "a b c"  # controls are separators, not glue
    assert got[5] is None


def test_normalize_drop_punct_and_composition(spark):
    from nebula_importer_spark.operators.dedup import exact_dedup
    from nebula_importer_spark.operators.text import normalize_text

    df = spark.createDataFrame(
        [(1, "The Cat!"), (2, "the   cat"), (3, "dog")],
        "doc_id long, text string",
    )
    norm = df.select(
        "doc_id", normalize_text("text", drop_punct=True).alias("text")
    )
    out = exact_dedup(norm, id_col="doc_id", text_col="text")
    survivors = {r.doc_id for r in out.collect()}
    assert survivors == {1, 3}  # 1 and 2 collapsed into one group


def test_normalize_plan_is_map_only(spark):
    from nebula_importer_spark.operators.text import normalize_text

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    plan = (
        df.select(normalize_text("text"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


# ------------------------------------------------------------ luhn / cc audit


def test_luhn_known_numbers(spark):
    from nebula_importer_spark.operators.text import luhn_valid

    df = spark.createDataFrame(
        [
            ("79927398713", True),     # the canonical Luhn test number
            ("4111111111111111", True),
            ("4111111111111112", False),
            ("5500005555555559", True),
            ("1234567812345678", False),
            (None, None),
            ("", None),
            ("12a4", None),
        ],
        "d string, want boolean",
    )
    rows = df.select("d", "want", luhn_valid("d").alias("got")).collect()
    for r in rows:
        assert r.got == r.want, r.d


def test_luhn_matches_python_model(spark):
    import random

    from nebula_importer_spark.operators.text import luhn_valid

    def luhn_py(d):
        total = 0
        for i, ch in enumerate(reversed(d)):
            x = int(ch)
            if i % 2 == 1:
                x *= 2
                if x > 9:
                    x -= 9
            total += x
        return total % 10 == 0

    rng = random.Random(17)
    nums = ["".join(str(rng.randrange(10)) for _ in range(rng.randrange(12, 20))) for _ in range(200)]
    df = spark.createDataFrame([(n,) for n in nums], "d string")
    got = {r.d: r.got for r in df.select("d", luhn_valid("d").alias("got")).collect()}
    assert got == {n: luhn_py(n) for n in nums}


def test_credit_card_audit_extraction(spark):
    from nebula_importer_spark.operators.text import credit_card_audit

    docs = spark.createDataFrame(
        [
            (1, "pay 4111 1111 1111 1111 today"),
            (2, "ref 4111-1111-1111-1112"),
            (3, "no digits here"),
            (4, "short 123456789"),       # < 13 digits: not a candidate
            (5, None),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in credit_card_audit(docs).collect()}
    assert set(rows) == {1, 2}
    assert rows[1].luhn_ok is True and rows[2].luhn_ok is False
    # the audit itself must not leak: only last 4 digits survive
    assert rows[1].cc_masked.endswith("1111") and set(rows[1].cc_masked[:-4]) == {"*"}


def test_credit_card_audit_validation(spark):
    import pytest

    from nebula_importer_spark.operators.text import credit_card_audit, luhn_valid

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="not in input"):
        credit_card_audit(df, text_col="missing")
    from pyspark.sql import functions as F

    with pytest.raises(ValueError, match="column NAME"):
        luhn_valid(F.lit("123"))


def test_moment_profile_matches_numpy_on_quantized(spark):
    import math
    import random

    from nebula_importer_spark.operators.profile import moment_profile

    rng = random.Random(31)
    rows = (
        [("sym", rng.uniform(-1, 1)) for _ in range(500)]
        + [("skewed", rng.uniform(0, 1) ** 4) for _ in range(500)]
        + [("const", 0.25)] * 50
        + [("sym", None)]
    )
    df = spark.createDataFrame(rows, "g string, v double")
    got = {r.g: r for r in moment_profile(
        df, "v", group_cols=["g"], quant=1000).collect()}

    for g in ("sym", "skewed", "const"):
        q = [math.floor(v * 1000) for gg, v in rows
             if gg == g and v is not None]
        n = len(q)
        s = [sum(x ** k for x in q) for k in (1, 2, 3, 4)]
        r = got[g]
        assert (r.n, r.s1, r.s2, r.s3, r.s4) == (n, *s)
        mu = s[0] / n
        m2 = s[1] / n - mu * mu
        assert r.mean == mu / 1000 and r.variance == m2 / (1000 * 1000)
    # shape sanity: the 4th-power draw is strongly right-skewed,
    # the uniform is near-symmetric, the constant has NULL shape
    assert got["skewed"].skewness > 1
    assert abs(got["sym"].skewness) < 0.3
    assert got["const"].skewness is None and got["const"].kurtosis is None
    # uniform excess kurtosis ~ -1.2
    assert -1.5 < got["sym"].kurtosis < -0.8


def test_moment_profile_validation(spark):
    import pytest

    from nebula_importer_spark.operators.profile import moment_profile

    df = spark.createDataFrame([(1.0,)], "v double")
    with pytest.raises(ValueError, match="quant"):
        moment_profile(df, "v", quant=0)
    with pytest.raises(ValueError, match="not in input"):
        moment_profile(df, "zz")


def _py_chi2(labeled, scale=10**6):
    from collections import Counter

    n = len(labeled)
    cx = Counter(x for x, _ in labeled)
    cy = Counter(y for _, y in labeled)
    obs = Counter(labeled)
    chi2 = 0
    for xv in cx:
        for yv in cy:
            o, r, c = obs.get((xv, yv), 0), cx[xv], cy[yv]
            chi2 += (o * n - r * c) ** 2 * scale // (n * r * c)
    k = min(len(cx) - 1, len(cy) - 1)
    return (
        n, len(cx), len(cy), (len(cx) - 1) * (len(cy) - 1), chi2,
        chi2 // (n * k) if k > 0 else None,
    )


def test_chi_square_assoc_random_parity(spark):
    import random

    from nebula_importer_spark.operators.profile import chi_square_assoc

    rng = random.Random(41)
    rows = []
    for i in range(600):
        x = rng.choice(["a", "b", "c", "d"])
        # y depends on x for two levels, independent otherwise
        y = (
            rng.choice(["p", "q", "r"])
            if x in ("c", "d")
            else ("p" if rng.random() < 0.7 else "q")
        )
        if rng.random() < 0.03:
            x = None
        if rng.random() < 0.03:
            y = None
        rows.append((x, y, i))
    df = spark.createDataFrame(rows, "x string, y string, i long").repartition(7)
    r = chi_square_assoc(df, "x", "y").collect()[0]
    got = (r.n, r.levels_x, r.levels_y, r.dof, r.chi2_micro, r.v2_micro)
    assert got == _py_chi2(
        [(x, y) for x, y, _ in rows if x is not None and y is not None]
    )
    assert r.chi2_micro > 0


def test_chi_square_assoc_independent_and_degenerate(spark):
    from nebula_importer_spark.operators.profile import chi_square_assoc

    # perfectly proportional grid: chi2 exactly 0
    rows = [("a", "p")] * 6 + [("a", "q")] * 2 + [("b", "p")] * 3 + [
        ("b", "q")
    ] * 1
    df = spark.createDataFrame(rows, "x string, y string")
    r = chi_square_assoc(df, "x", "y").collect()[0]
    assert r.chi2_micro == 0 and r.v2_micro == 0
    # one-level side: dof 0, v2 NULL
    one = spark.createDataFrame([("a", "p"), ("b", "p")], "x string, y string")
    r1 = chi_square_assoc(one, "x", "y").collect()[0]
    assert (r1.dof, r1.chi2_micro, r1.v2_micro) == (0, 0, None)
    # all-NULL input: empty frame
    nul = spark.createDataFrame([(None, "p")], "x string, y string")
    assert chi_square_assoc(nul, "x", "y").count() == 0


def test_chi_square_assoc_validation(spark):
    import pytest

    from nebula_importer_spark.operators.profile import chi_square_assoc

    df = spark.createDataFrame([("a", "b", 1)], "x string, y string, i long")
    with pytest.raises(ValueError, match="not in input"):
        chi_square_assoc(df, "zz", "y")
    with pytest.raises(ValueError, match="must differ"):
        chi_square_assoc(df, "x", "x")
    ids = spark.createDataFrame(
        [(str(i), "y") for i in range(40)], "x string, y string"
    )
    with pytest.raises(ValueError, match="max_levels"):
        chi_square_assoc(ids, "x", "y", max_levels=10)
    with pytest.raises(ValueError, match="max_rows"):
        chi_square_assoc(df, "x", "y", max_rows=0)


def _py_kendall(pairs, n_cells, scale=10**6):
    from collections import Counter

    xs = [a for a, _ in pairs]
    ys = [b for _, b in pairs]
    mnx, mny = min(xs), min(ys)
    spx = max(xs) - mnx + 1
    spy = max(ys) - mny + 1
    q = [
        ((a - mnx) * n_cells // spx, (b - mny) * n_cells // spy)
        for a, b in pairs
    ]
    n = len(q)
    conc = disc = 0
    for i in range(n):
        for j in range(i + 1, n):
            dx = q[j][0] - q[i][0]
            dy = q[j][1] - q[i][1]
            if dx and dy:
                if (dx > 0) == (dy > 0):
                    conc += 1
                else:
                    disc += 1
    tx = sum(m * (m - 1) // 2 for m in Counter(a for a, _ in q).values())
    ty = sum(m * (m - 1) // 2 for m in Counter(b for _, b in q).values())
    txy = sum(m * (m - 1) // 2 for m in Counter(q).values())
    n0 = n * (n - 1) // 2
    num = conc - disc
    den = (n0 - tx) * (n0 - ty)
    tb = (
        None
        if den == 0
        else (1 if num >= 0 else -1) * (num * num * scale // den)
    )
    return (
        n, n0, conc, disc, tx, ty, txy,
        (num * scale) // n0 if n0 else None, tb,
    )


def test_kendall_tau_random_parity(spark):
    import random

    from nebula_importer_spark.operators.profile import kendall_tau

    rng = random.Random(42)
    for trend in (1, -1):
        rows = []
        for i in range(250):
            a = rng.randrange(0, 300)
            b = trend * a + rng.randrange(-80, 80)
            if rng.random() < 0.02:
                a = None
            rows.append((a, b, i))
        df = spark.createDataFrame(
            rows, "u long, v long, i long"
        ).repartition(5)
        r = kendall_tau(df, "u", "v", n_cells=16).collect()[0]
        got = (
            r.n, r.n0, r.concordant, r.discordant, r.tied_x, r.tied_y,
            r.tied_xy, r.tau_a_micro, r.tau_b2_signed_micro,
        )
        assert got == _py_kendall(
            [(a, b) for a, b, _ in rows if a is not None], 16
        )
        # identity: every pair is concordant, discordant, or tied
        assert r.n0 == (
            r.concordant + r.discordant + r.tied_x + r.tied_y - r.tied_xy
        )
        assert (r.tau_a_micro > 0) == (trend == 1)
        assert (r.tau_b2_signed_micro > 0) == (trend == 1)


def test_kendall_tau_exact_when_cells_resolve(spark):
    from nebula_importer_spark.operators.profile import kendall_tau

    # span <= n_cells: quantization is the identity; perfect monotone
    # sequence gives tau_a == tau_b == 1 exactly
    rows = [(i, 2 * i + 1) for i in range(10)]
    df = spark.createDataFrame(rows, "u long, v long")
    r = kendall_tau(df, "u", "v", n_cells=32).collect()[0]
    assert r.concordant == 45 and r.discordant == 0
    assert r.tied_x == r.tied_y == r.tied_xy == 0
    assert r.tau_a_micro == 10**6 and r.tau_b2_signed_micro == 10**6
    # single row: n0 == 0 -> NULL taus
    one = spark.createDataFrame([(1, 2)], "u long, v long")
    r1 = kendall_tau(one, "u", "v").collect()[0]
    assert (r1.n, r1.n0, r1.tau_a_micro, r1.tau_b2_signed_micro) == (
        1, 0, None, None,
    )
    # empty after NULL drop: empty frame
    nul = spark.createDataFrame([(None, 2)], "u long, v long")
    assert kendall_tau(nul, "u", "v").count() == 0


def test_kendall_tau_validation(spark):
    import pytest

    from nebula_importer_spark.operators.profile import kendall_tau

    df = spark.createDataFrame([(1, 2.0, 3)], "u long, w double, i long")
    with pytest.raises(ValueError, match="not in input"):
        kendall_tau(df, "zz", "u")
    with pytest.raises(ValueError, match="integral"):
        kendall_tau(df, "u", "w")
    with pytest.raises(ValueError, match="must differ"):
        kendall_tau(df, "u", "u")
    with pytest.raises(ValueError, match="n_cells"):
        kendall_tau(df, "u", "i", n_cells=1)
    with pytest.raises(ValueError, match="max_rows"):
        kendall_tau(df, "u", "i", max_rows=0)


def test_fd_violations_parity_and_edges(spark):
    import random
    from collections import Counter, defaultdict

    from nebula_importer_spark.operators.profile import fd_violations

    rng = random.Random(88)
    rows = []
    for i in range(400):
        u = rng.randrange(0, 60)
        # mostly functional: user -> device, 10% drift + NULLs both sides
        dev = f"d{u % 7}" if rng.random() < 0.9 else f"d{rng.randrange(9)}"
        if rng.random() < 0.03:
            dev = None
        rows.append((u if rng.random() > 0.02 else None, dev, i))
    df = spark.createDataFrame(rows, "u long, dev string, i long").repartition(5)
    r = fd_violations(df, ["u"], "dev").collect()[0]
    by_u = defaultdict(Counter)
    for u, dev, _ in rows:
        by_u[u][dev] += 1
    viol = sum(sum(c.values()) - max(c.values()) for c in by_u.values())
    nvg = sum(1 for c in by_u.values() if len(c) > 1)
    assert (
        r.n_rows, r.n_groups, r.n_violating_groups, r.n_violation_rows,
    ) == (len(rows), len(by_u), nvg, viol)
    assert r.holds is False
    assert r.violation_ppm == viol * 10**6 // len(rows)

    # exact FD: holds with 0 ppm
    fd = spark.createDataFrame(
        [(1, "a"), (1, "a"), (2, "b")], "k long, v string"
    )
    rf = fd_violations(fd, ["k"], "v").collect()[0]
    assert rf.holds is True and rf.violation_ppm == 0

    # composite LHS: (a, b) -> c
    comp = spark.createDataFrame(
        [(1, 1, "x"), (1, 1, "x"), (1, 2, "y"), (1, 2, "z")],
        "a long, b long, c string",
    )
    rc = fd_violations(comp, ["a", "b"], "c").collect()[0]
    assert (rc.n_groups, rc.n_violation_rows) == (2, 1)

    # empty input: zero row, NULL ppm
    empty = spark.createDataFrame([], "k long, v string")
    re = fd_violations(empty, ["k"], "v").collect()[0]
    assert (re.n_rows, re.n_groups, re.holds, re.violation_ppm) == (
        0, 0, True, None,
    )


def test_fd_violations_validation(spark):
    import pytest

    from nebula_importer_spark.operators.profile import fd_violations

    df = spark.createDataFrame([(1, "a")], "k long, v string")
    with pytest.raises(ValueError, match="non-empty"):
        fd_violations(df, [], "v")
    with pytest.raises(ValueError, match="not in input"):
        fd_violations(df, ["zz"], "v")
    with pytest.raises(ValueError, match="must not be in"):
        fd_violations(df, ["k", "v"], "v")
    with pytest.raises(ValueError, match="scale"):
        fd_violations(df, ["k"], "v", scale=0)


def test_infer_column_types_classes(spark):
    from nebula_importer_spark.operators.profile import infer_column_types

    rows = [
        ("1", "1.5", "true", "2024-01-02", "12:30:01", "2024-01-02 10:00:00", "abc", "7"),
        ("0x1F", "2", "FALSE", "1999-12-31", "1:2:3.5", "2024-01-02T10:00:00.123", "", None),
        ("-42", ".5", "True", "2024-06-01", "23:59:59", "2024-01-02 10:00:00", "x y", "7.5"),
    ]
    schema = "i string, f string, b string, d string, t string, dt string, s string, m string"
    df = spark.createDataFrame(rows, schema).repartition(3)
    got = {r.column: r for r in infer_column_types(df).collect()}
    assert got["i"].inferred_type == "INT"      # incl. hex + sign
    assert got["f"].inferred_type == "DOUBLE"   # ints mixed with floats
    assert got["b"].inferred_type == "BOOL"
    assert got["d"].inferred_type == "DATE"
    assert got["t"].inferred_type == "TIME"
    assert got["dt"].inferred_type == "DATETIME"
    assert got["s"].inferred_type == "STRING"
    # mixed int/float with a NULL: DOUBLE on the evidence, null counted
    assert got["m"].inferred_type == "DOUBLE" and got["m"].n_null == 1
    # blanks are not evidence
    assert got["s"].n_blank == 1 and got["s"].n_evidence == 2
    # int values count as float evidence too (priority resolves)
    assert got["i"].n_int == 3 and got["i"].n_float == 2  # hex not float
    # no-evidence column: STRING
    empty = spark.createDataFrame([(None,), ("",)], "e string")
    ge = infer_column_types(empty).collect()[0]
    assert ge.inferred_type == "STRING" and ge.n_evidence == 0


def test_infer_column_types_validation(spark):
    import pytest

    from nebula_importer_spark.operators.profile import infer_column_types

    df = spark.createDataFrame([(1, "a")], "n long, s string")
    with pytest.raises(ValueError, match="already carry a schema"):
        infer_column_types(df)
    with pytest.raises(ValueError, match="not in the frame"):
        infer_column_types(df, ["zz"])
    with pytest.raises(ValueError, match="at least one"):
        infer_column_types(df, [])


def test_suggest_source_config_golden_and_roundtrip(spark, tmp_path):
    from nebula_importer_spark.config.suggest import suggest_source_config

    rows = [
        ("1", "alice", "2024-01-02", "3.5", ""),
        ("2", "bob", "2024-02-03", "4", "x"),
    ]
    df = spark.createDataFrame(
        rows, "id string, name string, joined string, score string, note string"
    )
    yaml_block = suggest_source_config(
        df, path="people.csv", tag_name="Person"
    )
    assert yaml_block == (
        "  - path: people.csv\n"
        "    csv:\n"
        '      delimiter: ","\n'
        "      withHeader: true\n"
        "    tags:\n"
        "      - name: Person\n"
        "        id:\n"
        '          type: "INT"\n'
        "          index: 0\n"
        "        props:\n"
        "          - name: name\n"
        '            type: "STRING"\n'
        "            index: 1\n"
        "          - name: joined\n"
        '            type: "DATE"\n'
        "            index: 2\n"
        "          - name: score\n"
        '            type: "DOUBLE"\n'
        "            index: 3\n"
        "          - name: note\n"
        '            type: "STRING"\n'
        "            index: 4\n"
        "            nullable: true\n"
    )
    # the suggestion parses through the real config loader
    from nebula_importer_spark.config import load_config

    full = (
        "client:\n  version: v3\nmanager:\n  spaceName: sniffed\n"
        "sources:\n" + yaml_block
    )
    cfg_path = tmp_path / "suggested.yaml"
    cfg_path.write_text(full)
    cfg = load_config(str(cfg_path))
    tag = cfg.sources[0].tags[0]
    assert tag.name == "Person" and tag.id.type == "INT"
    assert [p.name for p in tag.props] == ["name", "joined", "score", "note"]
    # a TIME id degrades to STRING (NodeID restriction)
    tdf = spark.createDataFrame([("1:2:3", "x")], "t string, v string")
    y2 = suggest_source_config(tdf, path="p.csv", tag_name="T")
    assert 'type: "STRING"\n          index: 0' in y2


def _py_ks(rows, ga, gb, n_cells, scale=10**6):
    a = sorted(v for g, v in rows if g == ga and v is not None)
    bb = sorted(v for g, v in rows if g == gb and v is not None)
    allv = a + bb
    mn, mx = min(allv), max(allv)
    span = mx - mn + 1
    from collections import Counter

    ca = Counter((v - mn) * n_cells // span for v in a)
    cb = Counter((v - mn) * n_cells // span for v in bb)
    vmax = {}
    for v in allv:
        c = (v - mn) * n_cells // span
        vmax[c] = max(vmax.get(c, v), v)
    na, nb = len(a), len(bb)
    cum_a = cum_b = 0
    best = None
    for c in sorted(set(ca) | set(cb)):
        cum_a += ca.get(c, 0)
        cum_b += cb.get(c, 0)
        gap = abs(cum_a * nb - cum_b * na)
        key = (gap, -c)
        if best is None or key > best[0]:
            best = (key, vmax[c])
    return na, nb, best[0][0] * scale // (na * nb), best[1]


def test_ks_two_sample_parity_and_shift(spark):
    import random

    from nebula_importer_spark.operators.profile import ks_two_sample

    rng = random.Random(12)
    rows = []
    for _ in range(400):
        rows.append(("a", rng.randrange(0, 1000)))
    for _ in range(350):
        rows.append(("b", rng.randrange(300, 1300)))  # shifted
    rows.append(("c", 5))   # ignored third group
    rows.append(("a", None))
    df = spark.createDataFrame(rows, "g string, v long").repartition(5)
    r = ks_two_sample(
        df, "g", "v", group_a="a", group_b="b", n_cells=64
    ).collect()[0]
    want = _py_ks(rows, "a", "b", 64)
    assert (r.n_a, r.n_b, r.ks_micro, r.ks_at_value) == want
    # a 300-unit shift on a 1000-wide uniform: KS ~ 0.3
    assert 200_000 < r.ks_micro < 400_000

    # identical samples: KS exactly 0
    same = [("a", v) for v in range(50)] + [("b", v) for v in range(50)]
    r0 = ks_two_sample(
        spark.createDataFrame(same, "g string, v long"),
        "g", "v", group_a="a", group_b="b", n_cells=64,
    ).collect()[0]
    assert r0.ks_micro == 0
    # disjoint supports: KS exactly 1
    dis = [("a", v) for v in range(50)] + [("b", 1000 + v) for v in range(50)]
    r1 = ks_two_sample(
        spark.createDataFrame(dis, "g string, v long"),
        "g", "v", group_a="a", group_b="b", n_cells=64,
    ).collect()[0]
    assert r1.ks_micro == 10**6


def test_ks_two_sample_validation(spark):
    import pytest

    from nebula_importer_spark.operators.profile import ks_two_sample

    df = spark.createDataFrame([("a", 1)], "g string, v long")
    with pytest.raises(ValueError, match="must differ"):
        ks_two_sample(df, "g", "v", group_a="a", group_b="a")
    with pytest.raises(ValueError, match="not in input"):
        ks_two_sample(df, "zz", "v", group_a="a", group_b="b")
    with pytest.raises(ValueError, match="no rows"):
        ks_two_sample(
            df.filter("v > 99"), "g", "v", group_a="a", group_b="b"
        )
    with pytest.raises(ValueError, match="absent sample"):
        ks_two_sample(df, "g", "v", group_a="a", group_b="b")
    fl = spark.createDataFrame([("a", 1.0)], "g string, v double")
    with pytest.raises(ValueError, match="integral"):
        ks_two_sample(fl, "g", "v", group_a="a", group_b="b")


def test_readability_known_values(spark):
    from nebula_importer_spark.operators.text import readability

    df = spark.createDataFrame(
        [(1, "The cat sat. The dog barked loudly! Why?"),
         (2, "a b c"),
         (3, ""), (4, None)],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in readability(df).collect()}
    # doc 1: 8 words, 3 sentence runs, 10 vowel groups, no no-vowel tokens
    r1 = got[1]
    assert (r1.n_words, r1.n_sentences, r1.n_syllables) == (8, 3, 10)
    # 0.39*(8/3) + 11.8*(10/8) - 15.59 = 0.2 exactly -> 200 milli
    assert r1.fk_grade_milli == 200
    # doc 2: "b" and "c" have no vowel group -> min-1 rule adds 2
    r2 = got[2]
    assert (r2.n_words, r2.n_sentences, r2.n_syllables) == (3, 1, 3)
    # negative grade truncates toward zero: -2.62 -> -2620 milli
    assert r2.fk_grade_milli == -2620
    # empty/null: zero counts, NULL scores
    for d in (3, 4):
        assert (got[d].n_words, got[d].n_sentences, got[d].n_syllables) == (0, 0, 0)
        assert got[d].fk_grade_milli is None
        assert got[d].reading_ease_milli is None


def test_readability_validation_and_plan(spark):
    import pytest

    from nebula_importer_spark.operators.text import readability

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="not in input"):
        readability(df, text_col="zz")
    # map-only contract: no Exchange anywhere in the physical plan
    plan = readability(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_vocab_growth_exact_curve(spark):
    from nebula_importer_spark.operators.text import vocab_growth

    rows = [(1, "a b c"), (2, "a b d"), (3, "a e"), (4, "f f f"), (10, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = [
        (r.checkpoint, r.n_docs, r.n_tokens, r.vocab, r.ttr_ppm)
        for r in vocab_growth(df, n_points=5).orderBy("checkpoint").collect()
    ]
    assert got == [
        (1, 1, 3, 3, 1000000),
        (2, 2, 6, 4, 666666),
        (3, 3, 8, 5, 625000),
        (4, 4, 11, 6, 545454),
        (5, 5, 11, 6, 545454),  # empty doc adds nothing
    ]


def test_vocab_growth_sparse_ids_and_validation(spark):
    import pytest

    from nebula_importer_spark.operators.text import vocab_growth

    # sparse non-contiguous ids: rank order, not id arithmetic, drives
    # the checkpoints
    rows = [(1000, "x"), (5, "x y"), (70, "z")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.checkpoint: (r.n_docs, r.vocab)
        for r in vocab_growth(df, n_points=3).collect()
    }
    # crawl order: 5 ("x y"), 70 ("z"), 1000 ("x")
    assert got == {1: (1, 2), 2: (2, 3), 3: (3, 3)}
    with pytest.raises(ValueError, match="n_points"):
        vocab_growth(df, n_points=0)
    with pytest.raises(ValueError, match="not in input"):
        vocab_growth(df, text_col="zz")


def test_js_divergence_python_parity(spark):
    import math
    import random

    from nebula_importer_spark.operators.text import js_divergence

    rng = random.Random(13)
    va = ["x", "y", "z", "w", "common"]
    vb = ["p", "q", "r", "w", "common"]
    rows = []
    for i in range(60):
        lab, voc = ("a", va) if i % 2 == 0 else ("b", vb)
        rows.append(
            (lab, " ".join(rng.choice(voc) for _ in range(rng.randint(1, 9))))
        )
    df = spark.createDataFrame(rows, "lang string, text string")
    got = js_divergence(df, "lang", "a", "b").collect()[0]

    ca, cb = {}, {}
    for lab, text in rows:
        tgt = ca if lab == "a" else cb
        for w in text.split():
            tgt[w] = tgt.get(w, 0) + 1
    na, nb = sum(ca.values()), sum(cb.values())
    sa = sb = 0
    for w in set(ca) | set(cb):
        p, q = ca.get(w, 0) / na, cb.get(w, 0) / nb
        if ca.get(w, 0) > 0:
            sa += ca[w] * math.floor(math.log(2 * p / (p + q)) * 10**6)
        if cb.get(w, 0) > 0:
            sb += cb[w] * math.floor(math.log(2 * q / (p + q)) * 10**6)

    def trunc(x, y):
        return x // y if (x >= 0) == (y >= 0) else -((-x) // y)

    want = trunc(trunc(sa, na) + trunc(sb, nb), 2)
    assert (got.n_tokens_a, got.n_tokens_b) == (na, nb)
    assert got.vocab_union == len(set(ca) | set(cb))
    assert got.jsd_micro == want
    assert 0 <= got.jsd_micro <= 693148  # bounded by ln 2


def test_js_divergence_identical_and_disjoint(spark):
    from nebula_importer_spark.operators.text import js_divergence

    same = spark.createDataFrame(
        [("a", "x y z"), ("b", "x y z")], "lang string, text string"
    )
    assert js_divergence(same, "lang", "a", "b").collect()[0].jsd_micro == 0
    disj = spark.createDataFrame(
        [("a", "x x"), ("b", "y y")], "lang string, text string"
    )
    got = js_divergence(disj, "lang", "a", "b").collect()[0].jsd_micro
    assert abs(got - 693147) <= 2  # ln 2 in micro-nats, floor slack


def test_js_divergence_validation(spark):
    import pytest

    from nebula_importer_spark.operators.text import js_divergence

    df = spark.createDataFrame([("a", "x")], "lang string, text string")
    with pytest.raises(ValueError, match="must differ"):
        js_divergence(df, "lang", "a", "a")
    with pytest.raises(ValueError, match="not in input"):
        js_divergence(df, "zz", "a", "b")
    with pytest.raises(Exception, match="no tokens"):
        js_divergence(df, "lang", "a", "b").collect()
