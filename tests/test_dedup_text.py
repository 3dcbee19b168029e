from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nebula_importer_spark.operators.dedup import (
    embedding_dup_pairs,
    exact_dedup,
    gram_novelty,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash,
    simhash_dup_pairs,
    winnow_fingerprints,
)
from nebula_importer_spark.operators.multimodal import (
    extract_features,
    sample_frames,
    synth_assets,
)
from nebula_importer_spark.operators.similarity import brute_force_topk, lsh_topk
from nebula_importer_spark.operators.text import (
    fingerprint,
    lang_id,
    quality_score,
    token_count,
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2, "the quick brown fox jumps over the lazy dog near the river bank today"),  # exact dup of 1
    (3, "the quick brown fox jumps over the lazy dog near the river bend today"),  # near dup
    (4, "der schnelle braune fuchs springt und das ist nicht ein problem mit auf"),
    (5, "completely unrelated text about databases and distributed query engines"),
    (6, ""),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_exact_dedup(spark, docs):
    out = exact_dedup(docs)
    assert out.count() == 5  # 1&2 merge
    assert out.filter(F.col("text") == DOCS[0][1]).first()["doc_id"] == 1


def test_exact_dedup_null_text(spark):
    df = spark.createDataFrame(
        [(1, None), (2, None), (3, "x")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r["text"] for r in exact_dedup(df).collect()}
    assert rows == {1: None, 3: "x"}  # NULL texts group together, min id wins


def test_exact_dedup_shuffles_digest_not_text(spark, docs):
    plan = exact_dedup(docs)._jdf.queryExecution().executedPlan().toString()
    exchanges = [ln for ln in plan.splitlines() if "Exchange hashpartitioning" in ln]
    assert exchanges, plan
    # the exchange key must be the fixed-width sha2 digest (Catalyst folds
    # the alias into _groupingexpression#N), never the raw document text —
    # at 100 TB a text grouping key shuffles the whole corpus as key bytes
    assert all("text#" not in ln for ln in exchanges), exchanges
    assert "sha2" in plan, plan


def test_gram_novelty(spark, docs):
    rows = {
        r["doc_id"]: r for r in gram_novelty(docs, n=3).collect()
    }
    # doc 6 is empty (no grams) → absent
    assert set(rows) == {1, 2, 3, 4, 5}
    # doc 1: 12 distinct 3-grams ("the ... the ..." has 14 tokens, all grams
    # distinct), all first-seen → nothing stale
    assert rows[1]["n_grams"] == 12 and rows[1]["n_stale"] == 0
    assert rows[1]["stale_frac"] == 0.0
    # doc 2 is an exact dup of doc 1 → every gram stale
    assert rows[2]["n_stale"] == rows[2]["n_grams"] == 12
    assert rows[2]["stale_frac"] == 1.0
    # doc 3 differs in one token ("bank"→"bend", token 13 of 14) → only the
    # 2 grams reaching token 13 (starts 11 and 12) are novel, 10 are stale
    assert rows[3]["n_grams"] == 12 and rows[3]["n_stale"] == 10
    assert rows[3]["stale_frac"] == 10 / 12
    # docs 4/5 share no grams with anything earlier
    assert rows[4]["n_stale"] == 0 and rows[5]["n_stale"] == 0


def test_gram_novelty_shuffles_hash_not_gram(spark, docs):
    plan = gram_novelty(docs)._jdf.queryExecution().executedPlan().toString()
    exchanges = [ln for ln in plan.splitlines() if "Exchange hashpartitioning" in ln]
    assert exchanges, plan
    # every shuffle keys on the xxhash64 gram key or the doc id — the gram
    # strings themselves must never travel as exchange keys
    assert all("_g#" not in ln for ln in exchanges), exchanges
    assert "xxhash64" in plan, plan


def _winnow_ref(docs, n=3, window=4):
    import hashlib

    out = set()
    for did, text in docs:
        toks = (text or "").split()
        hs = [
            hashlib.md5(" ".join(toks[i : i + n]).encode()).hexdigest()
            for i in range(len(toks) - n + 1)
        ]
        if not hs:
            continue
        if len(hs) < window:
            out.add((did, min(hs)))
        else:
            for i in range(len(hs) - window + 1):
                out.add((did, min(hs[i : i + window])))
    return out


def test_winnow_fingerprints_matches_reference(spark):
    import random

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(30)]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(L)))
        for i, L in enumerate(
            rng.choice([0, 1, 2, 3, 5, 8, 20, 40]) for _ in range(60)
        )
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_id"], r["fingerprint"])
        for r in winnow_fingerprints(df, n=3, window=4).collect()
    }
    assert got == _winnow_ref(rows)


def test_winnow_shared_passage_guarantee(spark):
    # the winnowing guarantee: ANY shared passage of >= window+n-1 tokens
    # forces a shared fingerprint — even when whole-document similarity is
    # tiny (here the two docs differ everywhere outside the passage)
    passage = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (1, "aa bb cc " + passage + " dd ee"),
        (2, "zz yy xx ww vv uu tt ss " + passage),
        (3, "totally unrelated words only here nothing shared at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fps = {}
    for r in winnow_fingerprints(df, n=3, window=4).collect():
        fps.setdefault(r["doc_id"], set()).add(r["fingerprint"])
    assert fps[1] & fps[2]
    assert not (fps[3] & (fps[1] | fps[2]))


def test_winnow_short_and_empty_docs(spark):
    rows = [(1, "a b c d"), (2, "a b"), (3, ""), (4, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_id"], r["fingerprint"])
        for r in winnow_fingerprints(df, n=3, window=4).collect()
    }
    # doc 1: 2 grams < window → single whole-doc min; doc 2: no 3-grams;
    # docs 3/4: empty/NULL → absent
    assert got == _winnow_ref(rows)
    assert {d for d, _ in got} == {1}


def test_winnow_single_exchange_plan(spark, docs):
    # one exchange on the doc id only: both window passes share the
    # partition key, the short-doc fallback is a conditional projection
    # (not a union that would duplicate the subtree), and the trailing
    # distinct reuses the doc-id partitioning (key-subset satisfaction)
    plan = (
        winnow_fingerprints(docs)._jdf.queryExecution().executedPlan().toString()
    )
    exchanges = [
        ln for ln in plan.splitlines() if "Exchange hashpartitioning" in ln
    ]
    assert len(exchanges) == 1, plan


def test_winnow_validates_window(spark, docs):
    with pytest.raises(ValueError, match="window"):
        winnow_fingerprints(docs, window=0)


def test_ngram_jaccard_pairs(spark, docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, n=3, threshold=0.5).collect()
    }
    assert pairs[(1, 2)] == 1.0
    assert (1, 3) in pairs and pairs[(1, 3)] < 1.0
    assert all(not (a in (4, 5) or b in (4, 5)) for a, b in pairs)


def test_minhash_lsh_pairs_char(spark, docs):
    got = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(
            docs, threshold=0.5, shingle_n=5, shingle_mode="char"
        ).collect()
    }
    assert (1, 2) in got
    assert (1, 3) in got
    assert (4, 5) not in got


def test_minhash_lsh_pairs_word_default(spark, docs):
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in minhash_lsh_pairs(docs, threshold=0.7).collect()
    }
    assert got[(1, 2)] == 1.0
    assert (4, 5) not in got


def test_simhash_properties(spark, docs):
    sh = {r["doc_id"]: r["simhash"] for r in simhash(docs.filter("text != ''")).collect()}
    assert sh[1] == sh[2]  # identical text → identical signature

    def ham(x: int, y: int) -> int:
        # mask to 64 bits: signatures are signed longs
        return bin((x ^ y) & (2**64 - 1)).count("1")

    ham13 = ham(sh[1], sh[3])
    ham15 = ham(sh[1], sh[5])
    assert ham13 < ham15  # near-dup closer than unrelated


def test_simhash_dup_pairs(spark, docs):
    got = {
        (r["id_a"], r["id_b"])
        for r in simhash_dup_pairs(docs.filter("text != ''"), max_hamming=6).collect()
    }
    assert (1, 2) in got
    assert (1, 5) not in got


def test_embedding_dup_pairs(spark):
    base = [0.1, 0.2, 0.3, 0.4]
    rows = [
        (1, base),
        (2, [x * 1.0001 for x in base]),  # same direction → cosine ≈ 1
        (3, [0.4, -0.3, 0.2, -0.1]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {(r["id_a"], r["id_b"]) for r in embedding_dup_pairs(df, threshold=0.999).collect()}
    assert got == {(1, 2)}


def test_brute_force_topk(spark):
    rows = [(i, [float(i == j) for j in range(4)]) for i in range(4)]
    rows.append((10, [1.0, 0.1, 0.0, 0.0]))  # near e0
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = corpus.filter("vec_id = 0").select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    top = brute_force_topk(corpus, queries, k=2).collect()
    assert [r["neighbor_id"] for r in top] == [10, 1]  # 10 closest, then tie-break min id


def test_lsh_topk_recall(spark):
    import numpy as np

    rng = np.random.RandomState(0)
    vecs = rng.standard_normal((200, 16)).astype("float32")
    corpus = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(vecs)], "vec_id long, embedding array<float>"
    )
    queries = spark.createDataFrame(
        [(900 + i, (vecs[i] + 0.01 * rng.standard_normal(16).astype("float32")).tolist()) for i in range(5)],
        "query_id long, query_vec array<float>",
    )
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(corpus, queries, k=1).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in lsh_topk(corpus, queries, k=1, n_planes=12, n_bands=4).collect()
    }
    # near-identical query should find its source vector via LSH most times
    assert len(exact & approx) >= 3


def test_embedding_bucket_purity(spark):
    import numpy as np

    from nebula_importer_spark.operators.similarity import embedding_bucket_purity

    # two tight clusters with one planted cross-label point + a NULL label
    rng = np.random.RandomState(3)
    c0 = rng.standard_normal(8).astype("float64")
    c1 = -c0  # antipodal → different sign buckets under any plane set
    rows = []
    for i in range(10):
        rows.append((i, (c0 + 0.01 * rng.standard_normal(8)).tolist(), 0))
    for i in range(10, 20):
        rows.append((i, (c1 + 0.01 * rng.standard_normal(8)).tolist(), 1))
    rows.append((20, (c0 + 0.01 * rng.standard_normal(8)).tolist(), 1))  # mislabeled
    rows.append((21, c0.tolist(), None))  # NULL label: excluded
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = embedding_bucket_purity(df, n_planes=8, n_bands=2, dim=8).collect()
    assert out, "no buckets"
    by_bucket = {(r.band, r.bucket): r for r in out}
    # counts: every (band,bucket) row's top_n ≤ n_vecs, purity consistent
    for r in out:
        assert r.top_n <= r.n_vecs
        assert abs(r.purity - r.top_n / r.n_vecs) < 1e-12
    # total bucket membership = 22 labeled? no — 21 labeled rows × 2 bands
    assert sum(r.n_vecs for r in out) == 21 * 2
    # the planted mislabel sits in cluster-0's bucket: that bucket's top
    # label is 0 with purity 11/12? (10 clean + 1 mislabeled = 11 rows)
    impure = [r for r in out if 0 < r.purity < 1.0]
    assert impure, "planted mislabel should make some bucket impure"
    for r in impure:
        assert r.top_label == 0 and r.n_vecs == 11 and r.top_n == 10


def test_embedding_bucket_purity_tie_breaks_min_label(spark):
    from nebula_importer_spark.operators.similarity import embedding_bucket_purity

    # identical vectors, labels 2/2 split → tie; top_label must be the min
    rows = [(i, [1.0, 0.0], 5 - 3 * (i % 2)) for i in range(4)]  # labels 5,2,5,2
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = embedding_bucket_purity(df, n_planes=4, n_bands=2, dim=2).collect()
    assert out and all(r.top_label == 2 and r.purity == 0.5 for r in out)


def test_embedding_bucket_purity_empty(spark):
    from nebula_importer_spark.operators.similarity import embedding_bucket_purity

    df = spark.createDataFrame([], "vec_id long, embedding array<float>, label int")
    assert embedding_bucket_purity(df).count() == 0


def test_ivf_topk_recall_on_clustered_data(spark):
    """IVF-flat: clustered corpus (the realistic ANN shape) — probing
    nprobe cells must recover ≥ 80% of the exact top-1 neighbors."""
    import numpy as np

    from nebula_importer_spark.operators.similarity import ivf_topk

    rng = np.random.RandomState(7)
    centers = rng.standard_normal((8, 16)) * 4.0
    vecs = np.concatenate(
        [c + rng.standard_normal((40, 16)) * 0.3 for c in centers]
    ).astype("float32")
    corpus = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    queries = spark.createDataFrame(
        [
            (900 + i, (vecs[i * 37] + 0.02 * rng.standard_normal(16).astype("float32")).tolist())
            for i in range(8)
        ],
        "query_id long, query_vec array<float>",
    )
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(corpus, queries, k=1).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_topk(corpus, queries, k=1, nlist=8, nprobe=2).collect()
    }
    assert len(exact & approx) >= 7  # ≥ 87% top-1 recall on clustered data


def test_ivf_topk_empty_corpus(spark):
    from nebula_importer_spark.operators.similarity import ivf_topk

    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    q = spark.createDataFrame([(1, [0.1, 0.2])], "query_id long, query_vec array<float>")
    assert ivf_topk(empty, q).count() == 0


def test_text_ops(spark, docs):
    out = docs.select(
        "doc_id",
        token_count("text").alias("toks"),
        lang_id("text").alias("lang"),
        quality_score("text").alias("q"),
        fingerprint("text").alias("fp"),
    ).collect()
    rows = {r["doc_id"]: r for r in out}
    assert rows[1]["toks"] == 14
    assert rows[6]["toks"] == 0
    assert rows[1]["lang"] == "en"
    assert rows[4]["lang"] == "de"
    assert rows[6]["lang"] == "und"
    assert 0.0 <= rows[5]["q"] <= 1.0
    assert rows[1]["fp"] == rows[2]["fp"]  # identical docs, identical fingerprint
    assert rows[1]["fp"] != rows[5]["fp"]


def test_bpe_pair_counts(spark):
    from nebula_importer_spark.operators.text import bpe_pair_counts

    df = spark.createDataFrame(
        [(1, "aaa ab"), (2, "aaa"), (3, "x"), (4, None), (5, "")],
        "doc_id long, text string",
    )
    got = {r["pair"]: r["pair_count"] for r in bpe_pair_counts(df).collect()}
    # "aaa" occurs twice in the corpus, contributing "aa" 2× per occurrence
    # (within-word multiplicity); "ab" once; "x"/None/"" contribute nothing
    assert got == {"aa": 4, "ab": 1}
    filtered = {r["pair"]: r["pair_count"]
                for r in bpe_pair_counts(df, min_count=2).collect()}
    assert filtered == {"aa": 4}


def test_bpe_pair_counts_corpus_read_once(spark):
    from nebula_importer_spark.operators.text import bpe_pair_counts

    df = spark.createDataFrame([(1, "ab ab cd")], "doc_id long, text string")
    plan = bpe_pair_counts(df)._jdf.queryExecution().optimizedPlan().toString()
    # pair enumeration must run over the vocabulary (post-aggregation),
    # never re-scan the corpus: exactly one scan of the input relation
    assert plan.count("LogicalRDD") == 1, plan


def _lm_ref(score, train, precision=1_000_000):
    import math
    from collections import Counter

    uw, bw = Counter(), Counter()
    for _, t in train:
        toks = (t or "").split()
        uw.update(toks)
        bw.update(" ".join(toks[i : i + 2]) for i in range(len(toks) - 1))
    v = len(uw)
    out = {}
    for did, t in score:
        toks = (t or "").split()
        grams = [" ".join(toks[i : i + 2]) for i in range(len(toks) - 1)]
        if not grams:
            continue
        s = sum(
            math.floor(
                math.log(
                    (bw.get(g, 0) + 1) / (uw.get(g.split(" ")[0], 0) + v + 1)
                )
                * precision
            )
            for g in grams
        )
        ce = -s / (precision * len(grams))
        out[did] = (len(grams), round(ce, 6), round(math.exp(ce), 6))
    return out


def test_bigram_lm_score_matches_reference(spark):
    import random

    from nebula_importer_spark.operators.text import bigram_lm_score

    rng = random.Random(11)
    vocab = [f"w{i}" for i in range(40)]
    mk = lambda L: " ".join(rng.choice(vocab) for _ in range(L))  # noqa: E731
    train = [(i, mk(rng.choice([0, 1, 5, 30, 60]))) for i in range(50)]
    score = [(i, mk(rng.choice([0, 1, 2, 8, 40]))) for i in range(40)]
    # entirely-unseen tokens exercise the additive smoothing floor
    score.append((99, "unseen tokens entirely outside the training set"))
    sdf = spark.createDataFrame(score, "doc_id long, text string")
    tdf = spark.createDataFrame(train, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_bigrams"], r["cross_entropy"], r["perplexity"])
        for r in bigram_lm_score(sdf, tdf).collect()
    }
    assert got == _lm_ref(score, train)
    # self-trained mode (train_df defaults to score_df)
    got_self = {
        r["doc_id"]: (r["n_bigrams"], r["cross_entropy"], r["perplexity"])
        for r in bigram_lm_score(sdf).collect()
    }
    assert got_self == _lm_ref(score, score)


def test_bigram_lm_score_ranks_quality(spark):
    from nebula_importer_spark.operators.text import bigram_lm_score

    train = [(i, "the cat sat on the mat and the dog ran") for i in range(5)]
    score = [
        (1, "the cat sat on the mat"),  # in-distribution
        (2, "zzz qqq vvv kkk jjj www"),  # gibberish
    ]
    sdf = spark.createDataFrame(score, "doc_id long, text string")
    tdf = spark.createDataFrame(train, "doc_id long, text string")
    ppl = {r["doc_id"]: r["perplexity"] for r in bigram_lm_score(sdf, tdf).collect()}
    assert ppl[2] > 3 * ppl[1]


def test_bigram_lm_score_shuffles_hash_not_token(spark):
    from nebula_importer_spark.operators.text import bigram_lm_score

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = bigram_lm_score(df)._jdf.queryExecution().executedPlan().toString()
    exchanges = [
        ln for ln in plan.splitlines() if "Exchange hashpartitioning" in ln
    ]
    assert exchanges, plan
    # every exchange keys on the xxhash64 of the token/gram (directly, via
    # its _k1/_k2 alias, or Catalyst-folded into _groupingexpression#N —
    # all fixed-width longs) or on the doc id; the token/gram STRING
    # columns themselves must never travel as exchange keys (outside an
    # xxhash64(...) argument list, which reduces them to a long)
    import re

    for ln in exchanges:
        bare = re.sub(r"xxhash64\([^)]*\)", "HASH", ln)
        assert "_w#" not in bare and "_g#" not in bare, ln
    assert "xxhash64" in plan, plan


def test_multimodal_plumbing(spark):
    assets = synth_assets(spark, n=12)
    feats = extract_features(assets)
    rows = feats.collect()
    assert len(rows) == 12
    assert all(len(r["feature"]) == 16 for r in rows)
    # determinism: same payload → same sha + feature
    again = {r["asset_id"]: r["sha256"] for r in extract_features(assets).collect()}
    assert all(r["sha256"] == again[r["asset_id"]] for r in rows)
    frames = sample_frames(assets, every_ms=400)
    assert frames.count() > 0
    assert frames.groupBy("asset_id").count().filter("count < 2").count() == 0


def test_multimodal_resize_plumbing(spark):
    from nebula_importer_spark.operators.multimodal import resize_images

    assets = synth_assets(spark, n=12)  # widths/heights 32..39, kind cycles
    resized = resize_images(assets, max_w=16, max_h=8)
    rows = {r["asset_id"]: r for r in resized.collect()}
    n_images = assets.filter("kind = 'image'").count()
    assert len(rows) == n_images and n_images > 0
    src = {r["asset_id"]: r for r in assets.collect()}
    for aid, r in rows.items():
        w, h = src[aid]["width"], src[aid]["height"]
        scale = min(16 / w, 8 / h, 1.0)
        # aspect-preserving fit, floor-clamped, never upscaled
        assert r["new_width"] == max(int(w * scale), 1)
        assert r["new_height"] == max(int(h * scale), 1)
        assert r["new_width"] <= 16 and r["new_height"] <= 8
        # fake payload is one byte per target pixel, deterministic
        assert len(r["payload"]) == r["new_width"] * r["new_height"]
    again = {r["asset_id"]: bytes(r["payload"]) for r in resized.collect()}
    assert all(bytes(r["payload"]) == again[a] for a, r in rows.items())


def test_multimodal_decode_unknown_format_raises():
    from nebula_importer_spark.operators.multimodal import decode_image

    with pytest.raises(NotImplementedError):
        decode_image(b"\x00\x01\x02")  # no codec for arbitrary bytes


def test_png_codec_roundtrip():
    import numpy as np

    from nebula_importer_spark.operators.multimodal import decode_image, encode_png

    rng = np.random.RandomState(7)
    for c in (1, 2, 3, 4):  # gray, gray+alpha, RGB, RGBA
        arr = rng.randint(0, 256, (5, 7, c), dtype=np.uint8)
        out = decode_image(encode_png(arr))
        assert out.shape == (5, 7, c)
        assert (out == arr).all()


def test_png_decoder_all_filter_types():
    """The built-in decoder must invert every PNG row filter (0-4), not just
    the filter-0 rows our encoder emits: forward-filter known pixels per the
    spec, wrap in a valid PNG, and check exact pixel recovery."""
    import struct
    import zlib

    import numpy as np

    from nebula_importer_spark.operators.multimodal import PNG_MAGIC, decode_png

    rng = np.random.RandomState(11)
    c, w, h = 3, 6, 5
    arr = rng.randint(0, 256, (h, w, c), dtype=np.uint8)
    flat = arr.reshape(h, w * c).astype(int)
    stride = w * c
    raw = b""
    prev = np.zeros(stride, dtype=int)
    for y, ft in enumerate([0, 1, 2, 3, 4]):
        cur = flat[y]
        enc = np.empty(stride, dtype=int)
        for x in range(stride):
            a = cur[x - c] if x >= c else 0
            b = prev[x]
            cc = prev[x - c] if x >= c else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = a
            elif ft == 2:
                pred = b
            elif ft == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
            enc[x] = (cur[x] - pred) % 256
        raw += bytes([ft]) + bytes(enc.astype(np.uint8))
        prev = cur

    def chunk(typ, body):
        return struct.pack(">I", len(body)) + typ + body + struct.pack(
            ">I", zlib.crc32(typ + body)
        )

    png = (
        PNG_MAGIC
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    assert (decode_png(png) == arr).all()


def test_resize_nearest_geometry():
    import numpy as np

    from nebula_importer_spark.operators.multimodal import resize_nearest

    arr = np.arange(8, dtype=np.uint8).reshape(2, 4, 1)
    # center mapping: row floor(0.5*2)=1; cols floor((i+0.5)*2) = 1, 3
    assert resize_nearest(arr, 2, 1).tolist() == [[[5], [7]]]


def test_multimodal_real_png_path(spark):
    """PNG assets exercise the REAL codec path end-to-end through Spark:
    features are pixel statistics (not the sha stand-in) and resize output
    is a decodable PNG matching a local nearest-neighbor resample."""
    import numpy as np

    from nebula_importer_spark.operators.multimodal import (
        ASSET_SCHEMA,
        _pixel_feature,
        decode_png,
        encode_png,
        extract_features,
        resize_images,
        resize_nearest,
    )

    rng = np.random.RandomState(3)
    arrs, rows = {}, []
    for i in range(4):
        w, h = 8 + i, 6 + i
        arrs[i] = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
        rows.append((i, "image", bytes(encode_png(arrs[i])), "image/png", w, h, 0))
    assets = spark.createDataFrame(rows, ASSET_SCHEMA)

    feats = {r["asset_id"]: r["feature"] for r in extract_features(assets).collect()}
    for i, got in feats.items():
        np.testing.assert_allclose(got, _pixel_feature(arrs[i]), rtol=1e-6)

    resized = {r["asset_id"]: r for r in resize_images(assets, max_w=4, max_h=4).collect()}
    assert len(resized) == 4
    for i, r in resized.items():
        out = decode_png(bytes(r["payload"]))
        assert out.shape == (r["new_height"], r["new_width"], 3)
        assert (out == resize_nearest(arrs[i], r["new_width"], r["new_height"])).all()


def test_tokenization_re2_compatible(spark):
    """\\x0B is whitespace to Java \\s but NOT to RE2 (the DuckDB oracles):
    the explicit class pins the Spark side to RE2 semantics so tokenization
    cannot silently diverge on such data (review finding)."""
    import duckdb

    from nebula_importer_spark.operators.text import token_count

    df = spark.createDataFrame([("a\x0bb c",)], "text string")
    n = df.select(token_count("text").alias("n")).collect()[0]["n"]
    dn = duckdb.sql(
        "select len(regexp_extract_all('a' || chr(11) || 'b c', '\\S+')) as n"
    ).fetchone()[0]
    assert n == dn == 2


def test_decode_image_normalizes_16bit_gray_when_pil_present():
    """With PIL installed, exotic modes must normalize to uint8 (high byte
    for 16-bit gray) instead of silently leaking uint16 into kernels that
    assume 0-255 (review finding). Skips where PIL is absent — the built-in
    codec path is 8-bit-only by construction."""
    pytest.importorskip("PIL")
    import struct
    import zlib

    import numpy as np

    from nebula_importer_spark.operators.multimodal import PNG_MAGIC, decode_image

    # hand-build a 2x2 16-bit grayscale PNG (depth 16, color 0, filter 0)
    vals = np.array([[0, 257], [32896, 65535]], dtype=np.uint16)
    raw = b"".join(b"\x00" + vals[y].astype(">u2").tobytes() for y in range(2))

    def chunk(typ, body):
        return (
            struct.pack(">I", len(body)) + typ + body
            + struct.pack(">I", zlib.crc32(typ + body))
        )

    png = (
        PNG_MAGIC
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    out = decode_image(png)
    assert out.dtype == np.uint8 and out.shape == (2, 2, 1)
    assert out[:, :, 0].tolist() == (vals >> 8).tolist()


def test_int_kmeans_separates_clusters(spark):
    import numpy as np

    from nebula_importer_spark.operators.similarity import int_kmeans

    # two tight antipodal clusters → k=2 must split them exactly
    rng = np.random.RandomState(7)
    c0 = rng.standard_normal(8).astype("float32")
    rows = []
    for i in range(12):
        base = c0 if i % 2 == 0 else -c0
        rows.append((i, (base + 0.01 * rng.standard_normal(8).astype("float32")).tolist()))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = int_kmeans(df, k=2, iterations=4, dim=8).collect()
    by_parity = {0: set(), 1: set()}
    for r in out:
        by_parity[r["vec_id"] % 2].add(r["cluster"])
    assert len(by_parity[0]) == 1 and len(by_parity[1]) == 1
    assert by_parity[0] != by_parity[1]


def test_int_kmeans_partition_order_proof(spark):
    """Bit-identical result under a different physical layout — the
    exact-integer design means no float accumulation order can leak in."""
    import numpy as np

    from nebula_importer_spark.operators.similarity import int_kmeans

    rng = np.random.RandomState(11)
    rows = [(i, rng.standard_normal(6).astype("float32").tolist()) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    a = sorted(
        (r["vec_id"], r["cluster"], r["sq_dist"])
        for r in int_kmeans(df, k=3, iterations=3, dim=6).collect()
    )
    b = sorted(
        (r["vec_id"], r["cluster"], r["sq_dist"])
        for r in int_kmeans(df.repartition(13, "vec_id"), k=3, iterations=3, dim=6).collect()
    )
    assert a == b


def test_int_kmeans_empty_cluster_keeps_centroid(spark):
    from nebula_importer_spark.operators.similarity import int_kmeans

    # 2 distinct locations but k=3: the orphaned init centroid keeps its
    # coordinates and simply wins nothing (its seed point defects to the
    # tighter mass), so every point still lands in a real cluster.
    rows = [(i, [1.0, 0.0] if i < 5 else [0.0, 1.0]) for i in range(10)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = int_kmeans(df, k=3, iterations=3, dim=2).collect()
    assert len(out) == 10
    groups = {}
    for r in out:
        groups.setdefault(r["vec_id"] < 5, set()).add(r["cluster"])
    assert len(groups[True]) == 1 and len(groups[False]) == 1


def test_int_kmeans_rejects_bad_params(spark):
    from nebula_importer_spark.operators.similarity import int_kmeans

    df = spark.createDataFrame([(1, [0.0])], "vec_id long, embedding array<float>")
    with pytest.raises(ValueError):
        int_kmeans(df, k=0, iterations=1, dim=1)


def test_hard_negatives_excludes_same_label_and_nulls(spark):
    from nebula_importer_spark.operators.similarity import hard_negatives

    rows = [
        (1, [1.0, 0.0], 0),      # anchor
        (2, [0.99, 0.1], 0),     # nearest, SAME label → excluded
        (3, [0.9, 0.3], 1),      # nearest different-label → rank 1
        (4, [0.5, 0.5], 1),      # rank 2
        (5, [0.8, 0.2], None),   # NULL label → excluded
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    anchors = df.filter("vec_id = 1").select(
        F.col("vec_id").alias("anchor_id"),
        F.col("embedding").alias("anchor_vec"),
        F.col("label").alias("anchor_label"),
    )
    got = [(r["rank"], r["negative_id"]) for r in hard_negatives(df, anchors, k=3).collect()]
    assert got == [(1, 3), (2, 4)]


def test_semantic_dedup_pairs_within_cluster(spark):
    import numpy as np

    from nebula_importer_spark.operators.similarity import semantic_dedup_pairs

    rng = np.random.RandomState(5)
    c0 = rng.standard_normal(8).astype("float32")
    rows = []
    # cluster A: ids 0,1 near-identical (dup pair) + 2 distinct-direction
    rows.append((0, c0.tolist()))
    rows.append((1, (c0 * 1.0001).tolist()))
    rows.append((2, (c0 + 2.0 * rng.standard_normal(8).astype("float32")).tolist()))
    # cluster B: antipodal mass, no dups
    rows.append((3, (-c0).tolist()))
    rows.append((4, (-c0 + 2.0 * rng.standard_normal(8).astype("float32")).tolist()))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {
        (r["id_a"], r["id_b"])
        for r in semantic_dedup_pairs(df, k=2, iterations=3, dim=8, threshold=0.999).collect()
    }
    assert got == {(0, 1)}


def test_semantic_dedup_max_cluster_size_guard(spark):
    import numpy as np

    from nebula_importer_spark.operators.similarity import semantic_dedup_pairs

    rng = np.random.RandomState(9)
    c0 = rng.standard_normal(4).astype("float32")
    # one mega-cluster of 6 near-identical rows + a 2-row opposite cluster
    rows = [(i, (c0 * (1 + 1e-4 * i)).tolist()) for i in range(6)]
    rows += [(10, (-c0).tolist()), (11, (-c0 * 1.0001).tolist())]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {
        (r["id_a"], r["id_b"])
        for r in semantic_dedup_pairs(
            df, k=2, iterations=3, dim=4, threshold=0.999, max_cluster_size=3
        ).collect()
    }
    # the 6-row cluster is dropped wholesale; only the small cluster's pair survives
    assert got == {(10, 11)}


# ---------------------------------------------------------------------------
# blocking_audit (pair completeness / quality of a candidate stage)
# ---------------------------------------------------------------------------


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "id_a long, id_b long")


def test_blocking_audit_counts_and_ratios(spark):
    from nebula_importer_spark.operators.linking import blocking_audit

    truth = _pairs(spark, [(1, 2), (3, 4), (5, 6), (7, 8)])
    # catches 2 of 4 true pairs; 1 false candidate; reversed orientation
    # and duplicates must canonicalize away
    cand = _pairs(spark, [(2, 1), (1, 2), (3, 4), (9, 10)])
    r = blocking_audit(cand, truth).collect()[0]
    assert (r.n_truth, r.n_candidates, r.n_caught) == (4, 3, 2)
    assert r.recall_scaled == 10**12 * 2 // 4
    assert r.precision_scaled == 10**12 * 2 // 3


def test_blocking_audit_empty_sides(spark):
    from nebula_importer_spark.operators.linking import blocking_audit

    empty = _pairs(spark, [])
    truth = _pairs(spark, [(1, 2)])
    r = blocking_audit(empty, truth).collect()[0]
    assert (r.n_truth, r.n_candidates, r.n_caught) == (1, 0, 0)
    assert r.recall_scaled == 0 and r.precision_scaled is None
    r = blocking_audit(truth, empty).collect()[0]
    assert (r.n_truth, r.n_candidates, r.n_caught) == (0, 1, 0)
    assert r.recall_scaled is None and r.precision_scaled == 0


def test_blocking_audit_random_model(spark):
    import random

    from nebula_importer_spark.operators.linking import blocking_audit

    rng = random.Random(11)
    truth = {(a, b) for a, b in
             ((rng.randrange(30), rng.randrange(30)) for _ in range(60))
             if a != b}
    cand = {p for p in truth if rng.random() < 0.6} | {
        (rng.randrange(30), rng.randrange(30)) for _ in range(20)
    }
    cand = {p for p in cand if p[0] != p[1]}
    tc = {tuple(sorted(p)) for p in truth}
    cc = {tuple(sorted(p)) for p in cand}
    r = blocking_audit(
        _pairs(spark, sorted(cand)), _pairs(spark, sorted(truth))
    ).collect()[0]
    caught = len(tc & cc)
    assert (r.n_truth, r.n_candidates, r.n_caught) == (len(tc), len(cc), caught)
    assert r.recall_scaled == 10**12 * caught // len(tc)
    assert r.precision_scaled == 10**12 * caught // len(cc)


# ---------------------------------------------------------------------------
# int8_topk (scalar-quantized ANN)
# ---------------------------------------------------------------------------


def _emb_frame(spark, n=200, dim=16, seed=3):
    import random

    rng = random.Random(seed)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(dim)]) for i in range(n)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_int8_topk_recall_vs_float(spark):
    from nebula_importer_spark.operators.similarity import (
        brute_force_topk,
        int8_topk,
    )

    emb = _emb_frame(spark)
    q = emb.filter("vec_id < 4").selectExpr(
        "vec_id AS query_id", "embedding AS query_vec"
    )
    k = 10
    f = brute_force_topk(emb, q, k=k)
    i8 = int8_topk(emb, q, k=k)
    ff = {(r.query_id, r.neighbor_id) for r in f.collect()}
    qq = {(r.query_id, r.neighbor_id) for r in i8.collect()}
    recall = len(ff & qq) / len(ff)
    # int8 over 16 dims keeps ~0.4% quantization error per component:
    # top-10 overlap with the float ranking stays high
    assert recall >= 0.8, recall
    # and the quantized scores track the float cosine closely where ranked
    fs = {(r.query_id, r.neighbor_id): r.cosine for r in f.collect()}
    for r in i8.collect():
        if (r.query_id, r.neighbor_id) in fs:
            assert abs(r.cosine_q - fs[(r.query_id, r.neighbor_id)]) < 0.02


def test_int8_topk_deterministic_and_exact_ints(spark):
    from nebula_importer_spark.operators.similarity import int8_topk

    emb = _emb_frame(spark, n=60)
    q = emb.filter("vec_id < 2").selectExpr(
        "vec_id AS query_id", "embedding AS query_vec"
    )
    a = sorted(map(tuple, int8_topk(emb, q, k=5).collect()))
    b = sorted(map(tuple, int8_topk(emb, q, k=5).collect()))
    assert a == b and len(a) == 10


def test_int8_topk_drops_zero_vectors_and_validates(spark):
    import pytest

    from nebula_importer_spark.operators.similarity import int8_topk

    rows = [(0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [0.0, 0.0])]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = emb.filter("vec_id = 0").selectExpr(
        "vec_id AS query_id", "embedding AS query_vec"
    )
    got = int8_topk(emb, q, k=5).collect()
    # the zero vector has no cosine: only neighbor 1 is ranked
    assert [(r.neighbor_id, r.rank) for r in got] == [(1, 1)]
    with pytest.raises(ValueError):
        int8_topk(emb, q, k=5, max_abs=0.0)


# ---------------------------------------------------------------------------
# fuzzy_join_editdist — exact edit-distance join via symmetric deletes


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _fuzzy_model(lrows, rrows, d):
    return sorted(
        (li, ri, _lev(lt, rt))
        for li, lt in lrows
        for ri, rt in rrows
        if _lev(lt, rt) <= d
    )


def _fuzzy_dfs(spark, lrows, rrows):
    l = spark.createDataFrame(lrows, "id_a long, name_a string")
    r = spark.createDataFrame(rrows, "id_b long, name_b string")
    return l, r


def test_fuzzy_join_editdist_random_parity(spark):
    import random

    from nebula_importer_spark.operators.linking import fuzzy_join_editdist

    rng = random.Random(11)
    alpha = "abcd"
    mk = lambda: "".join(rng.choice(alpha) for _ in range(rng.randint(0, 6)))
    lrows = [(i, mk()) for i in range(40)]
    rrows = [(i, mk()) for i in range(40)]
    for d in (0, 1, 2):
        got = sorted(
            (r.id_a, r.id_b, r.dist)
            for r in fuzzy_join_editdist(
                *_fuzzy_dfs(spark, lrows, rrows), max_dist=d
            ).collect()
        )
        assert got == _fuzzy_model(lrows, rrows, d), f"d={d}"


def test_fuzzy_join_editdist_cases(spark):
    from nebula_importer_spark.operators.linking import fuzzy_join_editdist

    lrows = [(1, "kitten"), (2, ""), (3, "ab")]
    rrows = [(1, "sitten"), (2, "a"), (3, "ba"), (4, "kittens"), (5, "itten")]
    got = sorted(
        (r.id_a, r.id_b, r.dist)
        for r in fuzzy_join_editdist(
            *_fuzzy_dfs(spark, lrows, rrows), max_dist=1
        ).collect()
    )
    # kitten: substitution (sitten), insert (kittens), delete (itten)
    # "": one insert to "a"; "ab": substitution-pair to "ba" is dist 2 (OUT)
    assert got == [(1, 1, 1), (1, 4, 1), (1, 5, 1), (2, 2, 1), (3, 2, 1)]


def test_fuzzy_join_editdist_validation(spark):
    from nebula_importer_spark.operators.linking import fuzzy_join_editdist

    l, r = _fuzzy_dfs(spark, [(1, "x")], [(1, "y")])
    with pytest.raises(ValueError, match="max_dist"):
        fuzzy_join_editdist(l, r, max_dist=3)
    with pytest.raises(ValueError, match="not in left"):
        fuzzy_join_editdist(l.drop("name_a"), r)


# ---------------------------------------------------------------------------
# random_project — Johnson–Lindenstrauss seeded projection


def test_random_project_matches_numpy(spark):
    import numpy as np

    from nebula_importer_spark.operators.similarity import random_project

    rng = np.random.RandomState(7)
    vecs = rng.standard_normal((20, 16)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(20)],
        "vec_id long, embedding array<float>",
    )
    got = {
        r.vec_id: list(r.proj)
        for r in random_project(df, out_dim=4, dim=16, seed=42).collect()
    }
    planes = np.random.RandomState(42).standard_normal((4, 16)) / 2.0
    for i in range(20):
        want = [
            int(round(float(sum(float(a) * float(b) for a, b in zip(vecs[i].astype(np.float64), row))) * 1e6))
            for row in planes
        ]
        assert got[i] == want, i


def test_random_project_distance_preservation(spark):
    import numpy as np

    from nebula_importer_spark.operators.similarity import random_project

    rng = np.random.RandomState(3)
    n, d, k = 40, 64, 16
    vecs = rng.standard_normal((n, d))
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(n)],
        "vec_id long, embedding array<float>",
    )
    proj = {
        r.vec_id: np.array(r.proj, dtype=np.float64) / 1e6
        for r in random_project(df, out_dim=k, dim=d, seed=42).collect()
    }
    ratios = []
    for i in range(n):
        for j in range(i + 1, n):
            orig = float(np.sum((vecs[i] - vecs[j]) ** 2))
            prj = float(np.sum((proj[i] - proj[j]) ** 2))
            ratios.append(prj / orig)
    ratios = np.array(ratios)
    # JL at k=16: unbiased in expectation, concentrated; seed-fixed so stable
    assert 0.85 < float(np.median(ratios)) < 1.15
    assert (np.abs(ratios - 1) < 0.8).mean() > 0.9


def test_random_project_validation(spark):
    from nebula_importer_spark.operators.similarity import random_project

    df = spark.createDataFrame([(1, [0.0])], "vec_id long, embedding array<float>")
    with pytest.raises(ValueError, match="out_dim"):
        random_project(df, out_dim=0)
    with pytest.raises(ValueError, match="not in input"):
        random_project(df.drop("embedding"))


# ---------------------------------------------------------------------------
# power_iteration_pca — distributed top principal direction


def _pca_model(vecs, dim, n_iter, seed=42, scale=10**6):
    import numpy as np

    def quant(t):
        n = float(np.sqrt(float(np.dot(t, t))))
        u = t / n
        return np.sign(u) * np.floor(np.abs(u) * scale + 0.5) / scale

    v = quant(np.random.RandomState(seed).standard_normal(dim))
    X = np.array(vecs, dtype=np.float64)
    for _ in range(n_iter):
        v = quant(X.T @ (X @ v))
    for x in v:
        if x != 0.0:
            v = v if x > 0 else -v
            break
    return [int(round(x * scale)) for x in v]


def test_power_iteration_pca_matches_model_and_eig(spark):
    import numpy as np

    from nebula_importer_spark.operators.similarity import power_iteration_pca

    rng = np.random.RandomState(9)
    # anisotropic cloud: a dominant direction to find
    base = rng.standard_normal(16)
    vecs = [
        [float(x) for x in (rng.standard_normal(16) + 3.0 * rng.standard_normal() * base)]
        for _ in range(60)
    ]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    got = {
        r.dim_idx: r.loading6
        for r in power_iteration_pca(df, dim=16, n_iter=8).collect()
    }
    # float32 storage: the model must see the same float32-rounded values
    vecs32 = [[float(np.float32(x)) for x in v] for v in vecs]
    want = _pca_model(vecs32, 16, 8)
    assert [got[j] for j in range(16)] == want
    # and the direction agrees with the true top eigenvector
    X = np.array(vecs32)
    w, U = np.linalg.eigh(X.T @ X)
    top = U[:, -1]
    v = np.array([got[j] for j in range(16)], dtype=np.float64) / 1e6
    assert abs(float(np.dot(v, top))) > 0.999


def test_power_iteration_pca_sign_and_validation(spark):
    import numpy as np

    from nebula_importer_spark.operators.similarity import power_iteration_pca

    df = spark.createDataFrame(
        [(i, [1.0, 0.0]) for i in range(4)],
        "vec_id long, embedding array<float>",
    )
    got = {r.dim_idx: r.loading6 for r in power_iteration_pca(df, dim=2, n_iter=4).collect()}
    # dominant direction is +e0 after sign canonicalization
    assert got[0] == 10**6 and got[1] == 0
    with pytest.raises(ValueError, match="dim/n_iter"):
        power_iteration_pca(df, dim=0)
    with pytest.raises(ValueError, match="not in input"):
        power_iteration_pca(df.drop("embedding"))


# ---------------------------------------------------------------------------
# select_survivors — quality-aware canonicalization after components


def test_select_survivors_best_quality_and_ties(spark):
    from nebula_importer_spark.operators.dedup import select_survivors

    comp = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (7, 7), (8, 7), (9, 9)],
        "doc_id long, canonical_id long",
    )
    qual = spark.createDataFrame(
        [(1, 10), (2, 30), (3, 30), (7, 5), (9, 1)],  # 8 has no score
        "doc_id long, score long",
    )
    got = {
        r.doc_id: (r.survivor_id, r.is_survivor)
        for r in select_survivors(comp, qual).collect()
    }
    # cluster 1: 2 and 3 tie at 30 → min id 2; cluster 7: 8 unscored → 7
    assert got == {
        1: (2, False), 2: (2, True), 3: (2, False),
        7: (7, True), 8: (7, False), 9: (9, True),
    }


def test_select_survivors_all_unscored_cluster(spark):
    from nebula_importer_spark.operators.dedup import select_survivors

    comp = spark.createDataFrame(
        [(4, 4), (5, 4)], "doc_id long, canonical_id long"
    )
    qual = spark.createDataFrame([], "doc_id long, score long")
    got = {
        r.doc_id: r.survivor_id for r in select_survivors(comp, qual).collect()
    }
    # whole cluster unscored → NULLs sort last, min id survives
    assert got == {4: 4, 5: 4}


def test_select_survivors_validation(spark):
    from nebula_importer_spark.operators.dedup import select_survivors

    comp = spark.createDataFrame([(1, 1)], "doc_id long, canonical_id long")
    qual = spark.createDataFrame([(1, 1)], "doc_id long, score long")
    with pytest.raises(ValueError, match="not in components"):
        select_survivors(comp.drop("canonical_id"), qual)
    with pytest.raises(ValueError, match="not in quality"):
        select_survivors(comp, qual.drop("score"))


# ------------------------------------------------------------ ssjoin_prefix


def test_ssjoin_matches_all_pairs_jaccard(spark):
    import random

    from nebula_importer_spark.operators.dedup import ssjoin_prefix

    rng = random.Random(9)
    vocab = [f"w{i}" for i in range(40)]
    rows = []
    for i in range(40):
        k = rng.randint(5, 14)
        rows.append((i, " ".join(rng.sample(vocab, k))))
    # seed some near-dup pairs
    for i in range(40, 48):
        base = rows[i - 40][1]
        toks = base.split()
        toks[rng.randrange(len(toks))] = "zz"
        rows.append((i, " ".join(toks)))
    df = spark.createDataFrame(rows, "doc_id long, text string")

    def grams(t, n=2):
        tk = t.split()
        return {" ".join(tk[i : i + n]) for i in range(len(tk) - n + 1)}

    for thr in (0.3, 0.6):
        got = {
            (r.id_a, r.id_b): r.jaccard
            for r in ssjoin_prefix(df, n=2, threshold=thr).collect()
        }
        want = {}
        for i in range(len(rows)):
            for j in range(i + 1, len(rows)):
                a, b = grams(rows[i][1]), grams(rows[j][1])
                if not a or not b:
                    continue
                jac = len(a & b) / len(a | b)
                if jac >= thr:
                    want[(rows[i][0], rows[j][0])] = jac
        assert set(got) == set(want), thr
        for pair, jac in want.items():
            assert abs(got[pair] - jac) < 1e-12


def test_ssjoin_prefix_exposes_fewer_grams(spark):
    from pyspark.sql import functions as F

    from nebula_importer_spark.operators.dedup import ssjoin_prefix
    from nebula_importer_spark.operators.linking import word_ngrams

    # at threshold 0.8 a doc exposes ~21% of its grams as join keys
    rows = [(i, " ".join(f"t{i}_{j}" for j in range(50))) for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = ssjoin_prefix(df, n=2, threshold=0.8)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert out.count() == 0  # disjoint docs: no pairs, but plan is built


def test_ssjoin_validation(spark):
    import pytest

    from nebula_importer_spark.operators.dedup import ssjoin_prefix

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError):
        ssjoin_prefix(df, threshold=0.0)
    with pytest.raises(ValueError):
        ssjoin_prefix(df, threshold=1.5)
    with pytest.raises(ValueError):
        ssjoin_prefix(df, n=0)
    with pytest.raises(ValueError):
        ssjoin_prefix(df, id_col="missing")


def _kn_ref(score, train, precision=1_000_000):
    import math
    import re

    def toks(t):
        return re.findall(r"\S+", t or "")

    bi = {}
    ctx = {}
    contin = {}
    preds = {}
    vocab = set()
    for _, t in train:
        ws = toks(t)
        vocab.update(ws)
        for a, b in zip(ws, ws[1:]):
            bi[(a, b)] = bi.get((a, b), 0) + 1
            ctx[a] = ctx.get(a, 0) + 1
            contin.setdefault(a, set()).add(b)
            preds.setdefault(b, set()).add(a)
    t_types = len(bi)
    dp = t_types + len(vocab) + 1
    out = {}
    for did, t in score:
        ws = toks(t)
        grams = list(zip(ws, ws[1:]))
        if not grams:
            continue
        s = 0
        for a, b in grams:
            npp = len(preds.get(b, ())) + 1
            if a in ctx:
                num = max(4 * bi.get((a, b), 0) - 3, 0) * dp \
                    + 3 * len(contin[a]) * npp
                den = 4 * ctx[a] * dp
            else:
                num, den = npp, dp
            s += math.floor(math.log(num / den) * precision)
        ce = -s / (precision * len(grams))
        out[did] = (len(grams), round(ce, 6), round(math.exp(ce), 6))
    return out


def test_kneser_ney_matches_reference(spark):
    import random

    from nebula_importer_spark.operators.text import kneser_ney_lm_score

    rng = random.Random(13)
    vocab = [f"w{i}" for i in range(30)]
    mk = lambda L: " ".join(rng.choice(vocab) for _ in range(L))  # noqa: E731
    train = [(i, mk(rng.choice([0, 1, 5, 30]))) for i in range(40)]
    score = [(i, mk(rng.choice([0, 1, 2, 8, 40]))) for i in range(30)]
    score.append((99, "unseen tokens entirely outside the training set"))
    sdf = spark.createDataFrame(score, "doc_id long, text string")
    tdf = spark.createDataFrame(train, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_bigrams"], r["cross_entropy"], r["perplexity"])
        for r in kneser_ney_lm_score(sdf, tdf).collect()
    }
    assert got == _kn_ref(score, train)


def test_kneser_ney_continuation_prior(spark):
    """The San-Francisco property: 'francisco' and 'runs' are equally
    FREQUENT in training, but 'francisco' follows only 'san' while
    'runs' follows many contexts — after an unseen context the
    continuation prior must make 'runs' likelier than 'francisco'
    (an add-one unigram LM cannot tell them apart)."""
    from nebula_importer_spark.operators.text import kneser_ney_lm_score

    train = [
        (0, "san francisco san francisco san francisco san francisco"),
        (1, "he runs she runs it runs everyone runs"),
    ]
    score = [(10, "xx francisco"), (11, "xx runs")]
    sdf = spark.createDataFrame(score, "doc_id long, text string")
    tdf = spark.createDataFrame(train, "doc_id long, text string")
    ppl = {
        r["doc_id"]: r["perplexity"]
        for r in kneser_ney_lm_score(sdf, tdf).collect()
    }
    assert ppl[10] > ppl[11]


def test_textrank_central_sentence_wins(spark):
    """The hub sentence shares >= 2 tokens with every other sentence;
    the others only connect through it — PageRank must rank the hub
    first. A doc of all-disjoint sentences deterministically picks its
    first sentence at rank 0."""
    from nebula_importer_spark.operators.text import textrank_sentences

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma one. alpha beta two two. "
                "gamma alpha three four. five six seven eight."),
            (2, "aa bb. cc dd. ee ff."),  # no edges at all
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: (r.n_sentences, r.best_sidx, r.best_rank)
           for r in textrank_sentences(docs, min_common=2).collect()}
    # doc 1: sentence 1 ("alpha beta gamma one") is the hub
    assert got[1][0] == 4 and got[1][1] == 1 and got[1][2] > 0
    # doc 2: isolated sentences -> first sentence, rank 0
    assert got[2] == (3, 1, 0)


def test_textrank_window_mode_and_validation(spark):
    import pytest

    from nebula_importer_spark.operators.text import textrank_sentences

    docs = spark.createDataFrame(
        [(1, " ".join(["tok"] * 20)), (2, ""), (3, None)],
        "doc_id long, text string",
    )
    got = {r.doc_id: (r.n_sentences, r.best_sidx)
           for r in textrank_sentences(
               docs, min_common=1, window_tokens=8).collect()}
    # 20 tokens -> windows of 8,8,4 = 3 units, all sharing 'tok':
    # a clique; tie on rank breaks to the earliest index
    assert got[1] == (3, 1)
    assert 2 not in got and 3 not in got  # empty/null docs absent
    with pytest.raises(ValueError, match="min_common"):
        textrank_sentences(docs, min_common=0)
    with pytest.raises(ValueError, match="window_tokens"):
        textrank_sentences(docs, window_tokens=0)
    with pytest.raises(ValueError, match="not in input"):
        textrank_sentences(docs.drop("text"))


def test_log_odds_tokens_directional_and_model(spark):
    """Tokens exclusive to side 1 get z > 0, exclusive to side 2 z < 0,
    balanced tokens near 0; values match the Python Monroe et al.
    formula exactly (same IEEE chain)."""
    import math

    from nebula_importer_spark.operators.text import log_odds_tokens

    docs = spark.createDataFrame(
        [
            (True, "apple apple apple shared shared"),
            (True, "apple shared banana"),
            (False, "zebra zebra zebra shared shared"),
            (False, "zebra shared banana"),
        ],
        "side boolean, text string",
    )
    got = {r.token: r for r in
           log_odds_tokens(docs, "side", min_count=2).collect()}
    assert got["apple"].z > 0 and got["zebra"].z < 0
    assert abs(got["shared"].z) < 0.5 and abs(got["banana"].z) < 0.5
    # exact replica
    y = {"apple": (4, 0), "zebra": (0, 4), "shared": (3, 3),
         "banana": (1, 1)}
    n1, n2, v = 8, 8, 4
    for tok, (y1, y2) in y.items():
        d = math.log((y1 + 1) / (n1 + v - y1 - 1)) - math.log(
            (y2 + 1) / (n2 + v - y2 - 1))
        z = d / math.sqrt(1.0 / (y1 + 1) + 1.0 / (y2 + 1))
        assert got[tok].y1 == y1 and got[tok].y2 == y2
        assert got[tok].delta == d and got[tok].z == z, tok


def test_log_odds_tokens_validation(spark):
    import pytest

    from nebula_importer_spark.operators.text import log_odds_tokens

    df = spark.createDataFrame([(True, "x")], "side boolean, text string")
    with pytest.raises(ValueError, match="not in input"):
        log_odds_tokens(df, "zz")
    with pytest.raises(ValueError, match="min_count"):
        log_odds_tokens(df, "side", min_count=0)


# --- simplified_silhouette -------------------------------------------------


def _sil_model(pts, labels, dim, q=1 << 20, offset=2 * (1 << 20)):
    """Python model: quantize, recompute centroids (floor-mean), squared
    L2 a/b, micro-score with trunc-toward-zero division."""
    import math

    qv = {
        i: [math.floor(float(x) * q) + offset for x in v]
        for i, v in pts.items()
    }
    members = {}
    for i, c in labels.items():
        members.setdefault(c, []).append(i)
    cents = {}
    for c, ids in members.items():
        n = len(ids)
        cents[c] = [
            sum(qv[i][d] for i in ids) // n for d in range(dim)
        ]

    def d2(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    def trunc_div(x, y):
        qq, r = divmod(x, y)
        if qq < 0 and r != 0:
            qq += 1
        return qq

    agg = {}
    for i, c in labels.items():
        a = d2(qv[i], cents[c])
        others = [d2(qv[i], cents[o]) for o in cents if o != c]
        if not others:
            s = None
        else:
            b = min(others)
            m = max(a, b)
            s = 0 if m == 0 else trunc_div((b - a) * 1_000_000, m)
        n, t = agg.get(c, (0, 0))
        agg[c] = (n + 1, (t + s) if s is not None else None)
    out = {}
    for c, (n, t) in agg.items():
        out[c] = (n, t, trunc_div(t, n) if t is not None else None)
    return out


def test_silhouette_matches_model(spark):
    from nebula_importer_spark.operators.similarity import (
        simplified_silhouette,
    )

    import random

    rng = random.Random(31)
    pts, labels = {}, {}
    for i in range(60):
        c = i % 3
        base = [(-1.0, 0.0), (1.0, 0.5), (0.0, -1.0)][c]
        pts[i] = [b + rng.uniform(-0.2, 0.2) for b in base]
        labels[i] = c
    pdf = spark.createDataFrame(
        [(i, v) for i, v in pts.items()],
        "vec_id long, embedding array<double>",
    )
    adf = spark.createDataFrame(
        [(i, c) for i, c in labels.items()], "vec_id long, cluster int"
    )
    got = {
        r.cluster: (r.n_points, r.sil_sum_micro, r.sil_mean_micro)
        for r in simplified_silhouette(pdf, adf, dim=2).collect()
    }
    assert got == _sil_model(pts, labels, 2)
    # well-separated clusters score high
    assert all(v[2] > 800_000 for v in got.values())


def test_silhouette_misassigned_point_goes_negative(spark):
    from nebula_importer_spark.operators.similarity import (
        simplified_silhouette,
    )

    pts = {0: [0.0, 0.0], 1: [0.1, 0.0], 2: [1.0, 1.0], 3: [0.9, 1.0],
           4: [1.0, 0.9]}
    labels = {0: 0, 1: 0, 2: 1, 3: 1, 4: 0}  # point 4 mislabeled
    pdf = spark.createDataFrame(
        [(i, v) for i, v in pts.items()],
        "vec_id long, embedding array<double>",
    )
    adf = spark.createDataFrame(
        [(i, c) for i, c in labels.items()], "vec_id long, cluster int"
    )
    got = {
        r.cluster: (r.n_points, r.sil_sum_micro, r.sil_mean_micro)
        for r in simplified_silhouette(pdf, adf, dim=2).collect()
    }
    assert got == _sil_model(pts, labels, 2)


def test_silhouette_single_cluster_null_and_singleton_max(spark):
    from nebula_importer_spark.operators.similarity import (
        simplified_silhouette,
    )

    pdf = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [0.5, 0.5])],
        "vec_id long, embedding array<double>",
    )
    one = spark.createDataFrame([(0, 0), (1, 0)], "vec_id long, cluster int")
    rows = simplified_silhouette(pdf, one, dim=2).collect()
    assert rows[0].sil_mean_micro is None  # k=1: b undefined
    two = spark.createDataFrame([(0, 0), (1, 1)], "vec_id long, cluster int")
    got = {
        r.cluster: r.sil_mean_micro
        for r in simplified_silhouette(pdf, two, dim=2).collect()
    }
    # singletons: centroid IS the point -> a=0 -> s = +1e6
    assert got == {0: 1_000_000, 1: 1_000_000}


def test_silhouette_after_int_kmeans(spark):
    from nebula_importer_spark.operators.similarity import (
        int_kmeans,
        simplified_silhouette,
    )

    import random

    rng = random.Random(5)
    rows = []
    for i in range(40):
        base = [(-1.0, -1.0), (1.0, 1.0)][i % 2]
        rows.append((i, [b + rng.uniform(-0.1, 0.1) for b in base]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    km = int_kmeans(df, k=2, iterations=3, dim=2)
    out = simplified_silhouette(df, km, dim=2)
    got = out.collect()
    assert sum(r.n_points for r in got) == 40
    assert all(r.sil_mean_micro > 700_000 for r in got)


def test_silhouette_validation(spark):
    from nebula_importer_spark.operators.similarity import (
        simplified_silhouette,
    )

    pdf = spark.createDataFrame(
        [(0, [0.0])], "vec_id long, embedding array<double>"
    )
    adf = spark.createDataFrame([(0, 0)], "vec_id long, cluster int")
    with pytest.raises(ValueError):
        simplified_silhouette(pdf, adf, dim=0)
    with pytest.raises(ValueError):
        simplified_silhouette(pdf, adf, id_col="nope")
    with pytest.raises(ValueError):
        simplified_silhouette(pdf, adf.drop("cluster"))


def test_perceptual_hashes_invariances(spark):
    import numpy as np

    from nebula_importer_spark.operators.multimodal import (
        _phash_pair,
        encode_png,
        perceptual_hashes,
        resize_nearest,
        synth_assets,
    )

    # structured gradient image: left half dark, right half bright
    base = np.zeros((32, 32, 1), dtype=np.uint8)
    base[:, 16:, 0] = 200
    png = encode_png(base)
    ok, a0, d0 = _phash_pair(png)
    assert ok
    # brightness shift: aHash/dHash both stable (threshold vs mean/gradient)
    shifted = np.clip(base.astype(int) + 30, 0, 255).astype(np.uint8)
    ok, a1, d1 = _phash_pair(encode_png(shifted))
    assert ok and a1 == a0 and d1 == d0
    # nearest-resized copy: same structure, same hashes
    small = resize_nearest(base, 16, 16)
    ok, a2, d2 = _phash_pair(encode_png(small))
    assert ok and a2 == a0 and d2 == d0
    # different structure: many differing bits
    other = np.zeros((32, 32, 1), dtype=np.uint8)
    other[16:, :, 0] = 200  # horizontal instead of vertical split
    ok, a3, d3 = _phash_pair(encode_png(other))
    ham = bin(a0 ^ a3).count("1")
    assert ok and ham >= 16

    # Spark leg: real PNG payloads decode (flag true, kernel hashes);
    # synth random-bytes payloads take the flagged stand-in path
    from nebula_importer_spark.operators.multimodal import ASSET_SCHEMA

    png_rows_in = [
        (100, "image", png, "image/png", 32, 32, 1),
        (101, "image", encode_png(shifted), "image/png", 32, 32, 2),
    ]
    pngs = spark.createDataFrame(png_rows_in, ASSET_SCHEMA)
    assets = synth_assets(spark, n=6).unionByName(pngs)
    out = perceptual_hashes(assets).collect()
    assert len(out) == 8
    flags = {r.asset_id: r.decoded for r in out}
    assert flags[100] and flags[101]
    assert not any(flags[i] for i in range(6))  # random bytes: stand-in
    by_id = {r.asset_id: r for r in out}
    # the decoded rows carry the kernel hashes (brightness-invariant pair)
    assert (by_id[100].ahash, by_id[100].dhash) == (a0, d0)
    assert (by_id[101].ahash, by_id[101].dhash) == (a0, d0)
    for r in out:
        assert 0 <= r.ahash < 2**63 and 0 <= r.dhash < 2**63
    # determinism: second run identical
    again = perceptual_hashes(assets).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def _py_centroid_drift(rows, quant=1000, scale=10**6):
    import math
    from collections import defaultdict

    sums = defaultdict(lambda: None)
    counts = defaultdict(int)
    for g, vec in rows:
        if g is None or vec is None:
            continue
        q = [math.floor(x * quant) for x in vec]
        if sums[g] is None:
            sums[g] = q
        else:
            sums[g] = [a + b for a, b in zip(sums[g], q)]
        counts[g] += 1
    out = {}
    gs = sorted(counts)
    for i, a in enumerate(gs):
        for b in gs[i + 1:]:
            na, nb = counts[a], counts[b]
            num = sum(
                (sa * nb - sb * na) ** 2
                for sa, sb in zip(sums[a], sums[b])
            )
            out[(a, b)] = (
                na, nb, num * scale // (na * nb * quant) ** 2,
            )
    return out


def test_centroid_drift_parity_and_geometry(spark):
    import random

    from nebula_importer_spark.operators.similarity import centroid_drift

    rng = random.Random(19)
    rows = []
    # three groups: two near-identical distributions, one shifted by 1.0
    for g, shift in (("a", 0.0), ("b", 0.02), ("c", 1.0)):
        for _ in range(40):
            rows.append(
                (g, [shift + rng.uniform(-0.1, 0.1) for _ in range(8)])
            )
    rows.append((None, [0.0] * 8))
    rows.append(("a", None))
    df = spark.createDataFrame(
        rows, "label string, embedding array<double>"
    ).repartition(5)
    got = {
        (r.group_a, r.group_b): (r.n_a, r.n_b, r.dist2_micro)
        for r in centroid_drift(
            df, group_col="label", vec_col="embedding"
        ).collect()
    }
    want = _py_centroid_drift(
        [(g, v) for g, v in rows if g is not None and v is not None]
    )
    assert got == want
    # geometry: the shifted group is far from both others, a-b are close
    assert got[("a", "c")][2] > 100 * got[("a", "b")][2]
    # ~8 dims x 1.0 shift -> dist2 ~ 8 in micro units
    assert 6 * 10**6 < got[("a", "c")][2] < 10 * 10**6


def test_centroid_drift_validation(spark):
    import pytest

    from nebula_importer_spark.operators.similarity import centroid_drift

    df = spark.createDataFrame(
        [("a", [0.1])], "label string, embedding array<double>"
    )
    with pytest.raises(ValueError, match="quant"):
        centroid_drift(df, quant=0)
    with pytest.raises(ValueError, match="not in input"):
        centroid_drift(df, group_col="zz")
    with pytest.raises(ValueError, match="headroom"):
        centroid_drift(df, quant=2 * 10**9)  # max_n = 0 -> any group raises


def test_hamming_pairs_matches_brute_force(spark):
    import itertools
    import random

    from nebula_importer_spark.operators.dedup import hamming_pairs

    rng = random.Random(421)
    rows = []
    # 40 random 63-bit hashes plus planted near-duplicates at known dists
    for i in range(40):
        rows.append((i, rng.getrandbits(63)))
    nid = 100
    for base, flips in ((0, 1), (5, 2), (9, 3), (13, 4)):
        h = rows[base][1]
        for bit in rng.sample(range(63), flips):
            h ^= 1 << bit
        rows.append((nid, h))
        nid += 1
    df = spark.createDataFrame(rows, "asset_id long, hash64 long")
    got = {
        (r.id_a, r.id_b): r.dist
        for r in hamming_pairs(df, max_dist=3).collect()
    }
    want = {}
    for (ia, ha), (ib, hb) in itertools.combinations(rows, 2):
        d = bin(ha ^ hb).count("1")
        if d <= 3:
            want[(min(ia, ib), max(ia, ib))] = d
    assert got == want
    # the planted 4-bit flip must be excluded, the <=3 ones included
    assert (13, 103) not in got
    assert got[(0, 100)] == 1 and got[(9, 102)] == 3


def test_hamming_pairs_zero_dist_and_validation(spark):
    import pytest

    from nebula_importer_spark.operators.dedup import hamming_pairs

    df = spark.createDataFrame(
        [(1, 42), (2, 42), (3, 43), (4, None)],
        "asset_id long, hash64 long",
    )
    got = hamming_pairs(df, max_dist=0).collect()
    assert [(r.id_a, r.id_b, r.dist) for r in got] == [(1, 2, 0)]
    with pytest.raises(ValueError, match="max_dist"):
        hamming_pairs(df, max_dist=-1)
    with pytest.raises(ValueError, match="bits"):
        hamming_pairs(df, bits=64)
    with pytest.raises(ValueError, match="discriminating"):
        hamming_pairs(df, max_dist=8, bits=8)
    with pytest.raises(ValueError, match="not in input"):
        hamming_pairs(df, hash_col="zz")
