"""operators/privacy.py — k-anonymity / l-diversity release audits, plus
the entity co-mention projection (transcripts/entities.py)."""

from __future__ import annotations

import pytest

from nebula_importer_spark.operators.privacy import (
    k_anonymity_violations,
    l_diversity_violations,
)

ROWS = [
    # (zip, age_band, diagnosis)
    ("94110", "30s", "flu"),
    ("94110", "30s", "flu"),
    ("94110", "30s", "cold"),
    ("94110", "40s", "flu"),      # class of 1 -> k violation
    ("02139", "30s", "flu"),
    ("02139", "30s", "flu"),      # class of 2, homogeneous -> l violation
    (None, "30s", "cold"),        # NULL QI forms its own class of 1
]
SCHEMA = "zip string, age_band string, diagnosis string"


def test_k_anonymity_flags_small_classes(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    got = {
        (r.zip, r.age_band): r.group_size
        for r in k_anonymity_violations(df, ["zip", "age_band"], 3).collect()
    }
    assert got == {("94110", "40s"): 1, ("02139", "30s"): 2, (None, "30s"): 1}
    # k=2: only the singletons remain
    got = {
        (r.zip, r.age_band)
        for r in k_anonymity_violations(df, ["zip", "age_band"], 2).collect()
    }
    assert got == {("94110", "40s"), (None, "30s")}


def test_l_diversity_flags_homogeneous_classes(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    got = {
        (r.zip, r.age_band): (r.group_size, r.n_sensitive)
        for r in l_diversity_violations(
            df, ["zip", "age_band"], "diagnosis", 2
        ).collect()
    }
    # (94110, 30s) has {flu, cold} = 2 distinct -> passes at l=2
    assert got == {
        ("94110", "40s"): (1, 1),
        ("02139", "30s"): (2, 1),
        (None, "30s"): (1, 1),
    }


def test_l_diversity_null_sensitive_does_not_count(spark):
    df = spark.createDataFrame(
        [("z", "a", "flu"), ("z", "a", None), ("z", "a", None)], SCHEMA
    )
    out = l_diversity_violations(df, ["zip"], "diagnosis", 2).collect()
    assert len(out) == 1 and out[0].n_sensitive == 1  # NULLs disclose nothing


def test_privacy_validation(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    with pytest.raises(ValueError):
        k_anonymity_violations(df, [], 3)
    with pytest.raises(ValueError):
        k_anonymity_violations(df, ["zip", "zip"], 3)
    with pytest.raises(ValueError):
        k_anonymity_violations(df, ["zip"], 1)
    with pytest.raises(ValueError):
        l_diversity_violations(df, ["zip"], "zip", 2)
    with pytest.raises(ValueError):
        l_diversity_violations(df, ["zip"], "diagnosis", 1)


# ---------------------------------------------------------------------------
# comention_edges
# ---------------------------------------------------------------------------


def _triples(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, subj string, pred string, obj string"
    )


def test_comention_counts_conversations_not_triples(spark):
    from nebula_importer_spark.transcripts.entities import comention_edges

    rows = [
        # conv 1: a-b asserted TWICE (two turns) -> still one conv
        ("1", 0, "a", "knows", "b"),
        ("1", 1, "a", "likes", "b"),
        # conv 2: a-b again, plus c via a second triple
        ("2", 0, "a", "knows", "b"),
        ("2", 1, "b", "knows", "c"),
    ]
    got = {
        (r.ent_a, r.ent_b): r.n_convs
        for r in comention_edges(_triples(spark, rows)).collect()
    }
    # a-c co-mentioned in conv 2 despite NO direct triple between them
    assert got == {("a", "b"): 2, ("a", "c"): 1, ("b", "c"): 1}


def test_comention_mega_thread_guard(spark):
    from nebula_importer_spark.transcripts.entities import comention_edges

    rows = [("big", 0, f"e{i}", "knows", f"e{i+1}") for i in range(10)] + [
        ("small", 0, "x", "knows", "y")
    ]
    got = {
        (r.ent_a, r.ent_b)
        for r in comention_edges(
            _triples(spark, rows), max_group_size=4
        ).collect()
    }
    assert got == {("x", "y")}  # the 11-entity thread is dropped
    with pytest.raises(ValueError):
        comention_edges(_triples(spark, rows), max_group_size=1)


def test_t_closeness_flags_skewed_class(spark):
    """A class with the same size and full diversity but all-HIGH values
    must flag; a class mirroring the global distribution must not."""
    from nebula_importer_spark.operators.privacy import t_closeness_emd

    # a LARGE near-uniform class dominates the global mix; a small
    # same-diversity class sits entirely at the top of the domain
    rows = (
        [("mirror", v) for v in (1, 2, 3, 4) * 20]
        + [("rich", v) for v in (3, 4, 4, 4) * 4]
    )
    df = spark.createDataFrame(rows, "seg string, val long")

    def model(counts, globs, m):
        nc, nt = sum(counts), sum(globs)
        cum_c = cum_g = s = 0
        for cc, gg in zip(counts, globs):
            cum_c += cc
            cum_g += gg
            s += abs(cum_c * nt - cum_g * nc)
        return (1_000_000 * s) // (nc * nt * (m - 1))

    globs = [20, 20, 24, 32]  # value counts 1..4 over both classes
    want_rich = model([0, 0, 4, 12], globs, 4)
    want_mirror = model([20, 20, 20, 20], globs, 4)
    assert want_mirror < 100_000 < want_rich
    got = {r.seg: r.emd_ppm for r in
           t_closeness_emd(df, ["seg"], "val",
                           t_threshold_ppm=100_000).collect()}
    assert got == {"rich": want_rich}
    got_all = {r.seg: r.emd_ppm for r in
               t_closeness_emd(df, ["seg"], "val",
                               t_threshold_ppm=0).collect()}
    assert got_all == {"rich": want_rich, "mirror": want_mirror}


def test_t_closeness_nulls_and_validation(spark):
    from nebula_importer_spark.operators.privacy import t_closeness_emd

    df = spark.createDataFrame(
        [("a", 1), ("a", None), ("b", 9)], "seg string, val long"
    )
    # NULL sensitive excluded on both sides; extreme split -> both flag
    got = t_closeness_emd(df, ["seg"], "val", t_threshold_ppm=0).collect()
    assert {r.seg for r in got} == {"a", "b"}
    assert all(r.group_size == 1 for r in got)
    with pytest.raises(ValueError, match="quasi-identifier"):
        t_closeness_emd(df, ["val"], "val")
    with pytest.raises(ValueError, match="t_threshold_ppm"):
        t_closeness_emd(df, ["seg"], "val", t_threshold_ppm=2_000_000)


def _py_mondrian(rows, nd, k, rounds):
    """Independent model of the deterministic single-cut Mondrian."""
    groups = {"r": [r for r in rows if all(v is not None for v in r)]}
    for _ in range(rounds):
        decs = {}
        for g, rs in groups.items():
            n = len(rs)
            if n < 2 * k:
                continue
            spans = [
                (max(r[i] for r in rs) - min(r[i] for r in rs), i)
                for i in range(nd)
            ]
            span, dim = max(spans, key=lambda t: (t[0], -t[1]))
            if span <= 0:
                continue
            vals = sorted(r[dim] for r in rs)
            s = vals[(n - 1) // 2]
            left = sum(1 for r in rs if r[dim] <= s)
            if left >= k and n - left >= k:
                decs[g] = (dim, s)
        if not decs:
            break
        nxt = {}
        for g, rs in groups.items():
            if g in decs:
                dim, s = decs[g]
                nxt.setdefault(g + "L", []).extend(
                    r for r in rs if r[dim] <= s
                )
                nxt.setdefault(g + "R", []).extend(
                    r for r in rs if r[dim] > s
                )
            else:
                nxt[g] = rs
        groups = nxt
    out = []
    for g, rs in sorted(groups.items()):
        row = [g, len(rs)]
        for i in range(nd):
            row.append(min(r[i] for r in rs))
            row.append(max(r[i] for r in rs))
        out.append(tuple(row))
    return sorted(out)


def test_mondrian_basic_split_and_k_floor(spark):
    from nebula_importer_spark.operators.privacy import mondrian_anonymize

    # 2 clear clusters of 3 along dim a -> one cut at the median
    rows = [(0, 5), (1, 5), (2, 5), (100, 5), (101, 5), (102, 5)]
    df = spark.createDataFrame(rows, "a long, b long")
    got = sorted(
        (
            r.group_id, r.n_rows, r.a_lo, r.a_hi, r.b_lo, r.b_hi,
        )
        for r in mondrian_anonymize(df, ["a", "b"], k=3).collect()
    )
    assert got == [
        ("rL", 3, 0, 2, 5, 5),
        ("rR", 3, 100, 102, 5, 5),
    ]
    # k = 4 forbids the cut: single root box
    got4 = mondrian_anonymize(df, ["a", "b"], k=4).collect()
    assert len(got4) == 1 and got4[0].n_rows == 6


def test_mondrian_every_group_at_least_k(spark):
    import random

    from nebula_importer_spark.operators.privacy import mondrian_anonymize

    rng = random.Random(88)
    rows = [
        (rng.randrange(100), rng.randrange(50), rng.randrange(10))
        for _ in range(200)
    ]
    df = spark.createDataFrame(rows, "a long, b long, c long").repartition(
        6
    )
    out = mondrian_anonymize(df, ["a", "b", "c"], k=20).collect()
    assert all(r.n_rows >= 20 for r in out)
    assert sum(r.n_rows for r in out) == 200
    got = sorted(
        (
            r.group_id, r.n_rows, r.a_lo, r.a_hi, r.b_lo, r.b_hi,
            r.c_lo, r.c_hi,
        )
        for r in out
    )
    assert got == _py_mondrian(rows, 3, 20, 8)


def test_mondrian_tie_heavy_median_blocks_cut(spark):
    from nebula_importer_spark.operators.privacy import mondrian_anonymize

    # 9 rows at value 0, 1 row at 10: median 0 -> left 9, right 1 < k
    rows = [(0,)] * 9 + [(10,)]
    df = spark.createDataFrame(rows, "a long")
    out = mondrian_anonymize(df, ["a"], k=2).collect()
    assert len(out) == 1 and out[0].n_rows == 10


def test_mondrian_nulls_small_input_validation(spark):
    from nebula_importer_spark.operators.privacy import mondrian_anonymize

    df = spark.createDataFrame(
        [(1, 1), (None, 2), (3, 3)], "a long, b long"
    )
    out = mondrian_anonymize(df, ["a", "b"], k=5).collect()
    assert len(out) == 1 and out[0].n_rows == 2  # NULL QI dropped, < k kept
    with pytest.raises(ValueError, match="qi_cols"):
        mondrian_anonymize(df, [], k=2)
    with pytest.raises(ValueError, match="duplicate"):
        mondrian_anonymize(df, ["a", "a"], k=2)
    with pytest.raises(ValueError, match="k must"):
        mondrian_anonymize(df, ["a"], k=0)
    with pytest.raises(ValueError, match="not in input"):
        mondrian_anonymize(df, ["zzz"], k=2)
    f = spark.createDataFrame([(1.5,)], "x double")
    with pytest.raises(ValueError, match="integral"):
        mondrian_anonymize(f, ["x"], k=2)


def test_pseudonymize_consistency_and_joins(spark):
    from pyspark.sql import functions as F

    from nebula_importer_spark.operators.privacy import (
        pseudonym_mapping,
        pseudonymize,
    )

    left = spark.createDataFrame(
        [(1, "alice", 10), (2, "bob", 20), (3, None, 30)],
        "uid long, name string, v long",
    )
    right = spark.createDataFrame(
        [(1, "x"), (1, "y"), (9, "z")], "uid long, w string"
    )
    lt = pseudonymize(left, ["uid", "name"], salt="s3cret")
    rt = pseudonymize(right, ["uid"], salt="s3cret")
    # referential consistency: tokenized join == raw join (same pair count)
    raw = left.join(right, "uid").count()
    tok = lt.join(rt, "uid").count()
    assert raw == tok == 2
    # NULL passes through
    assert lt.filter("uid is not null and name is null").count() == 1
    # same value in different columns -> different tokens
    two = spark.createDataFrame([("a", "a")], "x string, y string")
    tt = pseudonymize(two, ["x", "y"], salt="s").collect()[0]
    assert tt.x != tt.y and tt.x.startswith("tok_") and len(tt.x) == 20
    # deterministic across calls
    again = pseudonymize(left, ["uid", "name"], salt="s3cret")
    assert sorted(map(tuple, lt.collect())) == sorted(
        map(tuple, again.collect())
    )
    # different salt -> different tokens
    other = pseudonymize(left, ["uid"], salt="other")
    a = {r.uid for r in lt.collect()}
    b = {r.uid for r in other.collect()}
    assert a.isdisjoint(b)
    # mapping covers distinct non-null values, tokens match the transform
    m = pseudonym_mapping(left, "uid", salt="s3cret")
    mm = {r.value: r.token for r in m.collect()}
    assert set(mm) == {1, 2, 3}
    joined = left.join(
        m.withColumnRenamed("value", "uid"), "uid"
    ).select("token")
    lt_uids = {r.uid for r in lt.collect()}
    assert {r.token for r in joined.collect()} == lt_uids


def test_pseudonymize_validation(spark):
    import pytest

    from nebula_importer_spark.operators.privacy import (
        pseudonym_mapping,
        pseudonymize,
    )

    df = spark.createDataFrame([(1,)], "a long")
    with pytest.raises(ValueError, match="non-empty"):
        pseudonymize(df, [], salt="s")
    with pytest.raises(ValueError, match="salt"):
        pseudonymize(df, ["a"], salt="")
    with pytest.raises(ValueError, match="not in the frame"):
        pseudonymize(df, ["zz"], salt="s")
    with pytest.raises(ValueError, match="not in the frame"):
        pseudonym_mapping(df, "zz", salt="s")
