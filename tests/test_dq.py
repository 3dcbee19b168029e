"""operators/dq.py — declarative constraint suite and keyed snapshot
diff: hand-computed violation counts, null-safe change semantics,
single-agg-pass plan shape, validation."""

from __future__ import annotations

import pytest

from nebula_importer_spark.operators.dq import dq_constraints, table_diff


def _orders(spark):
    return spark.createDataFrame(
        [
            (1, 10, "O", 5.0),
            (2, 10, "F", 150.0),
            (3, None, "X", -1.0),   # null FK, bad status, bad range
            (4, 99, "O", 50.0),     # dangling FK
            (4, 10, "O", 50.0),     # duplicate key
        ],
        "k long, fk long, status string, price double",
    )


def _dim(spark):
    return spark.createDataFrame([(10,), (11,)], "ck long")


def test_dq_counts_hand_computed(spark):
    got = {
        r.rule: (r.kind, r.n_violations, r.passed)
        for r in dq_constraints(
            _orders(spark),
            [
                {"kind": "not_null", "col": "fk"},
                {"kind": "unique", "cols": ["k"]},
                {"kind": "in_set", "col": "status", "values": ["O", "F"]},
                {"kind": "in_range", "col": "price", "lo": 0.0, "hi": 100.0},
                {"kind": "matches", "col": "status", "pattern": "[OF]"},
                {"kind": "ref", "col": "fk", "ref": _dim(spark),
                 "ref_col": "ck"},
            ],
        ).collect()
    }
    assert got["not_null:fk"] == ("not_null", 1, False)
    assert got["unique:k"] == ("unique", 1, False)       # key 4 twice -> 1
    assert got["in_set:status"] == ("in_set", 1, False)  # 'X'
    assert got["in_range:price"] == ("in_range", 2, False)  # 150, -1
    assert got["matches:status"] == ("matches", 1, False)   # 'X'
    # NULL fk is NOT a ref violation (SQL FK semantics); 99 is
    assert got["ref:fk->ck"] == ("ref", 1, False)


def test_dq_all_green_and_empty_input(spark):
    clean = spark.createDataFrame([(1, "O")], "k long, status string")
    rules = [
        {"kind": "not_null", "col": "k"},
        {"kind": "unique", "cols": ["k"]},
        {"kind": "in_set", "col": "status", "values": ["O"]},
    ]
    assert all(r.passed for r in dq_constraints(clean, rules).collect())
    empty = clean.filter("k < 0")
    got = dq_constraints(empty, rules).collect()
    assert all(r.n_violations == 0 and r.passed for r in got)


def test_dq_validation(spark):
    df = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError, match="non-empty"):
        dq_constraints(df, [])
    with pytest.raises(ValueError, match="kind"):
        dq_constraints(df, [{"kind": "nope"}])
    with pytest.raises(ValueError, match="not in"):
        dq_constraints(df, [{"kind": "not_null", "col": "zz"}])
    with pytest.raises(ValueError, match="lo and hi"):
        dq_constraints(df, [{"kind": "in_range", "col": "k"}])


def test_table_diff_hand_computed(spark):
    left = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, "c", None), (4, "d", 4.0)],
        "k long, s string, p double",
    )
    right = spark.createDataFrame(
        [(1, "a", 1.0),        # unchanged
         (2, "B", 2.0),        # changed: s
         (3, "c", 3.0),        # changed: p (NULL -> value IS a change)
         (5, "e", 5.0)],       # added; 4 removed
        "k long, s string, p double",
    )
    got = {r.metric: r.n for r in table_diff(left, right, ["k"]).collect()}
    assert got == {
        "added": 1, "removed": 1, "changed": 2, "unchanged": 1,
        "changed:s": 1, "changed:p": 1,
    }


def test_table_diff_null_safe_unchanged(spark):
    left = spark.createDataFrame([(1, None)], "k long, s string")
    right = spark.createDataFrame([(1, None)], "k long, s string")
    got = {r.metric: r.n for r in table_diff(left, right, ["k"]).collect()}
    assert got["unchanged"] == 1 and got["changed"] == 0


def test_table_diff_validation(spark):
    df = spark.createDataFrame([(1, "a")], "k long, s string")
    with pytest.raises(ValueError, match="non-empty"):
        table_diff(df, df, [])
    with pytest.raises(ValueError, match="both frames"):
        table_diff(df, df.withColumnRenamed("k", "kk"), ["k"])


def _py_benford(colvals):
    from nebula_importer_spark.operators.dq import BENFORD_PPM

    def tdiv(a, b):
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b > 0) else -q

    out = {}
    for c, vals in colvals.items():
        good = [v for v in vals if v is not None and v != 0]
        if not good:
            continue
        n = len(good)
        nex = len(vals) - n
        obs = {d: 0 for d in range(1, 10)}
        for v in good:
            obs[int(str(abs(v))[0])] += 1
        chi = sum(
            tdiv(
                (obs[d] * 10**6 - n * e) ** 2, n * e
            )
            for d, e in BENFORD_PPM.items()
        )
        for d, e in BENFORD_PPM.items():
            out[(c, d)] = (
                obs[d], tdiv(obs[d] * 10**6, n), e, chi, n, nex,
            )
    return out


def test_benford_digits_and_grid_density(spark):
    from nebula_importer_spark.operators.dq import benford_audit

    df = spark.createDataFrame(
        [(123, 9), (19, 9), (205, 9), (None, 9), (0, 9), (-310, 9)],
        "a long, b long",
    )
    rows = benford_audit(df, ["a", "b"]).collect()
    got = {(r["column"], r.digit): r.asDict() for r in rows}
    # dense 9-digit grid per column
    assert len(rows) == 18
    a1 = got[("a", 1)]
    assert a1["n_obs"] == 2  # 123, 19
    assert a1["n_total"] == 4 and a1["n_excluded"] == 2
    assert got[("a", 2)]["n_obs"] == 1  # 205
    assert got[("a", 3)]["n_obs"] == 1  # -310 -> abs
    assert got[("a", 4)]["n_obs"] == 0  # dense zero row
    assert got[("b", 9)]["n_obs"] == 6 and got[("b", 9)]["n_total"] == 6
    expect = _py_benford({"a": [123, 19, 205, None, 0, -310],
                          "b": [9] * 6})
    for k, e in expect.items():
        g = got[k]
        assert (
            g["n_obs"], g["observed_ppm"], g["expected_ppm"],
            g["chi2_scaled"], g["n_total"], g["n_excluded"],
        ) == e, k


def test_benford_conforming_vs_uniform_chi2(spark):
    import random

    from nebula_importer_spark.operators.dq import benford_audit

    rng = random.Random(7)
    # log-uniform values are Benford-conforming; uniform values are not
    benford = [int(10 ** (rng.uniform(1, 6))) for _ in range(2000)]
    uniform = [rng.randrange(10**5, 10**6) for _ in range(2000)]
    df = spark.createDataFrame(
        list(zip(benford, uniform)), "good long, bad long"
    ).repartition(5)
    rows = benford_audit(df, ["good", "bad"]).collect()
    chi = {r["column"]: r["chi2_scaled"] for r in rows}
    assert chi["bad"] > 10 * chi["good"]
    expect = _py_benford({"good": benford, "bad": uniform})
    got = {(r["column"], r["digit"]): r for r in rows}
    for k, e in expect.items():
        g = got[k]
        assert (
            g["n_obs"], g["observed_ppm"], g["expected_ppm"],
            g["chi2_scaled"], g["n_total"], g["n_excluded"],
        ) == e, k


def test_benford_all_excluded_and_validation(spark):
    from nebula_importer_spark.operators.dq import benford_audit

    df = spark.createDataFrame([(0, 1.5)], "z long, f double")
    assert benford_audit(df, ["z"]).count() == 0  # no qualifying rows
    with pytest.raises(ValueError, match="at least one"):
        benford_audit(df, [])
    with pytest.raises(ValueError, match="not in input"):
        benford_audit(df, ["zzz"])
    with pytest.raises(ValueError, match="integral"):
        benford_audit(df, ["f"])


def test_referential_integrity_orphans_and_nulls(spark):
    from nebula_importer_spark.operators.dq import referential_integrity

    child = spark.createDataFrame(
        [(1, "a"), (2, "b"), (9, "c"), (9, "d"), (None, "e")],
        "fk long, payload string",
    ).repartition(3)
    parent = spark.createDataFrame(
        [(1,), (2,), (3,), (1,)], "pk long"  # dup parent keys dedup'd
    )
    r = referential_integrity(
        child, parent, fk_cols=["fk"], pk_cols=["pk"]
    ).collect()[0]
    assert (r.n_child, r.n_null_fk, r.n_checked) == (5, 1, 4)
    assert (r.n_orphans, r.n_orphan_keys) == (2, 1)  # both fk=9 rows
    assert r.holds is False
    assert r.orphan_ppm == 2 * 10**6 // 4

    # composite key + clean FK
    c2 = spark.createDataFrame([(1, "x", 1)], "a long, b string, i long")
    p2 = spark.createDataFrame([(1, "x")], "a long, b string")
    r2 = referential_integrity(
        c2, p2, fk_cols=["a", "b"], pk_cols=["a", "b"]
    ).collect()[0]
    assert r2.holds is True and r2.orphan_ppm == 0
    # all-NULL FKs: nothing checkable -> NULL ppm
    c3 = spark.createDataFrame([(None, "x")], "a long, b string")
    r3 = referential_integrity(
        c3, p2, fk_cols=["a"], pk_cols=["a"]
    ).collect()[0]
    assert (r3.n_checked, r3.holds, r3.orphan_ppm) == (0, True, None)


def test_referential_integrity_validation(spark):
    import pytest

    from nebula_importer_spark.operators.dq import referential_integrity

    c = spark.createDataFrame([(1,)], "a long")
    p = spark.createDataFrame([(1,)], "b long")
    with pytest.raises(ValueError, match="non-empty"):
        referential_integrity(c, p, fk_cols=[], pk_cols=["b"])
    with pytest.raises(ValueError, match="same arity"):
        referential_integrity(c, p, fk_cols=["a"], pk_cols=["b", "b"])
    with pytest.raises(ValueError, match="not in child"):
        referential_integrity(c, p, fk_cols=["zz"], pk_cols=["b"])
    with pytest.raises(ValueError, match="not in parent"):
        referential_integrity(c, p, fk_cols=["a"], pk_cols=["zz"])


def test_table_fingerprint_layout_and_sensitivity(spark):
    import hashlib

    from nebula_importer_spark.operators.dq import table_fingerprint

    rows = [(1, "a", None), (2, "b", "x"), (3, "c", "y")]
    df = spark.createDataFrame(rows, "id long, u string, v string")
    a = table_fingerprint(df, ["id", "u", "v"]).collect()[0]
    b = table_fingerprint(
        df.repartition(7).orderBy("v"), ["id", "u", "v"]
    ).collect()[0]
    assert (a.n_rows, a.fingerprint) == (b.n_rows, b.fingerprint)

    # independent reference of the pinned digest
    want = 0
    for i, u, v in rows:
        r = f"{i}|{u}|" + (v if v is not None else "\x00null")
        want += int(hashlib.md5(r.encode()).hexdigest()[:13], 16)
    assert a.fingerprint == want % 2**62

    # any single-row change must move the digest
    c = table_fingerprint(df.filter("id != 2"), ["id", "u", "v"]).collect()[0]
    assert c.fingerprint != a.fingerprint
    d = spark.createDataFrame(
        [(1, "a", None), (2, "B", "x"), (3, "c", "y")],
        "id long, u string, v string",
    )
    assert (
        table_fingerprint(d, ["id", "u", "v"]).collect()[0].fingerprint
        != a.fingerprint
    )


def test_table_fingerprint_rendering_is_injective(spark):
    """Values containing the delimiter, the escape char, or the NULL
    sentinel's NUL must NOT let two different tables share a rendering
    — ('a|b','c') vs ('a','b|c'), 'a\\' vs 'a\\\\', and a literal
    '\\x00null' vs a real NULL all fingerprint differently."""
    import hashlib

    from nebula_importer_spark.operators.dq import table_fingerprint

    def fp(rows):
        df = spark.createDataFrame(rows, "u string, v string")
        return table_fingerprint(df, ["u", "v"]).collect()[0].fingerprint

    assert fp([("a|b", "c")]) != fp([("a", "b|c")])
    assert fp([("a\\", "b")]) != fp([("a", "\\b")])
    assert fp([("a\\|", "b")]) != fp([("a\\", "|b")])
    assert fp([("\x00null", "b")]) != fp([(None, "b")])

    # pin the escaped rendering against an independent model
    def esc(v):
        if v is None:
            return "\x00null"
        return (
            v.replace("\\", "\\\\").replace("|", "\\|").replace("\x00", "\\0")
        )

    rows = [("a|b", None), ("x\\y", "\x00z")]
    want = 0
    for u, v in rows:
        want += int(
            hashlib.md5(f"{esc(u)}|{esc(v)}".encode()).hexdigest()[:13], 16
        )
    got = fp(rows)
    assert got == want % 2**62


def test_table_fingerprint_groups_and_validation(spark):
    import pytest

    from nebula_importer_spark.operators.dq import table_fingerprint

    df = spark.createDataFrame(
        [(1, "a", 0.5)], "id long, u string, f double"
    )
    g = table_fingerprint(df, ["id"], group_cols=["u"]).collect()
    assert len(g) == 1 and g[0].u == "a" and g[0].n_rows == 1
    with pytest.raises(ValueError, match="non-empty"):
        table_fingerprint(df, [])
    with pytest.raises(ValueError, match="quantize float"):
        table_fingerprint(df, ["f"])
    with pytest.raises(ValueError, match="overlap"):
        table_fingerprint(df, ["id"], group_cols=["id"])
    with pytest.raises(ValueError, match="not in input"):
        table_fingerprint(df, ["zz"])
