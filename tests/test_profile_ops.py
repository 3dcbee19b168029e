

def test_quantile_normalize_python_parity(spark):
    import random

    from nebula_importer_spark.operators.profile import quantile_normalize

    rng = random.Random(8)
    rows = []
    nid = 0
    for g, lo, hi, n in (("a", 50, 90, 37), ("b", 0, 30, 53), ("c", 5, 5, 1)):
        for _ in range(n):
            rows.append((g, nid, rng.randint(lo, hi)))
            nid += 1
    df = spark.createDataFrame(rows, "g string, id long, v long")
    got = {r.id: r.norm_value for r in quantile_normalize(df, "g", "v", "id").collect()}

    # independent reference
    glob = sorted(v for _, _, v in rows)
    N = len(glob)
    want = {}
    for g in ("a", "b", "c"):
        grp = sorted(((v, i) for gg, i, v in rows if gg == g))
        ng = len(grp)
        for r0, (v, i) in enumerate(grp):
            if ng == 1:
                tgt = (N + 1) // 2
            else:
                tgt = 1 + (r0 * (N - 1) * 2 + (ng - 1)) // ((ng - 1) * 2)
            want[i] = glob[tgt - 1]
    assert got == want


def test_quantile_normalize_endpoints_and_validation(spark):
    import pytest

    from nebula_importer_spark.operators.profile import quantile_normalize

    rows = [("a", 1, 1000), ("a", 2, 2000), ("b", 3, 5), ("b", 4, 7)]
    df = spark.createDataFrame(rows, "g string, id long, v long")
    got = {r.id: r.norm_value for r in quantile_normalize(df, "g", "v", "id").collect()}
    # each group's min -> global min, max -> global max
    assert got[1] == 5 and got[3] == 5
    assert got[2] == 2000 and got[4] == 2000
    fl = spark.createDataFrame([("a", 1, 0.5)], "g string, id long, v double")
    with pytest.raises(ValueError, match="integral"):
        quantile_normalize(fl, "g", "v", "id")
    with pytest.raises(ValueError, match="not in input"):
        quantile_normalize(df, "zz", "v", "id")


def test_fd_discovery_exact_g3(spark):
    from nebula_importer_spark.operators.profile import fd_discovery

    rows = [(1, "a", "x", 1), (2, "a", "x", 1), (3, "b", "y", 1), (4, "b", "z", 1)]
    df = spark.createDataFrame(rows, "id long, u string, v string, w long")
    got = {
        (r.col_a, r.col_b): (r.n_violations, r.fd_ppm)
        for r in fd_discovery(df, "id", ["u", "v", "w"]).collect()
    }
    assert got[("u", "v")] == (1, 750000)   # b -> {y,z}: delete 1 of 4
    assert got[("v", "u")] == (0, 1000000)  # v determines u perfectly
    assert got[("u", "w")] == (0, 1000000)
    assert got[("w", "u")] == (2, 500000)   # constant w: keep max class
    assert len(got) == 6  # all ordered pairs


def test_fd_discovery_nulls_and_validation(spark):
    import pytest

    from nebula_importer_spark.operators.profile import fd_discovery

    rows = [(1, "a", "x"), (2, "a", None), (3, None, "y")]
    df = spark.createDataFrame(rows, "id long, u string, v string")
    got = {
        (r.col_a, r.col_b): r.n_rows
        for r in fd_discovery(df, "id", ["u", "v"]).collect()
    }
    # only row 1 has both sides non-NULL
    assert got[("u", "v")] == 1 and got[("v", "u")] == 1
    with pytest.raises(ValueError, match="at least two"):
        fd_discovery(df, "id", ["u"])
    with pytest.raises(ValueError, match="distinct"):
        fd_discovery(df, "id", ["u", "u"])
    with pytest.raises(ValueError, match="not in input"):
        fd_discovery(df, "id", ["u", "zz"])
