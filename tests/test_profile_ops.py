

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


def test_psi_drift_python_parity_and_sensitivity(spark):
    import math
    import random

    from nebula_importer_spark.operators.profile import psi_drift

    rng = random.Random(2)
    rows = [("a", rng.randint(0, 100)) for _ in range(500)]
    rows += [("b", rng.randint(30, 130)) for _ in range(400)]
    df = spark.createDataFrame(rows, "g string, v long")
    got = psi_drift(df, "g", "v", "a", "b", n_cells=10).collect()[0]

    vs = [v for _, v in rows]
    mn, span = min(vs), max(vs) - min(vs) + 1
    ca, cb = [0] * 10, [0] * 10
    for g, v in rows:
        (ca if g == "a" else cb)[(v - mn) * 10 // span] += 1
    na, nb = sum(ca), sum(cb)
    want = 0
    for i in range(10):
        p = (ca[i] + 1) / (na + 10)
        q = (cb[i] + 1) / (nb + 10)
        want += math.floor((p - q) * math.log(p / q) * 10**6)
    assert (got.n_a, got.n_b, got.psi_micro) == (na, nb, want)
    assert got.psi_micro > 250_000  # clearly drifted

    same = spark.createDataFrame(
        [("a", i % 50) for i in range(1000)]
        + [("b", i % 50) for i in range(1000)],
        "g string, v long",
    )
    r = psi_drift(same, "g", "v", "a", "b").collect()[0]
    assert r.psi_micro == 0  # identical distributions

    # buckets empty on BOTH sides still contribute their smoothing term
    # when n_a != n_b — values land only in the extreme cells, the 8
    # middle cells are empty everywhere, and the slice sizes differ
    gap_rows = [("a", 0)] * 30 + [("a", 99)] * 30 + [("b", 0)] * 7 + [
        ("b", 99)
    ] * 7
    gap = spark.createDataFrame(gap_rows, "g string, v long")
    gg = psi_drift(gap, "g", "v", "a", "b", n_cells=10).collect()[0]
    gca, gcb = [0] * 10, [0] * 10
    for g, v in gap_rows:
        (gca if g == "a" else gcb)[(v - 0) * 10 // 100] += 1
    gwant = 0
    for i in range(10):
        p = (gca[i] + 1) / (60 + 10)
        q = (gcb[i] + 1) / (14 + 10)
        gwant += math.floor((p - q) * math.log(p / q) * 10**6)
    assert (gg.n_a, gg.n_b, gg.psi_micro) == (60, 14, gwant)
    # the 8 both-empty cells' terms are strictly positive here, so the
    # completed-grid sum must exceed the occupied-cells-only sum
    occupied_only = sum(
        math.floor(
            ((gca[i] + 1) / 70 - (gcb[i] + 1) / 24)
            * math.log(((gca[i] + 1) / 70) / ((gcb[i] + 1) / 24))
            * 10**6
        )
        for i in (0, 9)
    )
    assert gg.psi_micro > occupied_only


def test_psi_drift_validation(spark):
    import pytest

    from nebula_importer_spark.operators.profile import psi_drift

    df = spark.createDataFrame([("a", 1)], "g string, v long")
    with pytest.raises(ValueError, match="n_cells"):
        psi_drift(df, "g", "v", "a", "b", n_cells=1)
    with pytest.raises(ValueError, match="must differ"):
        psi_drift(df, "g", "v", "a", "a")
    with pytest.raises(Exception, match="slice is empty"):
        psi_drift(df, "g", "v", "a", "b").collect()
