"""operators/layout.py — Z-order clustering keys and zone maps."""

from __future__ import annotations

import pytest

from nebula_importer_spark.operators.layout import zone_map, zorder_key


def _interleave_py(qs: list[int], bits: int) -> int:
    z = 0
    for i, q in enumerate(qs):
        for b in range(bits):
            z |= ((q >> b) & 1) << (b * len(qs) + i)
    return z


def test_zorder_matches_python_model(spark):
    rows = [(x, y) for x in range(0, 100, 7) for y in range(0, 900, 83)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = {(r.x, r.y): r.zkey for r in zorder_key(df, ["x", "y"], bits=8).collect()}
    xs = [r[0] for r in rows]
    ys = [r[1] for r in rows]
    mnx, mxx, mny, mxy = min(xs), max(xs), min(ys), max(ys)
    top = (1 << 8) - 1
    for x, y in rows:
        qx = (x - mnx) * top // max(mxx - mnx, 1)
        qy = (y - mny) * top // max(mxy - mny, 1)
        assert got[(x, y)] == _interleave_py([qx, qy], 8), (x, y)


def test_zorder_locality_beats_single_column_sort(spark):
    # The point of the key: bucket ranges are tight on BOTH dims.
    rows = [(x, y) for x in range(64) for y in range(64)]
    df = spark.createDataFrame(rows, "x long, y long")
    z = zorder_key(df, ["x", "y"], bits=6, n_buckets=16)
    zm = zone_map(z, "zbucket", ["x", "y"]).collect()
    # each of 16 equal z-ranges covers a 16x16-ish tile: both spans small
    for r in zm:
        assert r.x_max - r.x_min <= 31, r
        assert r.y_max - r.y_min <= 31, r
    # single-column layout: sorting by x leaves y's span full in every file
    assert max(r.y_max for r in zm) - min(r.y_min for r in zm) == 63


def test_zorder_nulls_and_three_dims(spark):
    df = spark.createDataFrame(
        [(1, 10, 5), (None, 20, 6), (3, None, 7)], "a long, b long, c long"
    )
    out = zorder_key(df, ["a", "b", "c"], bits=4).collect()
    assert all(r.zkey is not None for r in out)
    # NULL quantizes to 0 => contributes no bits in its lane
    nul = [r for r in out if r.a is None][0]
    low = [r for r in out if r.a == 1][0]  # a==min(a) also quantizes to 0
    assert nul.zkey >= 0 and low.zkey >= 0


def test_zorder_rejects_bad_inputs(spark):
    df = spark.createDataFrame([(1, 2.0)], "a long, f double")
    with pytest.raises(ValueError):
        zorder_key(df, ["a"])  # needs 2-3 dims
    with pytest.raises(ValueError):
        zorder_key(df, ["a", "f"])  # float dim
    with pytest.raises(ValueError):
        zorder_key(df, ["a", "missing"])
    with pytest.raises(ValueError):
        zorder_key(df.withColumnRenamed("f", "zkey"), ["a", "zkey"])


def test_zorder_plan_is_broadcast_not_shuffle(spark):
    df = spark.createDataFrame([(i, i * 3) for i in range(100)], "a long, b long")
    plan = zorder_key(df, ["a", "b"], bits=8)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    # the key itself must not introduce a data shuffle
    assert "Exchange hashpartitioning" not in plan


# --------------------------------------------------------- compaction_plan


def test_compaction_groups_bounded(spark):
    from nebula_importer_spark.operators.layout import compaction_plan

    files = [(f"f{i:02d}", s) for i, s in enumerate(
        [900, 700, 400, 300, 300, 200, 100, 100, 50, 50]
    )]
    df = spark.createDataFrame(files, "path string, size_bytes long")
    out = compaction_plan(df, target_bytes=1000).collect()
    by_grp = {}
    for r in out:
        by_grp.setdefault(r.compaction_group, []).append(r.size_bytes)
    # classic bound: every group's total < target + its largest file
    for sizes in by_grp.values():
        assert sum(sizes) < 1000 + max(sizes)
    # deterministic: size-desc sequential fill
    assert {r.path: r.compaction_group for r in out} == _fill_model(files, 1000)


def _fill_model(files, target):
    ordered = sorted(files, key=lambda t: (-t[1], t[0]))
    cum, out = 0, {}
    for p, s in ordered:
        out[p] = cum // target
        cum += s
    return out


def test_compaction_oversized_file_alone(spark):
    from nebula_importer_spark.operators.layout import compaction_plan

    df = spark.createDataFrame(
        [("big", 5000), ("a", 10), ("b", 10)], "path string, size_bytes long"
    )
    out = {r.path: r.compaction_group for r in compaction_plan(df, target_bytes=100).collect()}
    assert out["big"] == 0
    # the giant pushes everything after it past its own boundary
    assert out["a"] != 0 and out["b"] == out["a"]


def test_compaction_partitioned_independently(spark):
    from nebula_importer_spark.operators.layout import compaction_plan

    df = spark.createDataFrame(
        [("d1", "a", 60), ("d1", "b", 60), ("d2", "c", 60), ("d2", "d", 60)],
        "dt string, path string, size_bytes long",
    )
    out = compaction_plan(df, target_bytes=100, group_cols=["dt"]).collect()
    grp = {(r.dt, r.path): r.compaction_group for r in out}
    # each partition restarts at group 0
    assert grp[("d1", "a")] == 0 and grp[("d2", "c")] == 0


def test_compaction_validation(spark):
    import pytest

    from nebula_importer_spark.operators.layout import compaction_plan

    df = spark.createDataFrame([("a", 1)], "path string, size_bytes long")
    with pytest.raises(ValueError, match="target_bytes"):
        compaction_plan(df, target_bytes=0)
    with pytest.raises(ValueError, match="not in input"):
        compaction_plan(df.drop("size_bytes"), target_bytes=10)
    nul = spark.createDataFrame([("a", None)], "path string, size_bytes long")
    with pytest.raises(ValueError, match="NULL"):
        compaction_plan(nul, target_bytes=10)


def _hilbert_model(order, x, y):
    n = 1 << order
    s = n // 2
    d = 0
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x, y = n - 1 - x, n - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_is_a_hilbert_curve(spark):
    """Bijection onto [0, 4^bits) + unit-step adjacency between every
    consecutive pair of keys — together these CHARACTERIZE a Hilbert
    curve, so this is a complete correctness proof at bits=3."""
    from nebula_importer_spark.operators.layout import hilbert_key

    n = 8  # bits=3
    grid = spark.createDataFrame(
        [(x, y) for x in range(n) for y in range(n)], "x long, y long"
    )
    # identity quantization: min=0, max=7 = top of the 3-bit range
    rows = hilbert_key(grid, ["x", "y"], bits=3).collect()
    by_key = {r.hkey: (r.x, r.y) for r in rows}
    assert sorted(by_key) == list(range(n * n))
    for d in range(n * n - 1):
        (x1, y1), (x2, y2) = by_key[d], by_key[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1, d


def test_hilbert_matches_python_model_random(spark):
    import random

    from nebula_importer_spark.operators.layout import hilbert_key

    rng = random.Random(11)
    pts = [(rng.randint(0, 65535), rng.randint(0, 65535)) for _ in range(300)]
    pts += [(0, 0), (65535, 65535), (0, 65535)]
    df = spark.createDataFrame(pts, "x long, y long")
    got = {(r.x, r.y): r.hkey for r in
           hilbert_key(df, ["x", "y"], bits=16).collect()}
    # min/max of the sample define the quantization frame
    mnx, mxx = min(p[0] for p in pts), max(p[0] for p in pts)
    mny, mxy = min(p[1] for p in pts), max(p[1] for p in pts)
    top = (1 << 16) - 1
    for x, y in pts:
        qx = (x - mnx) * top // max(mxx - mnx, 1)
        qy = (y - mny) * top // max(mxy - mny, 1)
        assert got[(x, y)] == _hilbert_model(16, qx, qy), (x, y)


def test_hilbert_locality_beats_zorder_on_grid(spark):
    """The design claim made measurable: equal key-range buckets of the
    Hilbert curve have a total zone-map extent no worse than Z-order's
    on a uniform grid (tighter rectangles = better pruning)."""
    from nebula_importer_spark.operators.layout import (
        hilbert_key,
        zone_map,
        zorder_key,
    )

    n = 32
    grid = spark.createDataFrame(
        [(x, y) for x in range(n) for y in range(n)], "x long, y long"
    )

    def extent(df, bucket):
        zm = zone_map(df, bucket, ["x", "y"]).collect()
        return sum(
            (r.x_max - r.x_min + 1) * (r.y_max - r.y_min + 1) for r in zm
        )

    h = extent(hilbert_key(grid, ["x", "y"], bits=5, n_buckets=16), "hbucket")
    z = extent(zorder_key(grid, ["x", "y"], bits=5, n_buckets=16), "zbucket")
    assert h <= z, (h, z)


def test_hilbert_validation(spark):
    from nebula_importer_spark.operators.layout import hilbert_key

    df = spark.createDataFrame([(1, 2, 3.0)], "a long, b long, c double")
    with pytest.raises(ValueError, match="2-D"):
        hilbert_key(df, ["a"])
    with pytest.raises(ValueError, match="bits"):
        hilbert_key(df, ["a", "b"], bits=17)
    with pytest.raises(ValueError, match="integral"):
        hilbert_key(df, ["a", "c"])
    with pytest.raises(ValueError, match="reserved"):
        hilbert_key(df.withColumn("hkey", df.a), ["a", "b"])


def _audit_rows(spark, rows, layouts, preds):
    from nebula_importer_spark.operators.layout import pruning_audit

    df = spark.createDataFrame(
        rows, "b_sorted long, b_scatter long, x long, y long"
    )
    out = pruning_audit(df, layouts, preds)
    return {
        (r["layout"], r["pred_id"]): r.asDict() for r in out.collect()
    }


def test_pruning_audit_sorted_vs_scattered(spark):
    # x in 0..15; b_sorted clusters x into 4 tight buckets, b_scatter
    # round-robins so every bucket spans the full x range
    rows = [(i // 4, i % 4, i, 100 - i) for i in range(16)]
    got = _audit_rows(
        spark,
        rows,
        {"sorted": "b_sorted", "scatter": "b_scatter"},
        [("x_low", "x", 0, 3), ("x_mid", "x", 6, 9)],
    )
    s = got[("sorted", "x_low")]
    assert s["n_buckets"] == 4 and s["buckets_scanned"] == 1
    assert s["rows_total"] == 16 and s["rows_scanned"] == 4
    assert s["rows_matched"] == 4
    assert s["skip_ppm"] == (16 - 4) * 1_000_000 // 16
    # x_mid straddles buckets 1 and 2 under the sorted layout
    assert got[("sorted", "x_mid")]["buckets_scanned"] == 2
    # the scattered layout prunes nothing
    sc = got[("scatter", "x_low")]
    assert sc["buckets_scanned"] == 4 and sc["rows_scanned"] == 16
    assert sc["skip_ppm"] == 0
    assert sc["rows_matched"] == 4


def test_pruning_audit_zero_match_and_nulls(spark):
    from nebula_importer_spark.operators.layout import pruning_audit

    df = spark.createDataFrame(
        [(0, 1, 5), (0, 2, 5), (1, None, 5), (1, None, 5)],
        "b long, x long, y long",
    )
    got = {
        (r["layout"], r["pred_id"]): r.asDict()
        for r in pruning_audit(
            df, {"nat": "b"}, [("miss", "x", 50, 60), ("hit", "x", 1, 1)]
        ).collect()
    }
    # bucket 1 is NULL-only for x → skippable (parquet stats semantics)
    m = got[("nat", "miss")]
    assert m["buckets_scanned"] == 0 and m["rows_scanned"] == 0
    assert m["rows_matched"] == 0 and m["skip_ppm"] == 1_000_000
    h = got[("nat", "hit")]
    assert h["buckets_scanned"] == 1 and h["rows_scanned"] == 2
    assert h["rows_matched"] == 1


def test_pruning_audit_random_parity(spark):
    import random

    from nebula_importer_spark.operators.layout import pruning_audit

    rng = random.Random(7)
    rows = [
        (rng.randrange(5), rng.randrange(5), rng.randrange(40),
         rng.randrange(40))
        for _ in range(120)
    ]
    preds = [("p1", "x", 5, 15), ("p2", "y", 0, 9), ("p3", "x", 30, 39)]
    df = spark.createDataFrame(
        rows, "b1 long, b2 long, x long, y long"
    ).repartition(7)
    got = {
        (r["layout"], r["pred_id"]): r.asDict()
        for r in pruning_audit(
            df, {"l1": "b1", "l2": "b2"}, preds
        ).collect()
    }
    for lname, bi in (("l1", 0), ("l2", 1)):
        buckets = {}
        for r in rows:
            buckets.setdefault(r[bi], []).append(r)
        for pid, cname, lo, hi in preds:
            ci = 2 if cname == "x" else 3
            scanned = [
                b
                for b, rs in buckets.items()
                if max(r[ci] for r in rs) >= lo
                and min(r[ci] for r in rs) <= hi
            ]
            g = got[(lname, pid)]
            assert g["n_buckets"] == len(buckets)
            assert g["buckets_scanned"] == len(scanned)
            assert g["rows_scanned"] == sum(
                len(buckets[b]) for b in scanned
            )
            assert g["rows_matched"] == sum(
                1 for r in rows if lo <= r[ci] <= hi
            )
            assert g["skip_ppm"] == (
                (len(rows) - g["rows_scanned"]) * 1_000_000 // len(rows)
            )


def test_pruning_audit_validation(spark):
    from nebula_importer_spark.operators.layout import pruning_audit

    df = spark.createDataFrame([(0, 1)], "b long, x long")
    with pytest.raises(ValueError, match="layouts"):
        pruning_audit(df, {}, [("p", "x", 0, 1)])
    with pytest.raises(ValueError, match="predicates"):
        pruning_audit(df, {"n": "b"}, [])
    with pytest.raises(ValueError, match="bucket column"):
        pruning_audit(df, {"n": "zzz"}, [("p", "x", 0, 1)])
    with pytest.raises(ValueError, match="column 'zzz'"):
        pruning_audit(df, {"n": "b"}, [("p", "zzz", 0, 1)])
    with pytest.raises(ValueError, match="duplicate"):
        pruning_audit(
            df, {"n": "b"}, [("p", "x", 0, 1), ("p", "x", 2, 3)]
        )
    with pytest.raises(ValueError, match="lo"):
        pruning_audit(df, {"n": "b"}, [("p", "x", 5, 1)])


def test_balanced_shards_serpentine_exact(spark):
    from nebula_importer_spark.operators.layout import balanced_shards

    # weights force rank order 10,9,...,1 over ids 0..9; n_shards=4:
    # wave0 ranks 1-4 -> shards 0,1,2,3; wave1 ranks 5-8 -> 3,2,1,0;
    # wave2 ranks 9,10 -> 0,1
    rows = [(i, 10 - i) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    got = {
        r.doc_id: (r.rank, r.shard)
        for r in balanced_shards(df, n_shards=4).collect()
    }
    assert got == {
        0: (1, 0), 1: (2, 1), 2: (3, 2), 3: (4, 3),
        4: (5, 3), 5: (6, 2), 6: (7, 1), 7: (8, 0),
        8: (9, 0), 9: (10, 1),
    }


def test_balanced_shards_balance_and_ties(spark):
    import random

    from nebula_importer_spark.operators.layout import balanced_shards

    rng = random.Random(5)
    rows = [(i, rng.randint(1, 10000)) for i in range(500)]
    # duplicate-weight block: id tiebreak keeps ranks unique
    rows += [(1000 + i, 777) for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    out = balanced_shards(df, n_shards=8)
    ranks = [r.rank for r in out.collect()]
    assert sorted(ranks) == list(range(1, 521))
    tot = {
        r.shard: r["sum(n_tokens)"]
        for r in out.groupBy("shard").sum("n_tokens").collect()
    }
    assert len(tot) == 8
    spread = max(tot.values()) - min(tot.values())
    assert spread < 10000  # bounded by one wave's weight spread


def test_balanced_shards_validation(spark):
    import pytest

    from nebula_importer_spark.operators.layout import balanced_shards

    df = spark.createDataFrame([(1, 2.5)], "doc_id long, n_tokens double")
    with pytest.raises(ValueError, match="integral"):
        balanced_shards(df)
    ok = spark.createDataFrame([(1, -3)], "doc_id long, n_tokens long")
    with pytest.raises(Exception, match="negative weight"):
        balanced_shards(ok).collect()
    with pytest.raises(ValueError, match="n_shards"):
        balanced_shards(ok, n_shards=0)


def test_balanced_shards_all_tied_weights(spark):
    from nebula_importer_spark.operators.layout import balanced_shards

    # every weight identical: rank must be pure id order, ranks unique
    rows = [(i * 3 + 1, 500) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    got = sorted(
        (r.rank, r.doc_id) for r in balanced_shards(df, n_shards=4).collect()
    )
    assert [r for r, _ in got] == list(range(1, 101))
    assert [d for _, d in got] == sorted(d for d, _ in rows)
