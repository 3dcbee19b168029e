"""resource_alloc_scores — RA link-prediction index, exact-integer."""

from __future__ import annotations

import random

import pytest

from nebula_importer_spark.operators.graph import RA_SCALE, resource_alloc_scores


def _ref(edges, max_degree=None, exclude_existing=False, min_common=1):
    """Python model with the capped-universe semantics."""
    adj = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    full = {n: set(ns) for n, ns in adj.items()}
    if max_degree is not None:
        # capped universe: hubs leave all NEIGHBOR SETS (so they are never
        # middles and never counted in degrees) but stay as endpoints
        hubs = {n for n, ns in adj.items() if len(ns) > max_degree}
        adj = {n: {m for m in ns if m not in hubs} for n, ns in adj.items()}
    out = []
    nodes = sorted(adj)
    for i, a in enumerate(nodes):
        for b in nodes[i + 1 :]:
            # a middle whose capped degree is zero (all ITS neighbors were
            # hubs) has no defined 1/deg and contributes to neither count
            shared = {z for z in adj[a] & adj[b] if adj[z]}
            if len(shared) < max(min_common, 1) or not shared:
                continue
            if exclude_existing and b in full.get(a, set()):
                continue
            ra = sum(RA_SCALE // len(adj[z]) for z in shared)
            out.append((a, b, len(shared), ra))
    return sorted(out)


def _run(spark, edges, **kw):
    df = spark.createDataFrame(edges, ["src", "dst"])
    rows = resource_alloc_scores(df, **kw).collect()
    return sorted((r["node_a"], r["node_b"], r["common"], r["ra_scaled"]) for r in rows)


def test_hand_star(spark):
    # z connects a and b; deg(z)=2 -> RA = SCALE // 2
    edges = [("a", "z"), ("b", "z")]
    assert _run(spark, edges) == [("a", "b", 1, RA_SCALE // 2)] == _ref(edges)


def test_degree_discount(spark):
    # hub h (deg 4) and quiet q (deg 2) both link a,b:
    # RA = SCALE//4 + SCALE//2, common = 2
    edges = [("a", "h"), ("b", "h"), ("c", "h"), ("d", "h"), ("a", "q"), ("b", "q")]
    got = _run(spark, edges)
    assert got == _ref(edges)
    by_pair = {(a, b): (c, s) for a, b, c, s in got}
    assert by_pair[("a", "b")] == (2, RA_SCALE // 4 + RA_SCALE // 2)


def test_max_degree_capped_universe(spark):
    edges = [("a", "h"), ("b", "h"), ("c", "h"), ("a", "q"), ("b", "q")]
    # cap 2: h (deg 3) leaves neighbor sets and stops being a middle, but
    # still scores as an ENDPOINT via its non-hub middles a and b
    got = _run(spark, edges, max_degree=2)
    assert got == _ref(edges, max_degree=2)
    assert got == [
        ("a", "b", 1, RA_SCALE // 2),  # via q only (h no longer a middle)
        ("h", "q", 2, 2 * RA_SCALE),  # via a and b, each deg 1 capped
    ]


def test_exclude_existing(spark):
    edges = [("a", "z"), ("b", "z"), ("a", "b")]
    assert _run(spark, edges, exclude_existing=True) == [] == _ref(
        edges, exclude_existing=True
    )


def test_randomized_vs_reference(spark):
    rng = random.Random(31)
    nodes = [f"n{i}" for i in range(18)]
    edges = list(
        {
            tuple(sorted(rng.sample(nodes, 2)))
            for _ in range(60)
        }
    )
    for kw in (
        {},
        {"max_degree": 4},
        {"exclude_existing": True},
        {"min_common": 2},
        {"max_degree": 3, "exclude_existing": True},
    ):
        assert _run(spark, edges, **kw) == _ref(edges, **kw), kw


def test_validation(spark):
    df = spark.createDataFrame([("a", "b")], ["src", "dst"])
    with pytest.raises(ValueError):
        resource_alloc_scores(df, max_degree=0)
