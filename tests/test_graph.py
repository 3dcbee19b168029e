"""Graph analytics: exact-integer PageRank and degree-ordered triangle
counting, parity-tested against independent pure-Python references on
randomized graphs."""

from __future__ import annotations

import itertools
import random

import pytest
from pyspark.sql import functions as F

from nebula_importer_spark.operators.graph import (
    PAGERANK_SCALE,
    pagerank,
    triangle_counts,
)


def _py_pagerank(edges, iterations, damping_pct=85, scale=PAGERANK_SCALE):
    """Independent integer-arithmetic reference (dicts, no Spark).
    Python ints are arbitrary-precision, so this also detects any int64
    wrap in the Spark implementation."""
    e = sorted(set(edges))
    nodes = sorted({u for u, _ in e} | {v for _, v in e})
    out = {}
    for u, _ in e:
        out[u] = out.get(u, 0) + 1
    init = scale // len(nodes)
    base = (init * (100 - damping_pct)) // 100
    rank = {n: init for n in nodes}
    for _ in range(iterations):
        recv = {n: 0 for n in nodes}
        for u, v in e:
            recv[v] += rank[u] // out[u]
        rank = {n: base + (damping_pct * recv[n]) // 100 for n in nodes}
    return rank


def _py_triangles(edges):
    e = {tuple(sorted(p)) for p in edges if p[0] != p[1]}
    nodes = sorted({x for p in e for x in p})
    adj = {n: set() for n in nodes}
    for a, b in e:
        adj[a].add(b)
        adj[b].add(a)
    counts = {}
    for a, b, c in itertools.combinations(nodes, 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            for n in (a, b, c):
                counts[n] = counts.get(n, 0) + 1
    return counts


@pytest.mark.parametrize("seed", [7, 21])
def test_pagerank_matches_integer_reference(spark, seed):
    rng = random.Random(seed)
    n = 30
    edges = list({(rng.randrange(n), rng.randrange(n)) for _ in range(120)})
    edges = [(u, v) for u, v in edges if u != v]
    df = spark.createDataFrame(edges, "src int, dst int")
    got = {r.node: r.rank_scaled for r in pagerank(df, iterations=5).collect()}
    want = _py_pagerank(edges, iterations=5)
    assert got == want  # exact to the bit — integer arithmetic end-to-end


def test_pagerank_dangling_and_source_nodes(spark):
    # b is dangling (no out-edges): keeps base + received, mass not pushed.
    # a is a pure source: after iteration 1 its rank is exactly `base`.
    df = spark.createDataFrame([(1, 2), (3, 2), (2, 3)], "src int, dst int")
    got = {r.node: r.rank_scaled for r in pagerank(df, iterations=3).collect()}
    want = _py_pagerank([(1, 2), (3, 2), (2, 3)], iterations=3)
    assert got == want
    base = ((PAGERANK_SCALE // 3) * 15) // 100
    assert got[1] == base  # nothing points at the source
    assert set(got) == {1, 2, 3}


def test_pagerank_mega_hub_no_overflow(spark):
    """A 120k-spoke star wrapped int64 under the unnormalized formulation
    (hub rank went NEGATIVE); mass normalization bounds every intermediate
    by 100·scale regardless of graph size, so the hub matches the
    arbitrary-precision Python reference exactly."""
    n = 120_000
    edges = [(i, n) for i in range(n)]
    df = spark.createDataFrame(edges, "src long, dst long")
    hub = (
        pagerank(df, iterations=1)
        .filter(F.col("node") == n)
        .collect()[0]
        .rank_scaled
    )
    want = _py_pagerank(edges, iterations=1)[n]
    assert hub == want and hub > 0


def test_pagerank_validates_args(spark):
    df = spark.createDataFrame([(1, 2)], "src int, dst int")
    with pytest.raises(ValueError):
        pagerank(df, iterations=0)
    with pytest.raises(ValueError):
        pagerank(df, damping_pct=101)
    with pytest.raises(ValueError):
        pagerank(df, scale=10**17)  # 100·scale must stay inside int64
    with pytest.raises(ValueError, match="resolution"):
        pagerank(df, scale=10**4)  # 2 nodes × 10^4 floor: too coarse


@pytest.mark.parametrize("seed", [3, 11])
def test_triangles_match_bruteforce(spark, seed):
    rng = random.Random(seed)
    n = 25
    edges = list({(rng.randrange(n), rng.randrange(n)) for _ in range(90)})
    df = spark.createDataFrame(edges, "src int, dst int")
    got = {r.node: r.n_triangles for r in triangle_counts(df).collect()}
    assert got == _py_triangles(edges)


def test_triangles_canonicalization(spark):
    # duplicates, reversed duplicates, and self-loops must not multiply counts
    df = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (3, 1), (1, 1), (2, 3)], "src int, dst int"
    )
    got = {r.node: r.n_triangles for r in triangle_counts(df).collect()}
    assert got == {1: 1, 2: 1, 3: 1}


def test_triangles_none_in_bipartite(spark):
    # bipartite graphs have no triangles — output is empty, not zero rows
    df = spark.createDataFrame(
        [(u, v) for u in (1, 2, 3) for v in (10, 20)], "src int, dst int"
    )
    assert triangle_counts(df).count() == 0


def _py_kcore(edges, k):
    e = {tuple(sorted(p)) for p in edges if p[0] != p[1]}
    while True:
        deg: dict = {}
        for a, b in e:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        keep = {n for n, d in deg.items() if d >= k}
        e2 = {(a, b) for a, b in e if a in keep and b in keep}
        if e2 == e:
            break
        e = e2
    out: dict = {}
    for a, b in e:
        out[a] = out.get(a, 0) + 1
        out[b] = out.get(b, 0) + 1
    return out


@pytest.mark.parametrize("seed,k", [(5, 2), (13, 3)])
def test_kcore_matches_peeling_reference(spark, seed, k):
    from nebula_importer_spark.operators.graph import kcore

    rng = random.Random(seed)
    n = 30
    edges = list({(rng.randrange(n), rng.randrange(n)) for _ in range(100)})
    df = spark.createDataFrame(edges, "src int, dst int")
    got = {r.node: r.core_deg for r in kcore(df, k).collect()}
    assert got == _py_kcore(edges, k)
    assert all(d >= k for d in got.values())  # fixpoint property


def test_kcore_peels_pendant_chain(spark):
    from nebula_importer_spark.operators.graph import kcore

    # triangle 1-2-3 with a pendant chain 3-4-5: the chain must peel away
    # ROUND BY ROUND (5 first, then 4) — a single degree filter would stop
    # after removing 5 and wrongly keep 4
    df = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)], "src int, dst int"
    )
    got = {r.node: r.core_deg for r in kcore(df, 2).collect()}
    assert got == {1: 2, 2: 2, 3: 2}


def test_kcore_empty_and_validation(spark):
    from nebula_importer_spark.operators.graph import kcore

    df = spark.createDataFrame([(1, 2), (2, 3)], "src int, dst int")
    assert kcore(df, 2).count() == 0  # a path has no 2-core
    with pytest.raises(ValueError):
        kcore(df, 0)
    with pytest.raises(RuntimeError, match="converge"):
        # triangle+chain needs 2 peel rounds + 1 fixpoint confirmation
        kcore(
            spark.createDataFrame(
                [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)], "src int, dst int"
            ),
            2,
            max_rounds=1,
        )


def _py_hits(edges, iterations, scale=PAGERANK_SCALE):
    """Independent integer-arithmetic HITS reference (dicts, Python ints —
    arbitrary precision, so it also detects int64 wrap)."""
    e = sorted(set(edges))
    nodes = sorted({x for p in e for x in p})
    init = scale // len(nodes)
    auth = {n: init for n in nodes}
    hub = {n: init for n in nodes}

    def half(scores, forward):
        raw = {n: 0 for n in nodes}
        for s, d in e:
            if forward:
                raw[d] += scores[s]
            else:
                raw[s] += scores[d]
        q = max(sum(raw.values()) // scale, 1)
        return {n: raw[n] // q for n in nodes}

    for _ in range(iterations):
        auth = half(hub, True)
        hub = half(auth, False)
    return {n: (auth[n], hub[n]) for n in nodes}


@pytest.mark.parametrize("seed", [3, 11])
def test_hits_matches_integer_reference(spark, seed):
    from nebula_importer_spark.operators.graph import hits

    rng = random.Random(seed)
    n = 25
    edges = list({(rng.randrange(n), rng.randrange(n)) for _ in range(90)})
    edges = [(u, v) for u, v in edges if u != v]
    df = spark.createDataFrame(edges, "src int, dst int")
    got = {r.node: (r.auth_scaled, r.hub_scaled)
           for r in hits(df, iterations=3).collect()}
    assert got == _py_hits(edges, 3)


def test_hits_bipartite_roles(spark):
    from nebula_importer_spark.operators.graph import hits

    # one-directional bipartite graph: left nodes are pure hubs, right
    # nodes pure authorities; the better-covered right node wins
    edges = [(1, 10), (1, 11), (2, 10), (3, 10)]
    df = spark.createDataFrame(edges, "src int, dst int")
    got = {r.node: (r.auth_scaled, r.hub_scaled)
           for r in hits(df, iterations=2).collect()}
    assert got == _py_hits(edges, 2)
    for left in (1, 2, 3):
        assert got[left][0] == 0  # no in-edges → zero authority
    for right in (10, 11):
        assert got[right][1] == 0  # no out-edges → zero hub
    assert got[10][0] > got[11][0]  # 3 hubs point at 10, 1 at 11
    with pytest.raises(ValueError):
        hits(df, iterations=0)


def _py_neighborhood_similarity(edges, min_common=1, max_degree=None,
                                exclude_existing=False):
    """Independent pure-Python reference (sets, no Spark)."""
    e = {tuple(sorted(p)) for p in edges if p[0] != p[1]}
    adj = {}
    for a, b in e:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    if max_degree is not None:
        hubs = {n for n, nb in adj.items() if len(nb) > max_degree}
        capped = {n: nb - hubs for n, nb in adj.items()}
    else:
        capped = adj
    out = {}
    for a, b in itertools.combinations(sorted(capped), 2):
        common = capped[a] & capped[b]
        if len(common) < max(min_common, 1) or not common:
            continue
        if exclude_existing and tuple(sorted((a, b))) in e:
            continue
        union = len(capped[a] | capped[b])
        out[(a, b)] = (len(common), len(common) / union)
    return out


@pytest.mark.parametrize("seed", [5, 17])
def test_neighborhood_similarity_matches_reference(spark, seed):
    from nebula_importer_spark.operators.graph import neighborhood_similarity

    rng = random.Random(seed)
    n = 25
    edges = list({tuple(sorted((rng.randrange(n), rng.randrange(n))))
                  for _ in range(80)})
    edges = [(u, v) for u, v in edges if u != v]
    df = spark.createDataFrame(edges, "src int, dst int")
    for kwargs in (
        {},
        {"min_common": 2},
        {"max_degree": 6},
        {"exclude_existing": True},
        {"min_common": 2, "max_degree": 6, "exclude_existing": True},
    ):
        got = {(r.node_a, r.node_b): (r.common, r.jaccard)
               for r in neighborhood_similarity(df, **kwargs).collect()}
        want = _py_neighborhood_similarity(edges, **kwargs)
        assert set(got) == set(want), kwargs
        for k, (c, j) in want.items():
            assert got[k][0] == c, (kwargs, k)
            assert abs(got[k][1] - j) < 1e-12, (kwargs, k)


def test_neighborhood_similarity_hub_cap_and_exclusion(spark):
    from nebula_importer_spark.operators.graph import neighborhood_similarity

    # star: hub 0 connected to 1..5, plus edge (1,2). Uncapped: every pair
    # among 1..5 shares middle 0; with the hub capped out, no pairs remain.
    edges = [(0, i) for i in range(1, 6)] + [(1, 2)]
    df = spark.createDataFrame(edges, "src int, dst int")
    uncapped = {(r.node_a, r.node_b): r.common
                for r in neighborhood_similarity(df).collect()}
    assert all(uncapped[(a, b)] >= 1 for a, b in itertools.combinations(range(1, 6), 2))
    # (1,2) are adjacent AND share middle 0 — exclude_existing drops them
    # even though the hub edge set is what carries the adjacency
    excl = neighborhood_similarity(df, exclude_existing=True, max_degree=4)
    assert (1, 2) not in {(r.node_a, r.node_b) for r in excl.collect()}
    # two CONNECTED hubs sharing non-hub middles: their edge survives only
    # in the uncapped adjacency (both directions point at a hub), so this
    # fails if exclusion anti-joins the capped adjacency instead
    hub2 = [(0, i) for i in range(1, 6)] + [(10, i) for i in range(1, 6)] + [(0, 10)]
    df2 = spark.createDataFrame(hub2, "src int, dst int")
    got2 = {(r.node_a, r.node_b)
            for r in neighborhood_similarity(
                df2, max_degree=5, exclude_existing=True).collect()}
    assert (0, 10) not in got2
    assert got2 == set(_py_neighborhood_similarity(
        hub2, max_degree=5, exclude_existing=True))
    capped = neighborhood_similarity(df, max_degree=4).collect()
    # node 0 (degree 5) leaves all neighborhoods: 1..5 share nothing; the
    # only remaining adjacency rows are 0-{1..5} minus nothing — pairs via
    # middles 1 or 2 connect 0 with nobody else → no pairs at all except
    # (0 excluded as middle? 0 still an endpoint: 1 and 2 both neighbor 0)
    got = {(r.node_a, r.node_b): (r.common, r.jaccard) for r in capped}
    want = _py_neighborhood_similarity(edges, max_degree=4)
    assert got.keys() == want.keys()
    with pytest.raises(ValueError):
        neighborhood_similarity(df, max_degree=0)


def test_neighborhood_similarity_self_loops_ignored(spark):
    """A reflexive edge must not make a node its own shared neighbor
    (regression: ('a','a')+('a','b') once yielded pair (a,b) common=1)."""
    from nebula_importer_spark.operators.graph import neighborhood_similarity

    edges = [("a", "a"), ("a", "b")]
    df = spark.createDataFrame(edges, "src string, dst string")
    assert neighborhood_similarity(df).collect() == []
    # and with real structure around it, the self-loop changes nothing
    more = edges + [("a", "c"), ("b", "c"), ("c", "c")]
    df2 = spark.createDataFrame(more, "src string, dst string")
    got = {(r.node_a, r.node_b): (r.common, r.jaccard)
           for r in neighborhood_similarity(df2).collect()}
    want = _py_neighborhood_similarity(more)
    assert got.keys() == want.keys()
    for k, (c, j) in want.items():
        assert got[k][0] == c and abs(got[k][1] - j) < 1e-12


def test_cooccurrence_pmi(spark):
    import math

    from nebula_importer_spark.operators.graph import cooccurrence_pmi

    rows = [
        ("g1", 1), ("g1", 2), ("g1", 3),
        ("g2", 1), ("g2", 2),
        ("g3", 1), ("g3", 4), ("g3", 4),  # dup item collapses
        ("g4", 5),
    ]
    df = spark.createDataFrame(rows, "grp string, item int")
    got = {(r.src, r.dst): (r.pair_count, r.pmi)
           for r in cooccurrence_pmi(df, group_col="grp", item_col="item").collect()}
    # independent reference: N=4 groups; c1=3 c2=2 c3=1 c4=1 c5=1
    want = {
        (1, 2): (2, math.log(4 * 2 / (3 * 2))),
        (1, 3): (1, math.log(4 * 1 / (3 * 1))),
        (2, 3): (1, math.log(4 * 1 / (2 * 1))),
        (1, 4): (1, math.log(4 * 1 / (3 * 1))),
    }
    assert got.keys() == want.keys()
    for k, (c, p) in want.items():
        assert got[k][0] == c and abs(got[k][1] - p) < 1e-12, k
    # min_pair_count filter
    filtered = cooccurrence_pmi(
        df, group_col="grp", item_col="item", min_pair_count=2
    ).collect()
    assert {(r.src, r.dst) for r in filtered} == {(1, 2)}
    # mega-group guard: with cap 2, g1 drops; marginals/N recompute over
    # the capped universe (N=3: g2,g3,g4)
    capped = {(r.src, r.dst): (r.pair_count, r.pmi) for r in cooccurrence_pmi(
        df, group_col="grp", item_col="item", max_group_size=2).collect()}
    assert capped.keys() == {(1, 2), (1, 4)}
    assert abs(capped[(1, 2)][1] - math.log(3 * 1 / (2 * 1))) < 1e-12
    with pytest.raises(ValueError):
        cooccurrence_pmi(df, group_col="grp", item_col="item", max_group_size=1)


def test_cooccurrence_edges(spark):
    from nebula_importer_spark.operators.graph import cooccurrence_edges

    df = spark.createDataFrame(
        [
            ("g1", 1), ("g1", 2), ("g1", 3), ("g1", 2),  # dup item collapses
            ("g2", 3), ("g2", 4),
            ("g3", 9),  # singleton: no pairs
        ],
        "grp string, item int",
    )
    got = {(r.src, r.dst) for r in
           cooccurrence_edges(df, group_col="grp", item_col="item").collect()}
    assert got == {(1, 2), (1, 3), (2, 3), (3, 4)}
    # mega-group guard: g1 (3 items) dropped entirely at cap 2
    capped = {(r.src, r.dst) for r in cooccurrence_edges(
        df, group_col="grp", item_col="item", max_group_size=2).collect()}
    assert capped == {(3, 4)}
    with pytest.raises(ValueError):
        cooccurrence_edges(df, group_col="grp", item_col="item", max_group_size=1)


def _py_rule_mining(triples, min_body=1, cap=None):
    from collections import Counter

    t = set(triples)
    ind, outd = Counter(), Counter()
    for s, p, o in t:
        outd[s] += 1
        ind[o] += 1
    paths = {
        (s, p1, p2, o2)
        for s, p1, m in t
        for m2, p2, o2 in t
        if m == m2 and (cap is None or ind[m] * outd[m] <= cap)
    }
    body = Counter((p1, p2) for _, p1, p2, _ in paths)
    sup = Counter(
        (p1, p2, p3)
        for s, p1, p2, o in paths
        for s3, p3, o3 in t
        if s3 == s and o3 == o
    )
    return {
        (p1, p2, p3): (c, body[(p1, p2)], c / body[(p1, p2)])
        for (p1, p2, p3), c in sup.items()
        if body[(p1, p2)] >= min_body
    }


def test_rule_mining_hand_case(spark):
    from nebula_importer_spark.operators.graph import rule_mining

    tri = [
        ("a", "p", "b"), ("b", "q", "c"), ("a", "r", "c"),   # p∘q ⇒ r holds
        ("d", "p", "e"), ("e", "q", "f"),                     # p∘q path, no head
        ("a", "p", "b"),                                      # duplicate edge
    ]
    df = spark.createDataFrame(tri, "subj string, pred string, obj string")
    got = {
        (r.body_pred1, r.body_pred2, r.head_pred): (
            r.support, r.body_count, r.confidence
        )
        for r in rule_mining(df).collect()
    }
    # body p∘q has 2 (s,o) pairs {(a,c),(d,f)}; only (a,c) holds head r
    assert got == {("p", "q", "r"): (1, 2, 0.5)}


def test_rule_mining_matches_reference(spark):
    from nebula_importer_spark.operators.graph import rule_mining

    rng = random.Random(23)
    nodes = [f"e{i}" for i in range(25)]
    preds = ["p", "q", "r", "s"]
    tri = [
        (rng.choice(nodes), rng.choice(preds), rng.choice(nodes))
        for _ in range(220)
    ]
    df = spark.createDataFrame(tri, "subj string, pred string, obj string")
    got = {
        (r.body_pred1, r.body_pred2, r.head_pred): (
            r.support, r.body_count, round(r.confidence, 9)
        )
        for r in rule_mining(df).collect()
    }
    want = {
        k: (c, b, round(conf, 9))
        for k, (c, b, conf) in _py_rule_mining(tri).items()
    }
    assert got == want
    # capped run matches the capped reference
    got_cap = {
        (r.body_pred1, r.body_pred2, r.head_pred): (
            r.support, r.body_count, round(r.confidence, 9)
        )
        for r in rule_mining(df, max_mid_degree=12).collect()
    }
    want_cap = {
        k: (c, b, round(conf, 9))
        for k, (c, b, conf) in _py_rule_mining(tri, cap=12).items()
    }
    assert got_cap == want_cap
    assert got != got_cap  # the cap actually bites on this graph


def test_rule_mining_hub_guard_and_validation(spark):
    from nebula_importer_spark.operators.graph import rule_mining

    # hub m: 3 in × 3 out = 9 paths; side chain x->y->z stays
    tri = (
        [(f"a{i}", "p", "m") for i in range(3)]
        + [("m", "q", f"b{i}") for i in range(3)]
        + [("x", "p", "y"), ("y", "q", "z")]
    )
    df = spark.createDataFrame(tri, "subj string, pred string, obj string")
    # no head edges anywhere → no rules, regardless of the cap
    assert rule_mining(df).count() == 0
    assert rule_mining(df, max_mid_degree=8).count() == 0
    # add a head edge over a hub path and one over the side chain: the cap
    # drops the hub-path rule but keeps the side-chain one
    tri2 = tri + [("a0", "r", "b0"), ("x", "r", "z")]
    df2 = spark.createDataFrame(tri2, "subj string, pred string, obj string")
    full = {
        (r.body_pred1, r.body_pred2, r.head_pred): (r.support, r.body_count)
        for r in rule_mining(df2).collect()
    }
    assert full[("p", "q", "r")] == (2, 10)  # 9 hub paths + 1 chain path
    capped = {
        (r.body_pred1, r.body_pred2, r.head_pred): (r.support, r.body_count)
        for r in rule_mining(df2, max_mid_degree=8).collect()
    }
    assert capped[("p", "q", "r")] == (1, 1)  # hub dropped, chain kept
    with pytest.raises(ValueError, match="max_mid_degree"):
        rule_mining(df, max_mid_degree=0)


def _py_negative_samples(triples, k=2, seed="neg", corrupt="obj"):
    import hashlib

    sep = "\x1f"
    t = set(triples)
    ents = sorted(
        {s for s, _, _ in t} | {o for _, _, o in t},
        key=lambda e: (hashlib.md5(e.encode()).hexdigest(), e),
    )
    out = set()
    for s, p, o in t:
        for j in range(k):
            src = sep.join([s, p, o, seed, str(j)])
            pick = int(hashlib.md5(src.encode()).hexdigest()[:8], 16) % len(ents)
            e = ents[pick]
            if corrupt == "obj" and (e == o or (s, p, e) in t):
                continue
            if corrupt == "subj" and (e == s or (e, p, o) in t):
                continue
            out.add((s, p, o, e, j))
    return out


def test_negative_samples_matches_reference(spark):
    from nebula_importer_spark.operators.graph import negative_samples

    rng = random.Random(5)
    nodes = [f"e{i}" for i in range(30)]
    preds = ["p", "q", "r"]
    tri = [
        (rng.choice(nodes), rng.choice(preds), rng.choice(nodes))
        for _ in range(150)
    ]
    df = spark.createDataFrame(tri, "subj string, pred string, obj string")
    for corrupt in ("obj", "subj"):
        got = {
            (r.subj, r.pred, r.obj, r.neg, r.sample_idx)
            for r in negative_samples(df, k=2, corrupt=corrupt).collect()
        }
        assert got == _py_negative_samples(tri, corrupt=corrupt), corrupt


def test_negative_samples_partitioning_invariant(spark):
    # the dense md5-order index must be identical under any input layout —
    # the whole point of the two-level construction
    from nebula_importer_spark.operators.graph import negative_samples

    rng = random.Random(9)
    tri = [
        (f"s{rng.randrange(20)}", "p", f"o{rng.randrange(20)}")
        for _ in range(80)
    ]
    df = spark.createDataFrame(tri, "subj string, pred string, obj string")
    base = {
        tuple(r) for r in negative_samples(df, k=3, n_buckets=16).collect()
    }
    shuffled = {
        tuple(r)
        for r in negative_samples(df.repartition(13), k=3, n_buckets=64).collect()
    }
    assert base == shuffled and base


def test_negative_samples_filters_positives_and_identity(spark):
    from nebula_importer_spark.operators.graph import negative_samples

    # dense graph: every (s, p, o) pair over 3×3 entities exists, so every
    # corruption is an accidental positive (or identity) → empty output
    tri = [(s, "p", o) for s in ("a", "b", "c") for o in ("a", "b", "c")]
    df = spark.createDataFrame(tri, "subj string, pred string, obj string")
    assert negative_samples(df, k=4).count() == 0


def test_negative_samples_validation(spark):
    from nebula_importer_spark.operators.graph import negative_samples

    df = spark.createDataFrame(
        [("a", "p", "b")], "subj string, pred string, obj string"
    )
    with pytest.raises(ValueError, match="k must"):
        negative_samples(df, k=0)
    with pytest.raises(ValueError, match="corrupt"):
        negative_samples(df, corrupt="pred")
    with pytest.raises(ValueError, match="n_buckets"):
        negative_samples(df, n_buckets=7)


def test_bfs_distances_layers_and_early_exit(spark):
    from nebula_importer_spark.operators.graph import bfs_distances

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("x", "y")], "src string, dst string"
    )
    seeds = spark.createDataFrame([("a",)], "node string")
    got = {r["node"]: r["dist"] for r in bfs_distances(edges, seeds, max_hops=10).collect()}
    # directed chain a→b→c→d; x/y unreachable and absent
    assert got == {"a": 0, "b": 1, "c": 2, "d": 3}


def test_bfs_distances_multi_source_min(spark):
    from nebula_importer_spark.operators.graph import bfs_distances

    edges = spark.createDataFrame(
        [("a", "m"), ("m", "z"), ("b", "z")], "src string, dst string"
    )
    seeds = spark.createDataFrame([("a",), ("b",)], "node string")
    got = {r["node"]: r["dist"] for r in bfs_distances(edges, seeds, max_hops=4).collect()}
    # z is 2 hops from a but 1 hop from b → nearest-seed distance wins
    assert got == {"a": 0, "b": 0, "m": 1, "z": 1}


def test_bfs_distances_hop_cap(spark):
    from nebula_importer_spark.operators.graph import bfs_distances

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d")], "src string, dst string"
    )
    seeds = spark.createDataFrame([("a",)], "node string")
    got = {r["node"]: r["dist"] for r in bfs_distances(edges, seeds, max_hops=2).collect()}
    assert got == {"a": 0, "b": 1, "c": 2}


def test_label_propagation_two_cliques(spark):
    from nebula_importer_spark.operators.graph import label_propagation

    # two triangles joined by nothing → each converges to its min id
    tri1 = [("a", "b"), ("b", "c"), ("c", "a")]
    tri2 = [("x", "y"), ("y", "z"), ("z", "x")]
    both = tri1 + tri2 + [(d, s) for s, d in tri1 + tri2]  # symmetrize
    edges = spark.createDataFrame(both, "src string, dst string")
    got = {r["node"]: r["label"] for r in label_propagation(edges, rounds=4).collect()}
    assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x", "z": "x"}


def test_label_propagation_isolated_keeps_label(spark):
    from nebula_importer_spark.operators.graph import label_propagation

    # directed edge: 'b' has an in-neighbor, 'a' has none and keeps its label
    edges = spark.createDataFrame([("a", "b")], "src string, dst string")
    got = {r["node"]: r["label"] for r in label_propagation(edges, rounds=3).collect()}
    assert got == {"a": "a", "b": "a"}


def test_label_propagation_tie_breaks_to_min(spark):
    from nebula_importer_spark.operators.graph import label_propagation

    # node 'm' hears one vote each from 'a' and 'z' → min label 'a' wins
    edges = spark.createDataFrame([("a", "m"), ("z", "m")], "src string, dst string")
    got = {r["node"]: r["label"] for r in label_propagation(edges, rounds=1).collect()}
    assert got["m"] == "a"


def test_sssp_prefers_cheap_long_path(spark):
    from nebula_importer_spark.operators.graph import sssp

    # a→z direct costs 10; a→b→z costs 2+3=5 → shortest is the 2-hop path
    edges = spark.createDataFrame(
        [("a", "z", 10), ("a", "b", 2), ("b", "z", 3)],
        "src string, dst string, weight long",
    )
    seeds = spark.createDataFrame([("a",)], "node string")
    got = {r["node"]: r["dist"] for r in sssp(edges, seeds, rounds=4).collect()}
    assert got == {"a": 0, "b": 2, "z": 5}


def test_sssp_bounded_rounds_prefix(spark):
    from nebula_importer_spark.operators.graph import sssp

    # with rounds=1 only the direct edge is relaxed
    edges = spark.createDataFrame(
        [("a", "z", 10), ("a", "b", 2), ("b", "z", 3)],
        "src string, dst string, weight long",
    )
    seeds = spark.createDataFrame([("a",)], "node string")
    got = {r["node"]: r["dist"] for r in sssp(edges, seeds, rounds=1).collect()}
    assert got == {"a": 0, "b": 2, "z": 10}


def test_sssp_multi_seed_min(spark):
    from nebula_importer_spark.operators.graph import sssp

    edges = spark.createDataFrame(
        [("a", "m", 7), ("b", "m", 1)], "src string, dst string, weight long"
    )
    seeds = spark.createDataFrame([("a",), ("b",)], "node string")
    got = {r["node"]: r["dist"] for r in sssp(edges, seeds, rounds=2).collect()}
    assert got == {"a": 0, "b": 0, "m": 1}


def test_personalized_pagerank_localizes_mass(spark):
    from nebula_importer_spark.operators.graph import personalized_pagerank

    # two disconnected 2-cycles; seed only in the first → second gets ZERO
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("x", "y"), ("y", "x")],
        "src string, dst string",
    )
    seeds = spark.createDataFrame([("a",)], "node string")
    got = {r["node"]: r["rank_scaled"] for r in personalized_pagerank(edges, seeds, iterations=4).collect()}
    assert got["x"] == 0 and got["y"] == 0
    assert got["a"] > 0 and got["b"] > 0
    # the seed keeps the restart advantage
    assert got["a"] > got["b"]


def test_personalized_pagerank_mass_bounded(spark):
    from nebula_importer_spark.operators.graph import personalized_pagerank, PAGERANK_SCALE

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], "src string, dst string"
    )
    seeds = spark.createDataFrame([("a",), ("b",)], "node string")
    rows = personalized_pagerank(edges, seeds, iterations=6).collect()
    total = sum(r["rank_scaled"] for r in rows)
    assert 0 < total <= PAGERANK_SCALE


def test_personalized_pagerank_isolated_seed_keeps_restart(spark):
    from nebula_importer_spark.operators.graph import personalized_pagerank

    # seed not present in the edge set still restarts every round
    edges = spark.createDataFrame([("a", "b")], "src string, dst string")
    seeds = spark.createDataFrame([("z",)], "node string")
    got = {r["node"]: r["rank_scaled"] for r in personalized_pagerank(edges, seeds, iterations=3).collect()}
    assert got["z"] > 0 and got["a"] == 0


def test_personalized_pagerank_validation(spark):
    from nebula_importer_spark.operators.graph import personalized_pagerank

    edges = spark.createDataFrame([("a", "b")], "src string, dst string")
    empty = spark.createDataFrame([], "node string")
    with pytest.raises(ValueError):
        personalized_pagerank(edges, empty)


def _py_ktruss(edges, k):
    """Reference peel: per-edge triangle support via brute-force adjacency,
    delete support < k-2, repeat to fixpoint; returns {edge: support}."""
    e = {tuple(sorted(p)) for p in edges if p[0] != p[1]}

    def supports(es):
        adj: dict = {}
        for a, b in es:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        return {
            (a, b): len(adj[a] & adj[b]) for a, b in es
        }

    while True:
        sup = supports(e)
        e2 = {p for p in e if sup[p] >= k - 2}
        if e2 == e:
            break
        e = e2
    return supports(e)


@pytest.mark.parametrize("seed,k", [(5, 3), (13, 4)])
def test_ktruss_matches_peeling_reference(spark, seed, k):
    from nebula_importer_spark.operators.graph import ktruss

    rng = random.Random(seed)
    n = 25
    edges = list({(rng.randrange(n), rng.randrange(n)) for _ in range(90)})
    df = spark.createDataFrame(edges, "src int, dst int")
    got = {(r.a, r.b): r.support for r in ktruss(df, k).collect()}
    assert got == _py_ktruss(edges, k)
    assert all(s >= k - 2 for s in got.values())  # fixpoint property


def test_ktruss_cascading_deletion(spark):
    from nebula_importer_spark.operators.graph import ktruss

    # K4 minus one edge = two triangles sharing edge (2,3): outer edges
    # have support 1 and die in round 1 at k=4; the shared edge had
    # support 2 but must then CASCADE to 0 — a single-pass filter would
    # wrongly keep it.
    df = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4)], "src int, dst int"
    )
    assert ktruss(df, 4).count() == 0
    # at k=3 every edge is in >=1 triangle: all 5 survive
    got = {(r.a, r.b): r.support for r in ktruss(df, 3).collect()}
    assert got == {(1, 2): 1, (1, 3): 1, (2, 3): 2, (2, 4): 1, (3, 4): 1}


def test_ktruss_keeps_clique_peels_pendant_triangle(spark):
    from nebula_importer_spark.operators.graph import ktruss

    # K4 on {1,2,3,4} (every edge support 2) + pendant triangle {4,5,6}
    # (support 1 each): k=4 keeps exactly the clique.
    k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    df = spark.createDataFrame(k4 + [(4, 5), (4, 6), (5, 6)], "src int, dst int")
    got = {(r.a, r.b): r.support for r in ktruss(df, 4).collect()}
    assert got == {(a, b): 2 for a, b in k4}


def test_ktruss_validation(spark):
    from nebula_importer_spark.operators.graph import ktruss

    df = spark.createDataFrame([(1, 2)], "src int, dst int")
    with pytest.raises(ValueError):
        ktruss(df, 2)
    with pytest.raises(ValueError):
        ktruss(df, 4, max_rounds=0)
    # triangle-free graph: empty truss at any k >= 3
    assert ktruss(df, 3).count() == 0


# ---------------------------------------------------------------------------
# modularity — exact-integer per-community Newman modularity


def _mod_model(edges, labels, scale=10**6):
    from collections import defaultdict

    lab = dict(labels)
    tagged = [(lab[a], lab[b]) for a, b in edges if a in lab and b in lab]
    m = len(tagged)
    e_c = defaultdict(int)
    for la, lb in tagged:
        if la == lb:
            e_c[la] += 1
    d_c, nodes_c = defaultdict(int), defaultdict(set)
    for a, b in edges:
        for n in (a, b):
            if n in lab:
                d_c[lab[n]] += 1
                nodes_c[lab[n]].add(n)
    def tdiv(a, b):
        # Spark `div` and DuckDB `//` truncate toward zero; Python floors
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b >= 0) else -q

    return {
        c: (
            len(nodes_c[c]),
            e_c.get(c, 0),
            d_c[c],
            tdiv(scale * (4 * m * e_c.get(c, 0) - d_c[c] ** 2), 4 * m * m),
        )
        for c in d_c
    }


def _mod_dfs(spark, edges, labels):
    e = spark.createDataFrame(edges, "a long, b long")
    l = spark.createDataFrame(labels, "node long, label string")
    return e, l


def test_modularity_two_triangles(spark):
    from nebula_importer_spark.operators.graph import modularity

    edges = [(1, 2), (1, 3), (2, 3), (4, 5), (4, 6), (5, 6), (3, 4)]
    labels = [(n, "A") for n in (1, 2, 3)] + [(n, "B") for n in (4, 5, 6)]
    got = {
        r.label: (r.n_nodes, r.e_intra, r.d_total, r.contribution_scaled)
        for r in modularity(*_mod_dfs(spark, edges, labels)).collect()
    }
    # m=7; per community: e=3, d=7 → (4·7·3 − 49)·1e6 // 196 = 178571
    assert got == {"A": (3, 3, 7, 178571), "B": (3, 3, 7, 178571)}
    assert got == _mod_model(edges, labels)


def test_modularity_single_community_is_zero(spark):
    from nebula_importer_spark.operators.graph import modularity

    edges = [(1, 2), (2, 3), (1, 3)]
    labels = [(n, "all") for n in (1, 2, 3)]
    got = modularity(*_mod_dfs(spark, edges, labels)).collect()[0]
    assert got.contribution_scaled == 0


def test_modularity_random_parity_and_unlabeled(spark):
    import random

    from nebula_importer_spark.operators.graph import modularity

    rng = random.Random(17)
    nodes = list(range(40))
    edges = sorted(
        {tuple(sorted(rng.sample(nodes, 2))) for _ in range(120)}
    )
    labels = [(n, f"c{n % 4}") for n in nodes if n != 7]  # node 7 unlabeled
    got = {
        r.label: (r.n_nodes, r.e_intra, r.d_total, r.contribution_scaled)
        for r in modularity(*_mod_dfs(spark, edges, labels)).collect()
    }
    assert got == _mod_model(edges, labels)


def test_modularity_validation(spark):
    import pytest as _pt

    from nebula_importer_spark.operators.graph import modularity

    e, l = _mod_dfs(spark, [(1, 2)], [(1, "a"), (2, "a")])
    with _pt.raises(ValueError, match="not in input"):
        modularity(e.drop("b"), l)
    with _pt.raises(ValueError, match="not in input"):
        modularity(e, l.drop("label"))


# --------------------------------------------------- clustering_coefficient


def test_lcc_closed_forms(spark):
    from nebula_importer_spark.operators.graph import clustering_coefficient

    # triangle 1-2-3 plus pendant 4 attached to 3
    e = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4)], "src long, dst long"
    )
    r = {x.node: x for x in clustering_coefficient(e).collect()}
    # nodes 1, 2: both neighbor pairs adjacent -> 1.0
    assert r[1].lcc_ppm == 1_000_000 and r[2].lcc_ppm == 1_000_000
    # node 3: deg 3, one closed pair of three -> 1/3
    assert r[3].degree == 3 and r[3].lcc_ppm == 2_000_000 // 6
    # pendant: degree 1 -> undefined, NULL not 0
    assert r[4].degree == 1 and r[4].lcc_ppm is None and r[4].n_triangles == 0


def test_lcc_randomized_vs_python(spark):
    import random
    from itertools import combinations

    from nebula_importer_spark.operators.graph import clustering_coefficient

    rng = random.Random(3)
    edges = {tuple(sorted(rng.sample(range(20), 2))) for _ in range(60)}
    df = spark.createDataFrame(sorted(edges), "src long, dst long")
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    want = {}
    for v, nb in adj.items():
        tri = sum(1 for x, y in combinations(sorted(nb), 2) if y in adj[x])
        d = len(nb)
        want[v] = (d, tri, (1_000_000 * 2 * tri) // (d * (d - 1)) if d >= 2 else None)
    got = {
        r.node: (r.degree, r.n_triangles, r.lcc_ppm)
        for r in clustering_coefficient(df).collect()
    }
    assert got == want


# ---------------------------------------------------------------------------
# transitive_closure — min-plus path doubling
# ---------------------------------------------------------------------------

def _py_closure(edges, max_depth):
    """Independent sequential BFS-per-source reference (dicts, no Spark)."""
    adj = {}
    for u, v in set(edges):
        if u is None or v is None:
            continue
        adj.setdefault(u, set()).add(v)
    out = {}
    nodes = set(adj) | {v for vs in adj.values() for v in vs}
    for s in nodes:
        frontier, dist = {s}, 0
        seen = {}
        while frontier and dist < max_depth:
            dist += 1
            frontier = {w for v in frontier for w in adj.get(v, ())}
            for w in frontier:
                if (s, w) not in out and w not in seen:
                    out[(s, w)] = dist
                    seen[w] = dist
            frontier = {w for w in frontier if seen.get(w) == dist}
    return out


def test_closure_chain_exact_distances(spark):
    from nebula_importer_spark.operators.graph import transitive_closure

    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")], ["src", "dst"]
    )
    got = {(r.src, r.dst): r.dist for r in transitive_closure(e, max_depth=4).collect()}
    want = _py_closure([("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")], 4)
    assert got == want
    assert got[("a", "e")] == 4


def test_closure_shortcut_takes_min(spark):
    from nebula_importer_spark.operators.graph import transitive_closure

    # a->b->c plus direct a->c: dist(a,c) must be 1, not 2.
    e = spark.createDataFrame([("a", "b"), ("b", "c"), ("a", "c")], ["src", "dst"])
    got = {(r.src, r.dst): r.dist for r in transitive_closure(e, max_depth=4).collect()}
    assert got[("a", "c")] == 1


def test_closure_cycle_emits_self_rows(spark):
    from nebula_importer_spark.operators.graph import transitive_closure

    e = spark.createDataFrame([("a", "b"), ("b", "c"), ("c", "a")], ["src", "dst"])
    got = {(r.src, r.dst): r.dist for r in transitive_closure(e, max_depth=3).collect()}
    assert got[("a", "a")] == 3 and got[("b", "b")] == 3 and got[("c", "c")] == 3


def test_closure_depth_bound_and_nulls(spark):
    from nebula_importer_spark.operators.graph import transitive_closure

    rows = [("a", "b"), ("b", "c"), ("c", "d"), ("a", None), (None, "b")]
    e = spark.createDataFrame(rows, ["src", "dst"])
    got = {(r.src, r.dst): r.dist for r in transitive_closure(e, max_depth=2).collect()}
    assert ("a", "d") not in got  # dist 3 > bound
    assert got[("a", "c")] == 2
    assert all(s is not None and d is not None for s, d in got)


@pytest.mark.parametrize("seed", [0, 1])
def test_closure_random_parity(spark, seed):
    from nebula_importer_spark.operators.graph import transitive_closure

    rng = random.Random(seed)
    nodes = [f"n{i}" for i in range(14)]
    edges = list({(rng.choice(nodes), rng.choice(nodes)) for _ in range(30)})
    edges = [(u, v) for u, v in edges if u != v]
    e = spark.createDataFrame(edges, ["src", "dst"])
    got = {(r.src, r.dst): r.dist for r in transitive_closure(e, max_depth=5).collect()}
    want = _py_closure(edges, 5)
    assert got == want


def test_closure_validation(spark):
    from nebula_importer_spark.operators.graph import transitive_closure

    e = spark.createDataFrame([("a", "b")], ["src", "dst"])
    with pytest.raises(ValueError):
        transitive_closure(e, max_depth=0)
    with pytest.raises(ValueError):
        transitive_closure(e, src="missing")


def _kruskal(edges):
    """Unique-MSF model: Kruskal under the (w, a, b) total order on
    canonicalized deduped edges."""
    canon = {}
    for s, d, w in edges:
        if s == d or s is None or d is None or w is None:
            continue
        a, b = (s, d) if s < d else (d, s)
        if (a, b) not in canon or w < canon[(a, b)]:
            canon[(a, b)] = w
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    out = []
    for (a, b), w in sorted(canon.items(), key=lambda kv: (kv[1], kv[0])):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
            out.append((a, b, w))
    return sorted(out)


def test_boruvka_msf_random_parity_vs_kruskal(spark):
    import random

    from nebula_importer_spark.operators.graph import boruvka_msf

    rng = random.Random(17)
    for trial in range(3):
        n = rng.choice([8, 25, 60])
        edges = []
        for _ in range(n * 3):
            a, b = rng.randrange(n), rng.randrange(n)
            # duplicate weights on purpose: the total order must decide
            edges.append((a, b, rng.randrange(5)))
        # two extra isolated cliques -> a FOREST, not a tree
        edges += [(100, 101, 1), (101, 102, 1), (100, 102, 0)]
        df = spark.createDataFrame(edges, "src long, dst long, weight long")
        got = sorted(
            (r.src, r.dst, r.weight) for r in boruvka_msf(df).collect()
        )
        assert got == _kruskal(edges), trial


def test_boruvka_msf_edge_cases(spark):
    import pytest

    from nebula_importer_spark.operators.graph import boruvka_msf

    # self-loops, parallel edges, nulls
    df = spark.createDataFrame(
        [(1, 1, 5), (1, 2, 9), (2, 1, 3), (2, 3, 7), (None, 3, 1),
         (3, None, 1), (1, 2, None)],
        "src long, dst long, weight long",
    )
    got = sorted((r.src, r.dst, r.weight) for r in boruvka_msf(df).collect())
    assert got == [(1, 2, 3), (2, 3, 7)]
    # empty graph
    assert boruvka_msf(df.filter("src < 0")).count() == 0
    with pytest.raises(ValueError, match="not in input"):
        boruvka_msf(df.drop("weight"))


def test_association_rules_hand_computed(spark):
    from nebula_importer_spark.operators.graph import association_rules

    # baskets: {1:(a,b), 2:(a,b), 3:(a,b,c), 4:(a), 5:(c)}
    rows = [(1, "a"), (1, "b"), (2, "a"), (2, "b"), (3, "a"), (3, "b"),
            (3, "c"), (4, "a"), (5, "c"), (3, "a")]  # dup collapses
    df = spark.createDataFrame(rows, "g long, i string")
    got = {
        (r.antecedent, r.consequent): r
        for r in association_rules(
            df, group_col="g", item_col="i", min_pair_support=1
        ).collect()
    }
    # c_a=4, c_b=3, c_ab=3, N=5
    ab = got[("a", "b")]
    assert (ab.pair_support, ab.ante_support, ab.cons_support) == (3, 4, 3)
    assert ab.confidence_ppm == 1000000 * 3 // 4  # 750000
    assert ab.lift_ppm == (750000 * 5) // 3       # 1250000 > 1e6: associated
    ba = got[("b", "a")]
    assert ba.confidence_ppm == 1000000  # b always with a
    # a->c: 1 of 4 -> conf 250000, lift (250000*5)//2
    ac = got[("a", "c")]
    assert ac.confidence_ppm == 250000 and ac.lift_ppm == 625000


def test_association_rules_guards(spark):
    import pytest

    from nebula_importer_spark.operators.graph import association_rules

    df = spark.createDataFrame(
        [(1, i) for i in range(10)] + [(2, 1), (2, 2)], "g long, i long"
    )
    # basket 1 (10 items) dropped by the cap; only (1,2)/(2,1) survive
    got = association_rules(
        df, group_col="g", item_col="i", min_pair_support=1,
        max_group_size=5,
    ).collect()
    assert sorted((r.antecedent, r.consequent) for r in got) == [
        (1, 2), (2, 1)
    ]
    with pytest.raises(ValueError, match="min_pair_support"):
        association_rules(df, group_col="g", item_col="i",
                          min_pair_support=0)


def _matching_model(edges, salt="match", rounds=40):
    import hashlib

    e = set()
    for s, d in edges:
        if s is None or d is None or s == d:
            continue
        a, b = (s, d) if s < d else (d, s)
        e.add((a, b))
    pri = {
        ab: hashlib.md5(f"{salt}{ab[0]}|{ab[1]}".encode()).hexdigest()
        for ab in e
    }
    out = []
    for rnd in range(1, rounds + 1):
        if not e:
            break
        pick = {}
        for a, b in e:
            for v in (a, b):
                k = (pri[(a, b)], a, b)
                if v not in pick or k < pick[v]:
                    pick[v] = k
        mutual = {
            (a, b) for a, b in e
            if pick[a] == (pri[(a, b)], a, b) == pick[b]
        }
        out += [(a, b, rnd) for a, b in sorted(mutual)]
        matched = {v for ab in mutual for v in ab}
        e = {ab for ab in e if ab[0] not in matched and ab[1] not in matched}
    return sorted(out)


def test_maximal_matching_parity_and_properties(spark):
    import random

    from nebula_importer_spark.operators.graph import maximal_matching

    rng = random.Random(23)
    edges = [(f"v{rng.randrange(40)}", f"v{rng.randrange(40)}")
             for _ in range(120)]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = sorted(
        (r.src, r.dst, r.round) for r in maximal_matching(df).collect()
    )
    assert got == _matching_model(edges)
    # matching property: every vertex appears at most once
    seen = [v for a, b, _ in got for v in (a, b)]
    assert len(seen) == len(set(seen))
    # maximality: every input edge touches a matched vertex
    matched = set(seen)
    for s, d in edges:
        if s != d:
            a, b = min(s, d), max(s, d)
            assert a in matched or b in matched, (a, b)


def test_maximal_matching_hash_beats_sorted_path(spark):
    """On a path with ids in sorted order, a weight/id-ordered proposal
    scheme matches ONE edge per round; hash priorities break the
    adversarial order — the whole 30-edge path resolves in a handful of
    rounds (deterministic for this salt)."""
    from nebula_importer_spark.operators.graph import maximal_matching

    path = [(f"n{i:02d}", f"n{i + 1:02d}") for i in range(30)]
    df = spark.createDataFrame(path, "src string, dst string")
    got = maximal_matching(df).collect()
    assert max(r.round for r in got) <= 6
    assert got and len(got) >= 10  # near-perfect matching on a path


def test_maximal_matching_validation(spark):
    import pytest

    from nebula_importer_spark.operators.graph import maximal_matching

    df = spark.createDataFrame([("a", "a"), ("a", None)],
                               "src string, dst string")
    assert maximal_matching(df).count() == 0  # self-loop/null only
    with pytest.raises(ValueError, match="not in input"):
        maximal_matching(df.drop("dst"))
    with pytest.raises(ValueError, match="max_rounds"):
        maximal_matching(df, max_rounds=0)


def _mis_model(edges, salt="mis", rounds=40):
    import hashlib

    adj = {}
    for s, d in edges:
        if s is None or d is None or s == d:
            continue
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)

    def pri(v):
        return hashlib.md5(f"{salt}{v}".encode()).hexdigest()

    active = set(adj)
    out = []
    for rnd in range(1, rounds + 1):
        if not active:
            break
        winners = {
            v for v in active
            if all(pri(v) < pri(u) for u in adj[v] if u in active)
        }
        out += [(v, rnd) for v in sorted(winners)]
        retired = set(winners)
        for v in winners:
            retired |= adj[v] & active
        active -= retired
    return sorted(out)


def test_mis_parity_and_properties(spark):
    import random

    from nebula_importer_spark.operators.graph import (
        maximal_independent_set,
    )

    rng = random.Random(29)
    edges = [(f"v{rng.randrange(35)}", f"v{rng.randrange(35)}")
             for _ in range(100)]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = sorted(
        (r.node, r.round) for r in maximal_independent_set(df).collect()
    )
    assert got == _mis_model(edges)
    # independence: no input edge has both endpoints in the set
    mis = {n for n, _ in got}
    adj = {}
    for s, d in edges:
        if s != d:
            adj.setdefault(s, set()).add(d)
            adj.setdefault(d, set()).add(s)
            assert not (s in mis and d in mis), (s, d)
    # maximality: every non-member has a member neighbour
    for v in adj:
        if v not in mis:
            assert adj[v] & mis, v


def test_mis_isolated_and_validation(spark):
    import pytest

    from nebula_importer_spark.operators.graph import (
        maximal_independent_set,
    )

    # only self-loops/nulls -> no vertices -> empty set
    df = spark.createDataFrame([("a", "a"), (None, "b")],
                               "src string, dst string")
    assert maximal_independent_set(df).count() == 0
    with pytest.raises(ValueError, match="max_rounds"):
        maximal_independent_set(df, max_rounds=0)


def test_diameter_bound_on_known_graphs(spark):
    from nebula_importer_spark.operators.graph import diameter_bound

    # path a-b-c-d-e: diameter 4; min start 'a' -> far 'e' (d=4) ->
    # re-sweep from 'e' -> 'a' at 4
    path = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")]
    r = diameter_bound(
        spark.createDataFrame(path, "src string, dst string")
    ).collect()[0]
    assert (r.start_node, r.sweep1_node, r.sweep1_dist) == ("a", "e", 4)
    assert (r.sweep2_node, r.diameter_lower_bound, r.n_reached) == \
        ("a", 4, 5)

    # star: center 'c0' + leaves: diameter 2; start is min id
    star = [("c0", f"l{i}") for i in range(5)]
    r = diameter_bound(
        spark.createDataFrame(star, "src string, dst string")
    ).collect()[0]
    assert r.diameter_lower_bound == 2 and r.n_reached == 6

    # disconnected second component is invisible to the sweep
    two = path + [("x", "y")]
    r = diameter_bound(
        spark.createDataFrame(two, "src string, dst string")
    ).collect()[0]
    assert r.n_reached == 5


def test_diameter_bound_edges_and_validation(spark):
    import pytest

    from nebula_importer_spark.operators.graph import diameter_bound

    empty = spark.createDataFrame(
        [("a", "a"), (None, "b")], "src string, dst string"
    )
    assert diameter_bound(empty).count() == 0
    with pytest.raises(ValueError, match="max_hops"):
        diameter_bound(empty, max_hops=0)


# --- greedy_coloring (Jones-Plassmann) --------------------------------------


def _jp_model(edge_list, salt="color"):
    """Python Jones-Plassmann: md5 priorities, strict-min winners, mex."""
    import hashlib

    adj = {}
    for a, b in edge_list:
        if a == b or a is None or b is None:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)

    def pri(n):
        return hashlib.md5(f"{salt}{n}".encode()).hexdigest()

    color, rnd_of = {}, {}
    uncolored = set(adj)
    rnd = 0
    while uncolored:
        rnd += 1
        winners = [
            n for n in uncolored
            if all(
                pri(n) < pri(m)
                for m in adj[n] if m in uncolored and m != n
            )
        ]
        for n in winners:
            used = {color[m] for m in adj[n] if m in color}
            c = 0
            while c in used:
                c += 1
            color[n] = c
            rnd_of[n] = rnd
        uncolored -= set(winners)
    return {n: (color[n], rnd_of[n]) for n in color}


def test_coloring_proper_and_greedy_on_random_graph(spark):
    import random

    from nebula_importer_spark.operators.graph import greedy_coloring

    rng = random.Random(13)
    edge_list = list({
        tuple(sorted((rng.randint(0, 25), rng.randint(0, 25))))
        for _ in range(60)
    })
    edge_list = [(a, b) for a, b in edge_list if a != b]
    df = spark.createDataFrame(edge_list, "src long, dst long")
    got = {
        r.node: (r.color, r.round)
        for r in greedy_coloring(df).collect()
    }
    assert got == _jp_model(edge_list)
    # proper coloring: no edge joins two same-colored nodes
    for a, b in edge_list:
        assert got[a][0] != got[b][0]


def test_coloring_star_is_two_colors(spark):
    from nebula_importer_spark.operators.graph import greedy_coloring

    df = spark.createDataFrame(
        [(0, i) for i in range(1, 12)], "src long, dst long"
    )
    got = {r.node: r.color for r in greedy_coloring(df).collect()}
    assert len(set(got.values())) == 2
    # the hub is alone in its class
    hub_color = got[0]
    assert sum(1 for c in got.values() if c == hub_color) == 1


def test_coloring_clique_uses_n_colors(spark):
    from nebula_importer_spark.operators.graph import greedy_coloring

    nodes = list(range(5))
    df = spark.createDataFrame(
        [(a, b) for a in nodes for b in nodes if a < b], "src long, dst long"
    )
    got = {r.node: r.color for r in greedy_coloring(df).collect()}
    assert sorted(got.values()) == [0, 1, 2, 3, 4]


def test_coloring_validation_and_round_cap(spark):
    import pytest

    from nebula_importer_spark.operators.graph import greedy_coloring

    df = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError):
        greedy_coloring(df, src="nope")
    with pytest.raises(ValueError):
        greedy_coloring(df, max_rounds=0)
    # a path of 6 nodes cannot fully color in 1 JP round
    path = spark.createDataFrame(
        [(i, i + 1) for i in range(6)], "src long, dst long"
    )
    with pytest.raises(RuntimeError):
        greedy_coloring(path, max_rounds=1)


def _py_scc(edges):
    """Independent iterative-Tarjan reference (explicit stack, no
    recursion limit risk): returns {node: min id of its SCC}."""
    adj = {}
    nodes = set()
    for u, v in edges:
        nodes.add(u)
        nodes.add(v)
        if u != v:
            adj.setdefault(u, []).append(v)
    index = {}
    low = {}
    on_stack = set()
    stack = []
    comp = {}
    counter = [0]
    for root in sorted(nodes):
        if root in index:
            continue
        work = [(root, 0)]
        while work:
            v, pi = work[-1]
            if pi == 0:
                index[v] = low[v] = counter[0]
                counter[0] += 1
                stack.append(v)
                on_stack.add(v)
            recurse = False
            for w in adj.get(v, [])[pi:]:
                work[-1] = (v, pi + 1)
                if w not in index:
                    work.append((w, 0))
                    recurse = True
                    break
                elif w in on_stack:
                    low[v] = min(low[v], index[w])
                pi += 1
            if recurse:
                continue
            if low[v] == index[v]:
                members = []
                while True:
                    w = stack.pop()
                    on_stack.discard(w)
                    members.append(w)
                    if w == v:
                        break
                m = min(members)
                for w in members:
                    comp[w] = m
            work.pop()
            if work:
                p, _ = work[-1]
                low[p] = min(low[p], low[v])
    return comp


def test_scc_known_graph(spark):
    from nebula_importer_spark.operators.graph import (
        strongly_connected_components,
    )

    # two cycles joined by DAG edges + a pure tail
    edges = [
        ("a", "b"), ("b", "c"), ("c", "a"),      # SCC {a,b,c}
        ("c", "d"), ("d", "e"), ("e", "d"),      # SCC {d,e}
        ("e", "f"), ("f", "g"),                  # tail singletons
        ("x", "a"),                              # head singleton
        ("b", "b"),                              # self-loop (ignored)
    ]
    e = spark.createDataFrame(edges, "src string, dst string")
    got = {
        (r["node"], r["scc_id"])
        for r in strongly_connected_components(e).collect()
    }
    assert got == {
        ("a", "a"), ("b", "a"), ("c", "a"),
        ("d", "d"), ("e", "d"),
        ("f", "f"), ("g", "g"), ("x", "x"),
    }


def test_scc_single_giant_cycle(spark):
    from nebula_importer_spark.operators.graph import (
        strongly_connected_components,
    )

    n = 12
    edges = [(f"n{i:02d}", f"n{(i + 1) % n:02d}") for i in range(n)]
    e = spark.createDataFrame(edges, "src string, dst string")
    rows = strongly_connected_components(e).collect()
    assert len(rows) == n
    assert {r["scc_id"] for r in rows} == {"n00"}


def test_scc_random_parity(spark):
    from nebula_importer_spark.operators.graph import (
        strongly_connected_components,
    )

    rng = random.Random(20260820)
    for trial in range(3):
        n = rng.randint(8, 20)
        m = rng.randint(n, 3 * n)
        edges = list(
            {
                (f"v{rng.randrange(n):02d}", f"v{rng.randrange(n):02d}")
                for _ in range(m)
            }
        )
        expect = _py_scc(edges)
        e = spark.createDataFrame(edges, "src string, dst string")
        got = {
            r["node"]: r["scc_id"]
            for r in strongly_connected_components(e).collect()
        }
        # operator drops pure self-loop isolates (no non-self edges);
        # restrict the reference accordingly
        keep = {u for u, v in edges if u != v} | {
            v for u, v in edges if u != v
        }
        expect = {k: v for k, v in expect.items() if k in keep}
        assert got == expect, f"trial {trial}: {sorted(edges)}"


def test_dag_layers_chain_and_diamond(spark):
    from nebula_importer_spark.operators.graph import dag_layers

    # diamond with a shortcut: layer = LONGEST path, so d is 2 not 1
    edges = [("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"), ("a", "d")]
    e = spark.createDataFrame(edges, "src string, dst string")
    got = {r["node"]: r["layer"] for r in dag_layers(e).collect()}
    assert got == {"a": 0, "b": 1, "c": 1, "d": 2}


def test_dag_layers_cycle_and_selfloop_raise(spark):
    from nebula_importer_spark.operators.graph import dag_layers

    cyc = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], "src string, dst string"
    )
    with pytest.raises(ValueError, match="not a DAG"):
        dag_layers(cyc, max_rounds=10)
    loop = spark.createDataFrame(
        [("a", "b"), ("b", "b")], "src string, dst string"
    )
    with pytest.raises(ValueError, match="self-loop"):
        dag_layers(loop)


def test_dag_layers_random_parity(spark):
    import random

    from nebula_importer_spark.operators.graph import dag_layers

    rng = random.Random(606)
    n = 25
    # random DAG: edges only i -> j with i < j
    edges = list(
        {
            (f"v{a:02d}", f"v{b:02d}")
            for _ in range(60)
            for a, b in [sorted(rng.sample(range(n), 2))]
        }
    )
    e = spark.createDataFrame(edges, "src string, dst string")
    got = {r["node"]: r["layer"] for r in dag_layers(e).collect()}
    # python longest-path
    from collections import defaultdict

    inn = defaultdict(list)
    nodes = set()
    for u, v in edges:
        inn[v].append(u)
        nodes.update((u, v))
    layer = {}

    def depth(v):
        if v not in layer:
            layer[v] = (
                1 + max(depth(u) for u in inn[v]) if inn[v] else 0
            )
        return layer[v]

    expect = {v: depth(v) for v in nodes}
    assert got == expect


def _py_wl(edges, rounds=3, salt="wl"):
    """Identical-recurrence Python model (hashlib md5, exact int sums)."""
    import hashlib
    from collections import defaultdict

    def md5(s):
        return hashlib.md5(s.encode()).hexdigest()

    adj = defaultdict(set)
    for u, v in edges:
        if u is not None and v is not None and u != v:
            adj[u].add(v)
            adj[v].add(u)
    color = {v: md5(f"{salt}0|{len(nb)}") for v, nb in adj.items()}
    for r in range(1, rounds + 1):
        nxt = {}
        for v, nb in adj.items():
            s = sum(int(md5(f"{salt}h|{color[u]}")[:13], 16) for u in nb)
            nxt[v] = md5(f"{salt}{r}|{color[v]}|{s}")
        color = nxt
    return color


def test_wl_distinguishes_path_roles(spark):
    from nebula_importer_spark.operators.graph import wl_refinement

    # path a-b-c-d-e: ends {a,e}, nexts {b,d}, center {c} — 3 classes
    edges = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")]
    e = spark.createDataFrame(edges, "src string, dst string")
    got = {r["node"]: r["wl_color"] for r in wl_refinement(e).collect()}
    assert got["a"] == got["e"]
    assert got["b"] == got["d"]
    assert len({got["a"], got["b"], got["c"]}) == 3
    assert got == _py_wl(edges)


def test_wl_known_blindness_and_isomorphism(spark):
    from nebula_importer_spark.operators.graph import wl_refinement

    # classic 1-WL failure: 6-cycle vs two disjoint triangles — every
    # node degree 2, identical neighbor multisets forever -> ONE color
    hexa = [(f"h{i}", f"h{(i + 1) % 6}") for i in range(6)]
    tris = [("t0", "t1"), ("t1", "t2"), ("t2", "t0"),
            ("t3", "t4"), ("t4", "t5"), ("t5", "t3")]
    e = spark.createDataFrame(hexa + tris, "src string, dst string")
    got = {r["node"]: r["wl_color"] for r in wl_refinement(e).collect()}
    assert len(set(got.values())) == 1  # documented blindness
    # isomorphic stars get identical color multisets
    s1 = [("c1", f"l1{i}") for i in range(4)]
    s2 = [("c2", f"l2{i}") for i in range(4)]
    e2 = spark.createDataFrame(s1 + s2, "src string, dst string")
    got2 = {r["node"]: r["wl_color"] for r in wl_refinement(e2).collect()}
    assert got2["c1"] == got2["c2"]
    assert got2["l10"] == got2["l23"]
    assert got2["c1"] != got2["l10"]


def test_wl_random_parity(spark):
    import random

    from nebula_importer_spark.operators.graph import wl_refinement

    rng = random.Random(2468)
    edges = list(
        {
            (f"v{rng.randrange(18):02d}", f"v{rng.randrange(18):02d}")
            for _ in range(40)
        }
    )
    e = spark.createDataFrame(edges, "src string, dst string")
    got = {
        r["node"]: r["wl_color"]
        for r in wl_refinement(e, rounds=2).collect()
    }
    assert got == _py_wl(edges, rounds=2)


def test_wl_validation(spark):
    from nebula_importer_spark.operators.graph import wl_refinement

    e = spark.createDataFrame([("a", "b")], "src string, dst string")
    with pytest.raises(ValueError, match="not in edges"):
        wl_refinement(e, src="zzz")
    with pytest.raises(ValueError, match="rounds"):
        wl_refinement(e, rounds=-1)


def _py_hyperball(edges, radius, p=6, salt="hb"):
    """Independent model: exact BFS balls, then the md5 register rule +
    integer/linear-counting estimate exactly as hll_distinct defines."""
    import hashlib
    import math
    from collections import defaultdict

    m = 1 << p
    w_bits = 52 - p
    q_max = w_bits + 1

    def h52(v):
        return int(hashlib.md5((salt + str(v)).encode()).hexdigest()[:13], 16)

    succ = defaultdict(set)
    nodes = set()
    for s, d in edges:
        succ[s].add(d)
        nodes |= {s, d}
    balls = {v: {v} for v in nodes}
    out = {}
    # alpha constant as in sketch._hll_constant
    alpha_num = 7213 * m
    alpha_den = 10000 * m + 10790
    k_const = alpha_num * m * m * (1 << q_max) // alpha_den
    for r in range(1, radius + 1):
        balls = {
            v: balls[v] | set().union(*(balls[w] for w in succ[v]))
            if succ[v] else balls[v]
            for v in nodes
        }
        for v in nodes:
            regs = {}
            for u in balls[v]:
                h = h52(u)
                b = h >> w_bits
                w = h % (1 << w_bits)
                rho = q_max if w == 0 else w_bits - (w.bit_length() - 1)
                regs[b] = max(regs.get(b, 0), rho)
            nz = len(regs)
            s_scaled = sum(1 << (q_max - rho) for rho in regs.values()) + (
                m - nz
            ) * (1 << q_max)
            v_zero = m - nz
            raw = k_const // s_scaled
            if raw * 2 <= 5 * m and v_zero > 0:
                est = math.floor(float(m) * math.log(float(m) / v_zero))
            else:
                est = raw
            out[(v, r)] = (m, v_zero, s_scaled, est)
    return out


def test_hyperball_chain_and_parity(spark):
    from nebula_importer_spark.operators.graph import hyperball

    # directed chain a->b->c->d: ball sizes grow 2,3,4 then saturate
    chain = [("a", "b"), ("b", "c"), ("c", "d")]
    df = spark.createDataFrame(chain, "src string, dst string")
    got = {
        (r.node, r.radius): (r.m, r.v_zero, r.s_scaled, r.est_distinct)
        for r in hyperball(df, radius=3).collect()
    }
    want = _py_hyperball(chain, 3)
    assert got == want
    # small-range branch reads tiny balls exactly
    assert got[("a", 1)][3] == 2
    assert got[("a", 2)][3] == 3
    assert got[("a", 3)][3] == 4
    assert got[("d", 3)][3] == 1  # sink: only itself


def test_hyperball_random_graph_parity(spark):
    import random

    from nebula_importer_spark.operators.graph import hyperball

    rng = random.Random(21)
    nodes = [f"n{i}" for i in range(40)]
    edges = list(
        {
            (rng.choice(nodes), rng.choice(nodes))
            for _ in range(120)
        }
    )
    edges = [(s, d) for s, d in edges if s != d]
    df = spark.createDataFrame(edges, "src string, dst string").repartition(5)
    got = {
        (r.node, r.radius): (r.m, r.v_zero, r.s_scaled, r.est_distinct)
        for r in hyperball(df, radius=2, p=6).collect()
    }
    assert got == _py_hyperball(edges, 2, p=6)


def test_hyperball_validation(spark):
    import pytest

    from nebula_importer_spark.operators.graph import hyperball

    df = spark.createDataFrame([("a", "b")], "src string, dst string")
    with pytest.raises(ValueError, match="radius"):
        hyperball(df, radius=0)
    with pytest.raises(ValueError, match="p must"):
        hyperball(df, p=1)


def test_graph_health_report(spark):
    from nebula_importer_spark.operators.graph import graph_health

    edges = spark.createDataFrame(
        [
            ("a", "b"), ("a", "b"),          # parallel
            ("b", "a"),                       # reciprocal of a->b
            ("b", "c"), ("c", "c"),           # plus a self-loop
            ("d", None), (None, "e"),         # null endpoints
        ],
        "src string, dst string",
    ).repartition(3)
    r = graph_health(edges).collect()[0]
    assert r.n_edges == 7 and r.n_null_endpoint == 2
    assert r.n_distinct == 4 and r.n_self_loops == 1
    assert r.n_parallel_extra == 1
    assert r.n_nodes == 3  # a, b, c
    assert r.n_reciprocal == 2  # a->b and b->a
    assert r.reciprocity_ppm == 2 * 10**6 // 3
    # loop-only graph: NULL reciprocity (no non-loop edges)
    loops = spark.createDataFrame([("x", "x")], "src string, dst string")
    rl = graph_health(loops).collect()[0]
    assert rl.reciprocity_ppm is None and rl.n_self_loops == 1


def test_degree_assortativity_signs(spark):
    from nebula_importer_spark.operators.graph import degree_assortativity

    # star: hub degree n, leaves degree 1 -> strongly negative
    star = [("h", f"l{i}") for i in range(8)]
    df = spark.createDataFrame(star, "src string, dst string")
    r = degree_assortativity(df).collect()[0]
    assert r.n_edges_undirected == 8 and r.n_nodes == 9
    assert r.r_milli == -1000  # exactly -1 for a pure star

    # two disjoint cliques of different sizes: positive assortativity
    cliq = []
    for grp, n in (("p", 4), ("q", 6)):
        nodes = [f"{grp}{i}" for i in range(n)]
        cliq += [
            (a, b) for i, a in enumerate(nodes) for b in nodes[i + 1:]
        ]
    df2 = spark.createDataFrame(cliq, "src string, dst string")
    r2 = degree_assortativity(df2).collect()[0]
    assert r2.r_milli == 1000  # within-clique degrees are equal -> r = 1

    # regular graph (one cycle): zero variance -> NULL
    cyc = [(f"c{i}", f"c{(i + 1) % 5}") for i in range(5)]
    r3 = degree_assortativity(
        spark.createDataFrame(cyc, "src string, dst string")
    ).collect()[0]
    assert r3.r_milli is None

    # parity vs an exact Fraction model on a random graph
    import random
    from fractions import Fraction

    rng = random.Random(5)
    nodes = [f"n{i}" for i in range(25)]
    es = list({(rng.choice(nodes), rng.choice(nodes)) for _ in range(60)})
    es = [(s, d) for s, d in es if s != d]
    rg = degree_assortativity(
        spark.createDataFrame(es, "src string, dst string").repartition(4)
    ).collect()[0]
    und = {tuple(sorted(e)) for e in es}
    from collections import Counter

    deg = Counter()
    for a, b in und:
        deg[a] += 1
        deg[b] += 1
    pairs = [(deg[a], deg[b]) for a, b in und] + [
        (deg[b], deg[a]) for a, b in und
    ]
    m = len(pairs)
    sx = sum(x for x, _ in pairs)
    sxx = sum(x * x for x, _ in pairs)
    sxy = sum(x * y for x, y in pairs)
    num = m * sxy - sx * sx
    den = m * sxx - sx * sx
    want = (
        None
        if den == 0
        else (Fraction(num, den).numerator * 1000)
        // Fraction(num, den).denominator
        if False
        else (num * 1000) // den  # python floor matches the pmod device
    )
    assert rg.r_milli == want


def _py_wsp(edges, max_hops):
    """Exact hop-bounded Bellman-Ford over collapsed parallel edges."""
    from collections import defaultdict

    emin = {}
    for s, d, w in edges:
        if s is None or d is None or w is None:
            continue
        k = (s, d)
        emin[k] = min(emin.get(k, w), w)
    # dp[h][(s,d)] = min weight using exactly <= h edges
    best = dict(((s, d), (w, 1)) for (s, d), w in emin.items())
    frontier = dict(((s, d), w) for (s, d), w in emin.items())
    for h in range(2, max_hops + 1):
        new_frontier = {}
        for (s, m), w1 in frontier.items():
            for (m2, d), w2 in emin.items():
                if m2 != m:
                    continue
                k = (s, d)
                w = w1 + w2
                if k not in new_frontier or w < new_frontier[k]:
                    new_frontier[k] = w
        for k, w in new_frontier.items():
            if k not in best or (w, h) < best[k]:
                best[k] = (w, h)
        frontier = new_frontier
    return {k: v for k, v in best.items()}


def test_weighted_shortest_paths_closed_and_parity(spark):
    from nebula_importer_spark.operators.graph import weighted_shortest_paths

    # cheaper-but-longer vs expensive-direct: both visible at right hops
    edges = [
        ("a", "b", 10),
        ("a", "x", 1), ("x", "y", 1), ("y", "b", 1),  # cost 3 in 3 hops
        ("b", "c", 2),
        ("a", "b", 50),  # parallel collapses
    ]
    df = spark.createDataFrame(edges, "src string, dst string, weight long")
    got = {
        (r.src, r.dst): (r.weight, r.hops)
        for r in weighted_shortest_paths(df, max_hops=4).collect()
    }
    assert got[("a", "b")] == (3, 3)  # long route wins
    assert got[("a", "c")] == (5, 4)
    # hop budget 2: the cheap 3-hop route is out of reach
    got2 = {
        (r.src, r.dst): (r.weight, r.hops)
        for r in weighted_shortest_paths(df, max_hops=2).collect()
    }
    assert got2[("a", "b")] == (10, 1)
    assert got2 == _py_wsp(edges, 2)

    import random

    rng = random.Random(9)
    nodes = [f"n{i}" for i in range(15)]
    res = [
        (rng.choice(nodes), rng.choice(nodes), rng.randrange(1, 20))
        for _ in range(50)
    ]
    res = [(s, d, w) for s, d, w in res if s != d]
    dfr = spark.createDataFrame(
        res, "src string, dst string, weight long"
    ).repartition(4)
    gotr = {
        (r.src, r.dst): (r.weight, r.hops)
        for r in weighted_shortest_paths(dfr, max_hops=6).collect()
    }
    assert gotr == _py_wsp(res, 6)


def test_weighted_shortest_paths_validation(spark):
    import pytest

    from nebula_importer_spark.operators.graph import weighted_shortest_paths

    df = spark.createDataFrame([("a", "b", 1.0)], "src string, dst string, w double")
    with pytest.raises(ValueError, match="max_hops"):
        weighted_shortest_paths(df, weight="w", max_hops=0)
    with pytest.raises(ValueError, match="not in edges"):
        weighted_shortest_paths(df, weight="zz")
    with pytest.raises(ValueError, match="integral"):
        weighted_shortest_paths(df, weight="w")


def test_harmonic_from_balls_chain_parity(spark):
    from nebula_importer_spark.operators.graph import (
        harmonic_from_balls,
        hyperball,
    )

    # chain a->b->c->d: small-range branch reads exact ball sizes, so
    # harmonic is the exact 1/1 + 1/2 + 1/3 sum in floored micro terms
    chain = [("a", "b"), ("b", "c"), ("c", "d")]
    df = spark.createDataFrame(chain, "src string, dst string")
    hb = hyperball(df, radius=3)
    got = {
        r.node: (r.max_radius, r.reach_est, r.harmonic_micro)
        for r in harmonic_from_balls(hb).collect()
    }
    third = 10**6 // 3
    assert got["a"] == (3, 4, 10**6 + 10**6 // 2 + third)
    assert got["b"] == (3, 3, 10**6 + 10**6 // 2)
    assert got["c"] == (3, 2, 10**6)
    assert got["d"] == (3, 1, 0)  # sink reaches nothing

    # model parity on the random graph: same deltas, same floors
    import random
    from collections import defaultdict

    rng = random.Random(77)
    nodes = [f"n{i}" for i in range(30)]
    edges = list({(rng.choice(nodes), rng.choice(nodes)) for _ in range(80)})
    edges = [(s, d) for s, d in edges if s != d]
    dfe = spark.createDataFrame(edges, "src string, dst string")
    hb2 = hyperball(dfe, radius=3, p=6)
    est = defaultdict(dict)
    for r in hb2.collect():
        est[r.node][r.radius] = r.est_distinct
    want = {}
    for v, by_r in est.items():
        s = 0
        prev = 1
        for r in sorted(by_r):
            d = by_r[r] - prev
            t = d * 10**6
            s += (t - (t % r + r) % r) // r
            prev = by_r[r]
        want[v] = (max(by_r), by_r[max(by_r)], s)
    got2 = {
        r.node: (r.max_radius, r.reach_est, r.harmonic_micro)
        for r in harmonic_from_balls(hb2).collect()
    }
    assert got2 == want


def test_harmonic_from_balls_validation(spark):
    import pytest

    from nebula_importer_spark.operators.graph import harmonic_from_balls

    df = spark.createDataFrame([("a", 1)], "node string, radius long")
    with pytest.raises(ValueError, match="not in balls"):
        harmonic_from_balls(df)


def _py_rich_club(edges, thresholds):
    from collections import Counter

    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    deg = Counter()
    for a, b in und:
        deg[a] += 1
        deg[b] += 1
    out = {}
    for k in thresholds:
        club = {n for n, d in deg.items() if d > k}
        ec = sum(1 for a, b in und if a in club and b in club)
        nc = len(club)
        phi = (
            None if nc < 2 else 2 * ec * 10**6 // (nc * (nc - 1))
        )
        out[k] = (nc, ec, phi)
    return out


def test_rich_club_closed_and_parity(spark):
    from nebula_importer_spark.operators.graph import rich_club

    # hub clique of 4 (wired to each other) + leaves on each hub
    edges = []
    hubs = ["h1", "h2", "h3", "h4"]
    for i, a in enumerate(hubs):
        for b in hubs[i + 1:]:
            edges.append((a, b))
        for j in range(4):
            edges.append((a, f"leaf_{a}_{j}"))
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {
        r.k: (r.n_club, r.e_club, r.phi_micro)
        for r in rich_club(df, thresholds=[0, 3, 6]).collect()
    }
    # k=3: only hubs (degree 7) qualify; they form a complete K4 -> phi=1
    assert got[3] == (4, 6, 10**6)
    # k=6: still the hubs (degree 7 > 6)
    assert got[6] == (4, 6, 10**6)
    assert got == _py_rich_club(edges, [0, 3, 6])

    import random

    rng = random.Random(44)
    nodes = [f"n{i}" for i in range(30)]
    res = list({(rng.choice(nodes), rng.choice(nodes)) for _ in range(90)})
    dfr = spark.createDataFrame(res, "src string, dst string").repartition(4)
    gotr = {
        r.k: (r.n_club, r.e_club, r.phi_micro)
        for r in rich_club(dfr, thresholds=[1, 2, 4, 8]).collect()
    }
    assert gotr == _py_rich_club(res, [1, 2, 4, 8])
    # empty club: NULL phi visible
    assert gotr[8][2] is None or gotr[8][0] >= 2


def test_rich_club_validation(spark):
    import pytest

    from nebula_importer_spark.operators.graph import rich_club

    df = spark.createDataFrame([("a", "b")], "src string, dst string")
    with pytest.raises(ValueError, match="thresholds"):
        rich_club(df, thresholds=[-1])
    with pytest.raises(ValueError, match="not in input"):
        rich_club(df, src="zz")


def test_trustrank_python_parity(spark):
    import random

    from nebula_importer_spark.operators.graph import trustrank

    rng = random.Random(99)
    edges = list({(rng.randint(0, 30), rng.randint(0, 30)) for _ in range(120)})
    seeds = [0, 5, 9]
    scale, d, iters = 10**12, 85, 4

    nodes = sorted({s for s, _ in edges} | {t for _, t in edges})
    n = len(nodes)
    seeds_in = [x for x in seeds if x in nodes]
    init_pr, init_tr = scale // n, scale // len(seeds_in)
    base_pr = init_pr * (100 - d) // 100
    base_tr = init_tr * (100 - d) // 100
    outdeg = {}
    for s_, _ in edges:
        outdeg[s_] = outdeg.get(s_, 0) + 1
    pr = {v: init_pr for v in nodes}
    tr = {v: init_tr if v in seeds_in else 0 for v in nodes}
    for _ in range(iters):
        mp, mt = {}, {}
        for s_, t_ in edges:
            mp[t_] = mp.get(t_, 0) + pr[s_] // outdeg[s_]
            mt[t_] = mt.get(t_, 0) + tr[s_] // outdeg[s_]
        pr = {v: base_pr + d * mp.get(v, 0) // 100 for v in nodes}
        tr = {
            v: (base_tr if v in seeds_in else 0) + d * mt.get(v, 0) // 100
            for v in nodes
        }

    edf = spark.createDataFrame(edges, "src long, dst long")
    sdf = spark.createDataFrame([(x,) for x in seeds], "node long")
    got = {
        r.node: (r.rank_scaled, r.trust_scaled, r.spam_mass_ppm)
        for r in trustrank(edf, sdf, iterations=iters).collect()
    }
    for v in nodes:
        sm = (pr[v] - tr[v]) * 10**6
        # exact truncation toward zero (Spark div semantics)
        if pr[v] > 0:
            sm = sm // pr[v] if sm >= 0 else -((-sm) // pr[v])
        else:
            sm = 0
        assert got[v] == (pr[v], tr[v], sm), f"node {v}"


def test_trustrank_validation(spark):
    import pytest

    from nebula_importer_spark.operators.graph import trustrank

    e = spark.createDataFrame([(1, 2)], "src long, dst long")
    s0 = spark.createDataFrame([(9,)], "node long")
    with pytest.raises(ValueError, match="no seed"):
        trustrank(e, s0).collect()
    with pytest.raises(ValueError, match="iterations"):
        trustrank(e, s0, iterations=0)
    with pytest.raises(ValueError, match="not in seeds"):
        trustrank(e, e.select("src"), seed_col="node")
