"""Wave-14 graph/profile operators: sampled-pivot closeness centrality,
deterministic random-walk corpus, and the median/MAD robust outlier
profile — each parity-tested against an independent pure-Python model on
hand-built and randomized inputs."""

from __future__ import annotations

import hashlib
import random
from collections import deque

import pytest
from pyspark.sql import functions as F

from nebula_importer_spark.operators.graph import (
    closeness_centrality,
    random_walks,
)
from nebula_importer_spark.operators.profile import robust_outliers


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def _py_closeness(edges, k, max_hops, salt):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    seeds = sorted(nodes, key=lambda n: (_md5(f"{salt}|{n}"), n))[:k]
    adj = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
    dist = {}  # (source, node) -> d
    for s in seeds:
        seen = {s: 0}
        q = deque([s])
        while q:
            u = q.popleft()
            if seen[u] >= max_hops:
                continue
            for v in adj.get(u, ()):
                if v not in seen:
                    seen[v] = seen[u] + 1
                    q.append(v)
        for n, d in seen.items():
            dist[(s, n)] = d
    out = {}
    for (_, n), d in dist.items():
        cur = out.setdefault(n, [0, 0, 0])
        cur[0] += 1
        cur[1] += d
        cur[2] += 1_000_000 // d if d > 0 else 0
    return out


def _py_walks(edges, starts, walk_len, salt):
    adj = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
    rows = set()
    for s in sorted(set(starts)):
        cur = s
        rows.add((s, 0, s))
        for t in range(1, walk_len + 1):
            nbrs = adj.get(cur)
            if not nbrs:
                break
            cur = min(nbrs, key=lambda v: (_md5(f"{salt}|{s}|{t}|{v}"), v))
            rows.add((s, t, cur))
    return rows


def _random_graph(rng, n_nodes=14, n_edges=40):
    nodes = [f"n{i}" for i in range(n_nodes)]
    edges = set()
    while len(edges) < n_edges:
        u, v = rng.choice(nodes), rng.choice(nodes)
        if u != v:
            edges.add((u, v))
    return sorted(edges)


def _edges_df(spark, edges):
    return spark.createDataFrame(list(edges), ["src", "dst"])


class TestClosenessCentrality:
    def test_path_graph_hand_computed(self, spark):
        # path a->b->c->d, seeds by md5 are deterministic; verify against
        # the python model AND spot-check one closed-form row
        edges = [("a", "b"), ("b", "c"), ("c", "d")]
        got = {
            r["node"]: (r["n_sources"], r["sum_dist"], r["harmonic_ppm"])
            for r in closeness_centrality(
                _edges_df(spark, edges), k_sources=2, max_hops=3, salt="t"
            ).collect()
        }
        want = _py_closeness(edges, 2, 3, "t")
        assert got == {n: tuple(v) for n, v in want.items()}

    def test_randomized_parity(self, spark):
        rng = random.Random(1404)
        for _ in range(3):
            edges = _random_graph(rng)
            got = {
                r["node"]: (r["n_sources"], r["sum_dist"], r["harmonic_ppm"])
                for r in closeness_centrality(
                    _edges_df(spark, edges), k_sources=3, max_hops=4, salt="s"
                ).collect()
            }
            want = {n: tuple(v) for n, v in _py_closeness(edges, 3, 4, "s").items()}
            assert got == want

    def test_seed_is_self_distance_zero(self, spark):
        edges = [("a", "b"), ("b", "a")]
        rows = {
            r["node"]: r
            for r in closeness_centrality(
                _edges_df(spark, edges), k_sources=2, max_hops=2, salt="z"
            ).collect()
        }
        # both nodes are seeds (k=2 of 2): each reached by both sources,
        # self at 0 + the other at 1
        for n in ("a", "b"):
            assert rows[n]["n_sources"] == 2
            assert rows[n]["sum_dist"] == 1
            assert rows[n]["harmonic_ppm"] == 1_000_000

    def test_unreached_nodes_absent(self, spark):
        # two disconnected pairs, k=1: only the seed's component appears
        edges = [("a", "b"), ("c", "d")]
        out = closeness_centrality(
            _edges_df(spark, edges), k_sources=1, max_hops=3, salt="t"
        )
        want = _py_closeness(edges, 1, 3, "t")
        assert {r["node"] for r in out.collect()} == set(want)
        assert len(want) == 2  # seed + its one neighbor

    def test_validation(self, spark):
        df = _edges_df(spark, [("a", "b")])
        with pytest.raises(ValueError):
            closeness_centrality(df, k_sources=0)
        with pytest.raises(ValueError):
            closeness_centrality(df, max_hops=-1)


class TestRandomWalks:
    def test_deterministic_and_model_parity(self, spark):
        rng = random.Random(77)
        edges = _random_graph(rng)
        starts = spark.createDataFrame([("n0",), ("n1",), ("n2",)], ["node"])
        out1 = {
            (r["walk_id"], r["step"], r["node"])
            for r in random_walks(
                _edges_df(spark, edges), starts, walk_len=4, salt="w"
            ).collect()
        }
        out2 = {
            (r["walk_id"], r["step"], r["node"])
            for r in random_walks(
                _edges_df(spark, edges), starts, walk_len=4, salt="w"
            ).collect()
        }
        assert out1 == out2  # reproducible across runs
        assert out1 == _py_walks(edges, ["n0", "n1", "n2"], 4, "w")

    def test_salt_changes_walks(self, spark):
        rng = random.Random(78)
        edges = _random_graph(rng, n_nodes=10, n_edges=35)
        starts = spark.createDataFrame([(f"n{i}",) for i in range(10)], ["node"])
        a = {
            (r["walk_id"], r["step"], r["node"])
            for r in random_walks(
                _edges_df(spark, edges), starts, walk_len=3, salt="a"
            ).collect()
        }
        b = {
            (r["walk_id"], r["step"], r["node"])
            for r in random_walks(
                _edges_df(spark, edges), starts, walk_len=3, salt="b"
            ).collect()
        }
        assert a != b

    def test_sink_ends_walk(self, spark):
        edges = [("a", "b")]  # b is a sink
        starts = spark.createDataFrame([("a",)], ["node"])
        rows = sorted(
            (r["step"], r["node"])
            for r in random_walks(
                _edges_df(spark, edges), starts, walk_len=5, salt="w"
            ).collect()
        )
        assert rows == [(0, "a"), (1, "b")]

    def test_validation(self, spark):
        df = _edges_df(spark, [("a", "b")])
        starts = spark.createDataFrame([("a",)], ["node"])
        with pytest.raises(ValueError):
            random_walks(df, starts, walk_len=-1)


def _py_mad(rows, k_ppm=3_500_000, scale=10**6):
    import math

    by_key = {}
    for k, v, i in rows:
        by_key.setdefault(k, []).append((v, i))
    out = {}
    for k, vs in by_key.items():
        n_rows = len(vs)
        vals = sorted(
            (math.floor(v * scale), i) for v, i in vs if v is not None
        )
        n_null = n_rows - len(vals)
        if not vals:
            out[k] = (n_rows, n_null, None, None, 0)
            continue
        med = vals[(len(vals) + 1) // 2 - 1][0]
        devs = sorted((abs(v - med), i) for v, i in vals)
        mad = devs[(len(devs) + 1) // 2 - 1][0]
        n_out = sum(1 for d, _ in devs if d * 1_000_000 > k_ppm * mad)
        out[k] = (n_rows, n_null, med, mad, n_out)
    return out


class TestRobustOutliers:
    def _run(self, spark, rows, **kw):
        df = spark.createDataFrame(rows, "k string, v double, id long")
        got = robust_outliers(
            df, key_col="k", value_col="v", id_col="id", **kw
        ).collect()
        return {
            r["k"]: (
                r["n_rows"],
                r["n_null"],
                r["median_q"],
                r["mad_q"],
                r["n_outliers"],
            )
            for r in got
        }

    def test_hand_computed(self, spark):
        # values 1..5 plus a wild 100: med=3.0->3e6 (lower median of 6 is
        # the 3rd element), MAD over devs {2e6,1e6,0,1e6,2e6,97e6} lower
        # median = 1e6; only the 100 exceeds 3.5 MADs
        rows = [("u", float(v), i) for i, v in enumerate([1, 2, 3, 4, 5, 100])]
        got = self._run(spark, rows)
        assert got == {"u": (6, 0, 3_000_000, 1_000_000, 1)}

    def test_null_values_counted_not_scored(self, spark):
        rows = [("u", 1.0, 1), ("u", None, 2), ("u", 3.0, 3)]
        got = self._run(spark, rows)
        assert got == {"u": (3, 1, 1_000_000, 0, 1)}
        # MAD=0 (two distinct values, lower median dev 0): the differing
        # value flags — the documented degenerate semantics

    def test_all_null_key(self, spark):
        rows = [("u", None, 1), ("u", None, 2)]
        got = self._run(spark, rows)
        assert got == {"u": (2, 2, None, None, 0)}

    def test_randomized_parity(self, spark):
        rng = random.Random(1405)
        rows = []
        i = 0
        for k in ("a", "b", "c"):
            for _ in range(rng.randrange(3, 30)):
                v = (
                    None
                    if rng.random() < 0.1
                    else round(rng.uniform(-50, 50), 3)
                )
                rows.append((k, v, i))
                i += 1
        got = self._run(spark, rows)
        assert got == _py_mad(rows)

    def test_validation(self, spark):
        df = spark.createDataFrame([("a", 1.0, 1)], "k string, v double, id long")
        with pytest.raises(ValueError):
            robust_outliers(df, key_col="zz", value_col="v", id_col="id")
        with pytest.raises(ValueError):
            robust_outliers(df, key_col="k", value_col="v", id_col="id", k_ppm=-1)
        with pytest.raises(ValueError):
            robust_outliers(df, key_col="k", value_col="v", id_col="id", scale=0)
