"""Randomized parity for the filter DSL and connected components, each
against an independent Python model (single Spark job per property)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from nebula_importer_spark.functions.filter_dsl import translate_filter
from nebula_importer_spark.operators.connected_components import connected_components

WIDTH = 3
LITS = ["0", "1", "a", "b", "male", "", "z9"]


def _gen_expr(rng: random.Random, depth: int = 0) -> str:
    if depth < 2 and rng.random() < 0.5:
        op = rng.choice(["&&", "||", "and", "or"])
        return f"({_gen_expr(rng, depth + 1)} {op} {_gen_expr(rng, depth + 1)})"
    if rng.random() < 0.15:
        return f"!({_gen_expr(rng, depth + 1)})"
    i = rng.randrange(WIDTH)
    cmp = rng.choice(["==", "!=", "<", ">", "<=", ">="])
    lit = rng.choice(LITS)
    return f'Record[{i}] {cmp} "{lit}"'


def _py_eval(expr: str, record: list[str]) -> bool:
    py = expr.replace("&&", " and ").replace("||", " or ")
    py = py.replace("!(", " not (")
    import re

    py = re.sub(r"Record\[(\d+)\]", lambda m: repr(record[int(m.group(1))]), py)
    py = re.sub(r"(?<![=!<>])==(?!=)", "==", py)
    return bool(eval(py))  # noqa: S307 — test-only, generated input


def test_filter_dsl_random_parity(spark):
    rng = random.Random(99)
    cases = []
    for _ in range(120):
        expr = _gen_expr(rng)
        record = [rng.choice(LITS) for _ in range(WIDTH)]
        cases.append((expr, record))
    df = spark.createDataFrame(
        [tuple(rec) for _, rec in cases],
        ", ".join(f"_c{i} string" for i in range(WIDTH)),
    ).coalesce(1).withColumn("_row", F.monotonically_increasing_id())
    cols = [f"_c{i}" for i in range(WIDTH)]
    exprs = [
        F.expr(translate_filter(expr, cols)).alias(f"e{i}")
        for i, (expr, _) in enumerate(cases)
    ]
    got = df.select("_row", *exprs).orderBy("_row").collect()
    for i, (expr, record) in enumerate(cases):
        want = _py_eval(expr, record)
        assert bool(got[i][f"e{i}"]) == want, (expr, record)


def test_connected_components_random_graph_vs_union_find(spark):
    rng = random.Random(7)
    n_nodes, n_edges = 2000, 2600
    edges = [
        (f"n{rng.randrange(n_nodes):05d}", f"n{rng.randrange(n_nodes):05d}")
        for _ in range(n_edges)
    ]
    # independent model: union-find with min-root
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    want = {x: find(x) for x in parent}

    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r["node"]: r["component"] for r in connected_components(df).collect()}
    assert got == want
