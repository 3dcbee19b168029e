"""Similarity search over embedding columns (array<float>).

- brute_force_topk: exact cosine top-k of every query against the corpus.
  Queries are dimension-sized → broadcast; the corpus is scanned ONCE
  (queries × corpus via broadcast nested-loop join, ranked per query).
  This is the correctness baseline and the oracle shape.
- lsh_topk: random-hyperplane bucket prefilter (the scale path): only
  candidates agreeing with the query on ≥1 band of sign bits are scored.
  Hyperplanes are seeded plan constants → deterministic, resumable.

All arithmetic is JVM expressions (zip_with/aggregate in double precision,
summed left-to-right — bit-reproducible against a sequential oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)


def l2norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda s, x: s + x * x))


def cosine(a, b):
    return dot(a, b) / (l2norm(a) * l2norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """(query_id, neighbor_id, rank, cosine) — exact top-k per query.
    Deterministic tie-break on neighbor id. Self-matches (same id) excluded
    when id columns share a domain."""
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("_cv")
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"), _as_double(F.col(query_vec_col)).alias("_qv")
    )
    scored = (
        c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("_qv"), F.col("_cv")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )


def _sign_bucket(vec_col, planes) -> "F.Column":
    bucket = None
    for p, row in enumerate(planes):
        w = F.array(*[F.lit(float(v)) for v in row])
        bit = F.when(dot(vec_col, w) >= 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        term = F.shiftleft(bit, p)
        bucket = term if bucket is None else bucket.bitwiseXOR(term)
    return bucket


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    n_planes: int = 12,
    n_bands: int = 3,
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """Approximate top-k: hyperplane sign bits split into bands; candidates
    share ≥1 band with the query. Recall rises with n_bands (multi-probe).
    Same output schema as brute_force_topk.

    ``dim`` (vector width) should be passed explicitly at scale; when None
    it is probed from one corpus row (an empty corpus yields an empty
    result instead of a driver crash)."""
    import numpy as np

    if dim is None:
        head = corpus.select(vec_col).head(1)
        if not head:
            return brute_force_topk(
                corpus, queries, k, id_col, vec_col, query_id_col, query_vec_col
            ).limit(0)
        dim = len(head[0][0])
    rng = np.random.RandomState(seed)
    planes = rng.standard_normal((n_planes, dim))
    per_band = n_planes // n_bands

    def bands_of(vec):
        full = _sign_bucket(vec, planes)
        return F.array(
            *[
                F.shiftright(full, b * per_band).bitwiseAND(F.lit((1 << per_band) - 1))
                for b in range(n_bands)
            ]
        )

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        _as_double(F.col(vec_col)).alias("_cv"),
    ).select(
        "neighbor_id", "_cv", F.posexplode(bands_of(F.col("_cv"))).alias("_b", "_bk")
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        _as_double(F.col(query_vec_col)).alias("_qv"),
    ).select("query_id", "_qv", F.posexplode(bands_of(F.col("_qv"))).alias("_b", "_bk"))
    cand = (
        c.join(F.broadcast(q), ["_b", "_bk"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", "_qv", "_cv")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        cand.select(
            "query_id", "neighbor_id", cosine(F.col("_qv"), F.col("_cv")).alias("cosine")
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )
