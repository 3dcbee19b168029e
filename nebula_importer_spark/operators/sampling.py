"""Deterministic sampling / domain-mixing operators (training-data surface).

A 100-TB training-data pipeline needs REPRODUCIBLE sampling — `rand()` is
out (non-deterministic across retries/re-runs, and a retried task silently
resamples). Both operators here key every keep/drop decision off a
content-derived MD5, so the same input always yields the same sample, on
any cluster layout, and each has an exactly-equivalent ANSI-SQL form for
the DuckDB oracle (MD5 is bit-identical across engines; xxhash is not).

- weighted_domain_sample  per-domain Bernoulli rates as a pure scan-level
                          filter: ZERO shuffles, fully pushable — the plan
                          for "mix 60% en, 20% de, ..." is Scan+Filter.
                          This is the "domain mixing" step of corpus prep.
- stratified_topk_sample  exactly-k-per-stratum by hash order. A window
                          rank over (stratum, md5) — Spark ≥3.5 plans a
                          map-side WindowGroupLimit, so each task forwards
                          only its local top-k per stratum into the single
                          shuffle (the reducer sees ≤ k·tasks rows per
                          stratum, not the stratum's full population).

- token_budget_sample    per-domain "keep until N tokens" cap via a
                          TWO-LEVEL distributed prefix sum (order-
                          preserving MD5 range buckets + broadcast bucket
                          offsets) — exact, but no domain-sized window
                          task (see its docstring).

Scale note (skew): stratified_topk_sample shuffles by stratum — a handful
of mega-strata is fine BECAUSE the group-limit already cut each to
k·tasks rows map-side. weighted_domain_sample has no shuffle at all.
token_budget_sample bounds its longest window task to 1/n_buckets of the
largest domain.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from nebula_importer_spark.operators._buckets import guarded_bucket

HEX_WIDTH = 8  # rate granularity = 1 / 16^8 ≈ 2.3e-10


def hash_threshold(rate: float) -> str:
    """MD5-comparable threshold for a keep-rate in [0, 1]: a row is kept
    iff md5(key) < threshold (lexicographic on the 32-hex string — uniform
    because MD5 digits are uniform). Realized rate = floor(rate·16^8)/16^8."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0,1], got {rate}")
    bucket = int(rate * 16**HEX_WIDTH)
    if bucket >= 16**HEX_WIDTH:
        return "g"  # > every hex digest: keep all
    return format(bucket, f"0{HEX_WIDTH}x") + "0" * (32 - HEX_WIDTH)


def _md5_key(id_col: str | Column, salt: str) -> Column:
    """Deterministic per-row key. NULL-safe: concat(salt, NULL) is NULL, so
    a NULL id would yield a NULL key — which silently FAILS every `key <
    threshold` keep test and every null-unsafe bucket join downstream
    (rows counted into budgets but never kept). NULL ids hash under a
    reserved sentinel instead ('\\0null' cannot collide with any cast
    string — casts never produce NUL bytes)."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.md5(
        F.concat(F.lit(salt), F.coalesce(c.cast("string"), F.lit("\x00null")))
    )


def weighted_domain_sample(
    df: DataFrame,
    domain_col: str,
    id_col: str,
    weights: dict[str, float],
    salt: str = "mix",
) -> DataFrame:
    """Keep each row of domain d with probability weights[d] (deterministic
    in id). Domains absent from ``weights`` are dropped — a mix spec is a
    whitelist. Pure filter: no shuffle, no UDF, pushes to the scan."""
    key = _md5_key(id_col, salt)
    keep = None
    for dom, rate in sorted(weights.items()):
        cond = (F.col(domain_col) == dom) & (key < F.lit(hash_threshold(rate)))
        keep = cond if keep is None else keep | cond
    if keep is None:
        raise ValueError("weights must name at least one domain")
    return df.filter(keep)


def stratified_topk_sample(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    k: int,
    salt: str = "strat",
) -> DataFrame:
    """Exactly min(k, |stratum|) rows per stratum, selected by MD5 order
    (uniform ⇒ a simple random sample per stratum, reproducible). Ties are
    impossible for distinct ids (MD5 over the id), so the sample is unique."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    w = Window.partitionBy(strata_col).orderBy(_md5_key(id_col, salt))
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )


def token_budget_sample(
    df: DataFrame,
    budget: int,
    *,
    domain_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    tokens_col: str | None = None,
    salt: str = "budget",
    n_buckets: int = 64,
) -> DataFrame:
    """Per-domain token-budget cap: keep documents in deterministic MD5(id)
    order until the domain's cumulative token count reaches ``budget``
    (a row is kept iff its INCLUSIVE running sum ≤ budget). This is the
    "sample each domain down to N tokens" step of training-mix prep, exact
    and reproducible (same sample on any cluster layout or retry).

    A naive window cumsum over each domain serializes a whole domain into
    one task — at 100 TB a domain is 10⁹ docs and that task runs for hours.
    Instead, a TWO-LEVEL distributed prefix sum:

    1. Rows land in one of ``n_buckets`` ORDER-PRESERVING key ranges (the
       first 4 hex chars of the MD5 split [0, 16⁴) evenly; hex strings sort
       identically to their values, so (bucket, key) order == key order).
    2. The local cumsum windows over (domain, bucket) — per-task work drops
       ``n_buckets``-fold; raise ``n_buckets`` (any power of two ≤ 65536)
       as domains grow.
    3. Bucket subtotals (|domains|·n_buckets rows — tiny) get their own
       exclusive cumsum and BROADCAST-join back as per-bucket offsets;
       global running sum = bucket offset + local cumsum. Identical to the
       single-window result, but the long pole is 1/n_buckets as tall.

    Output: the input columns plus ``n_tokens`` and ``cum_tokens``
    (the inclusive running sum within the domain, ≤ budget).
    """
    if budget < 0:
        raise ValueError(f"budget must be >= 0, got {budget}")
    if n_buckets < 1 or 65536 % n_buckets != 0:
        raise ValueError(f"n_buckets must divide 65536, got {n_buckets}")
    # Internal scratch names and the output column must not collide with
    # input columns (select("*", alias) would raise AMBIGUOUS_REFERENCE much
    # later, and withColumn would silently destroy the caller's column).
    reserved = {"_key", "_bkt", "_cum_local", "_dom_off", "_bkt_off", "_off",
                "cum_tokens"}
    clash = reserved.intersection(df.columns)
    if clash:
        raise ValueError(f"input columns collide with reserved names: {sorted(clash)}")
    if "n_tokens" in df.columns and tokens_col != "n_tokens":
        raise ValueError(
            "input already has an 'n_tokens' column; pass tokens_col='n_tokens' "
            "to use it, or rename it"
        )
    if tokens_col is None:
        from nebula_importer_spark.operators.text import token_count

        toks = token_count(text_col)
    else:
        # null-safe: a null count must consume 0 budget, not poison the
        # running sum (window SUM skips nulls, so leading nulls would
        # otherwise yield null cum_tokens and silently drop rows)
        toks = F.coalesce(F.col(tokens_col).cast("long"), F.lit(0))
    key = _md5_key(id_col, salt)
    span = 65536 // n_buckets
    base = (
        df.withColumn("n_tokens", toks)  # replaces, never duplicates
        .withColumn("_key", key)
        .withColumn(
            "_bkt",
            (F.conv(F.substring(key, 1, 4), 16, 10).cast("long") / span).cast("long"),
        )
    )
    local_w = (
        Window.partitionBy(domain_col, "_bkt")
        .orderBy("_key", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = base.withColumn("_cum_local", F.sum("n_tokens").over(local_w))
    offsets_w = (
        Window.partitionBy(domain_col)
        .orderBy("_bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        base.groupBy(domain_col, "_bkt")
        .agg(F.sum("n_tokens").alias("_bkt_sum"))
        .select(
            F.col(domain_col).alias("_dom_off"),
            F.col("_bkt").alias("_bkt_off"),
            F.coalesce(F.sum("_bkt_sum").over(offsets_w), F.lit(0)).alias("_off"),
        )
    )
    # NULL-safe join on the domain: groupBy and the window both treat a NULL
    # domain as a real group, so the offsets join must too — a null-unsafe
    # equi-join would silently drop every NULL-domain row (neither kept nor
    # counted), diverging from the oracle's PARTITION BY semantics.
    return (
        local.join(
            F.broadcast(offsets),
            F.col(domain_col).eqNullSafe(F.col("_dom_off"))
            & (F.col("_bkt") == F.col("_bkt_off")),
        )
        .withColumn("cum_tokens", (F.col("_off") + F.col("_cum_local")).cast("long"))
        .filter(F.col("cum_tokens") <= budget)
        .drop("_key", "_bkt", "_cum_local", "_dom_off", "_bkt_off", "_off")
    )


def grouped_split(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    group_col: str | None = None,
    groups: DataFrame | None = None,
    weights: tuple[float, ...] = (0.9, 0.05, 0.05),
    names: tuple[str, ...] = ("train", "val", "test"),
    salt: str = "split",
) -> DataFrame:
    """Leakage-safe train/val/test assignment: the SPLIT KEY is the
    group, not the document, so every member of a duplicate cluster (or
    any other correlation group — same source page, same conversation,
    same near-dup component from ``connected_components``) lands in the
    same split. Splitting independent rows uniformly is how eval
    contamination happens — a near-duplicate of a test document in train
    is an answer key; group-keyed splitting is the standard fix.

    Assignment is a pure expression: ``md5(salt ‖ group)`` compared
    against cumulative-weight hex thresholds (``hash_threshold``
    literals — realized proportions are exact at 1/16⁸ granularity,
    deterministic on any cluster layout or retry, reproducible in any
    engine with md5). With ``group_col`` the whole operator is MAP-ONLY
    (zero shuffles at any scale); with a ``groups`` side table it is one
    equi-join on the id, and ungrouped ids fall back to singleton groups
    of themselves (absent ids must still be split — silently dropping
    them would bias the sample).

    Returns ``(id_col, split_group, split)``.
    """
    if len(weights) != len(names) or len(names) < 2:
        raise ValueError(
            f"weights/names must align with >= 2 entries, got {weights}/{names}"
        )
    if any(w < 0 for w in weights) or abs(sum(weights) - 1.0) > 1e-9:
        raise ValueError(f"weights must be >= 0 and sum to 1, got {weights}")
    if len(set(names)) != len(names):
        raise ValueError(f"split names must be distinct, got {names}")
    if (group_col is None) == (groups is None):
        raise ValueError("pass exactly one of group_col or groups")
    if group_col is not None:
        base = df.select(
            F.col(id_col), F.col(group_col).cast("string").alias("split_group")
        )
    else:
        gcols = [c for c in groups.columns if c != id_col]
        if len(gcols) != 1:
            raise ValueError(
                f"groups must have exactly ({id_col}, <group>) columns, "
                f"got {groups.columns}"
            )
        base = df.select(id_col).join(groups, id_col, "left").select(
            F.col(id_col),
            F.coalesce(
                F.col(gcols[0]).cast("string"), F.col(id_col).cast("string")
            ).alias("split_group"),
        )
    key = _md5_key("split_group", salt)
    cum = 0.0
    expr = F.lit(names[-1])
    cases = []
    for w, nm in zip(weights[:-1], names[:-1]):
        cum += w
        cases.append((hash_threshold(cum), nm))
    for thr, nm in reversed(cases):
        expr = F.when(key < thr, F.lit(nm)).otherwise(expr)
    return base.select(id_col, "split_group", expr.alias("split"))


def score_ntiles(
    df: DataFrame,
    *,
    score_col: str,
    id_col: str,
    n_tiles: int = 10,
    bucket_scale: int = 1000,
    descending: bool = True,
) -> DataFrame:
    """Exact NTILE over a score column WITHOUT a single-partition global
    sort → ``(id_col, tile)`` with SQL NTILE semantics (tile 1 = best
    when `descending`; the first ``n mod n_tiles`` tiles get the extra
    row). The calibration step of quality-score curation: decile labels
    feed stratified inspection, per-decile filtering, and mixing curves.

    The scale move is the two-level global rank (the token_budget /
    kg_negatives machinery applied to score ranking): scores coarsen
    into order-preserving integer range buckets (floor(score ·
    bucket_scale)); within-bucket row_number runs distributed
    (partitionBy bucket); bucket counts cumulative-sum in a tiny
    buckets-only window and broadcast back as exclusive offsets. No
    executor ever sees more than one bucket's rows in one sort — the
    single-partition WindowExec a plain ntile() would plan never
    appears. Ties order by (score, id), total and deterministic; tile =
    ((rank-1)·n_tiles) div n + 1, exactly SQL NTILE's distribution.

    `bucket_scale` trades bucket count against bucket width; any value
    is CORRECT (ranking is exact regardless), it only shifts work
    between the per-bucket sorts and the tiny offsets window.
    """
    if n_tiles < 1:
        raise ValueError(f"n_tiles must be >= 1, got {n_tiles}")
    if bucket_scale < 1:
        raise ValueError(f"bucket_scale must be >= 1, got {bucket_scale}")
    q = F.col(score_col).cast("double")
    s = df.select(
        F.col(id_col).alias("_id"),
        q.alias("_q"),
        F.floor(q * float(bucket_scale)).cast("long").alias("_b"),
    )
    border = F.col("_b").desc() if descending else F.col("_b").asc()
    qorder = [
        F.col("_q").desc() if descending else F.col("_q").asc(),
        F.col("_id").asc(),
    ]
    counts = s.groupBy("_b").agg(F.count("*").alias("_n"))
    offsets = counts.select(
        "_b",
        (
            F.coalesce(
                F.sum("_n").over(
                    Window.orderBy(border).rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            )
        ).alias("_off"),
        F.sum("_n").over(
            Window.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("_total"),
    )
    ranked = s.join(F.broadcast(offsets), "_b").select(
        "_id",
        (
            F.col("_off")
            + F.row_number().over(Window.partitionBy("_b").orderBy(*qorder))
        ).alias("_rank"),
        "_total",
    )
    return ranked.select(
        F.col("_id").alias(id_col),
        (
            F.expr(f"(_rank - 1) * {n_tiles} div _total") + 1
        )
        .cast("int")
        .alias("tile"),
    )


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    salt: str = "ws",
) -> DataFrame:
    """Exact weighted sampling WITHOUT replacement (Efraimidis–Spirakis
    A-ES, deterministic): each row draws a reproducible uniform
    u = (m+1)/2^52 from the first 13 hex digits of md5(salt‖id) — 13·4=52
    bits, so the integer and the quotient are both exact in a double on
    any engine — and the sample is the k rows maximizing u^(1/w),
    compared as ln(u)/w (monotone-equivalent, w > 0).

    Statistically this is probability-proportional-to-size without
    replacement: the first pick lands on row i with probability
    w_i / Σw, and so on among the remainder — the standard single-pass
    weighted reservoir order, here rendered as a distributed top-k.

    Scale: plans as TakeOrderedAndProject — each partition keeps its local
    top-k, the driver merges k·n_partitions CANDIDATE KEYS, never the
    table; no shuffle, no global sort. Rows with NULL or non-positive
    weight are excluded (a zero-weight row can never be drawn; a negative
    weight has no sampling meaning — fail-soft by exclusion, matching the
    filter-not-error convention of weighted_domain_sample).

    Cross-engine note: ln is the one non-arithmetic op; engines may differ
    in the last ulp, which can only reorder two rows whose keys coincide
    to ~1e-15 relative — with 52-bit uniforms the probability of a
    cross-engine flip inside the top-k boundary is negligible, and the
    float key is never projected (output is ``(id, weight)`` only).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    u = (
        F.conv(F.substring(_md5_key(id_col, salt), 1, 13), 16, 10).cast("long")
        + F.lit(1)
    ).cast("double") / F.lit(float(1 << 52))
    w = F.col(weight_col).cast("double")
    key = F.log(u) / w
    return (
        df.filter(w.isNotNull() & (w > 0))
        .select(F.col(id_col), F.col(weight_col), key.alias("_es_key"))
        .orderBy(F.desc("_es_key"))
        .limit(k)
        .drop("_es_key")
    )


def apportion_budget(
    weights: DataFrame,
    *,
    budget: int,
    key_col: str = "key",
    weight_col: str = "weight",
) -> DataFrame:
    """Largest-remainder (Hamilton) apportionment: split an integer
    ``budget`` across strata exactly proportional to non-negative
    integer ``weights`` — the allocation step BEFORE token_budget_sample
    / stratified_topk_sample when a corpus plan says "N tokens total,
    proportional to domain sizes" (seats-in-parliament math applied to
    token budgets; floats drift, quotas don't).

    Rule: each stratum gets ``floor(budget·w_i / W)``; the leftover
    ``budget − Σ floors`` seats go one each to the largest remainders
    ``budget·w_i mod W``, ties broken by key ASC — a UNIQUE, exact,
    engine-stable allocation with ``Σ alloc == budget`` whenever
    ``W > 0`` (the quota property: every allocation is the floor or
    ceiling of its exact proportional share). Zero-weight strata get 0;
    ``W == 0`` allocates all zeros (visible, not an error). NULL keys/
    weights are rejected loudly — an allocation row without identity or
    mass is an upstream bug.

    Distributed shape: the weight table is strata-sized metadata (one
    row per domain/source — ≤10⁴ even at 100 TB); one 1-row total
    broadcast, one rank window over the remainder order. Returns
    ``(key, weight, alloc)``.
    """
    for c in (key_col, weight_col):
        if c not in weights.columns:
            raise ValueError(
                f"column {c!r} not in input: {weights.columns}"
            )
    if budget < 0:
        raise ValueError(f"budget must be >= 0, got {budget}")
    base = weights.select(
        F.col(key_col).alias("key"),
        F.col(weight_col).cast("long").alias("weight"),
    )
    bad = base.filter(
        F.col("key").isNull()
        | F.col("weight").isNull()
        | (F.col("weight") < 0)
    ).limit(1)
    if bad.take(1):
        raise ValueError(
            "weights must have non-null keys and weights >= 0"
        )
    d38 = "decimal(38,0)"
    tot = base.agg(F.sum(F.col("weight").cast(d38)).alias("_w"))
    quota = base.crossJoin(F.broadcast(tot)).select(
        "key",
        "weight",
        F.when(
            F.col("_w") > 0,
            F.expr(f"(CAST({budget} AS {d38}) * weight) div _w"),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("_fl"),
        F.when(
            F.col("_w") > 0,
            F.expr(f"(CAST({budget} AS {d38}) * weight) % _w"),
        )
        .otherwise(F.lit(0))
        .cast(d38)
        .alias("_rem"),
        F.col("_w"),
    )
    leftover = quota.agg(
        F.when(
            F.max("_w") > 0,
            F.lit(budget) - F.coalesce(F.sum("_fl"), F.lit(0)),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("_k")
    )
    w = Window.orderBy(F.desc("_rem"), F.asc("key"))
    return (
        quota.crossJoin(F.broadcast(leftover))
        .withColumn("_rk", F.row_number().over(w))
        .select(
            "key",
            "weight",
            (
                F.col("_fl")
                + F.when(F.col("_rk") <= F.col("_k"), 1).otherwise(0)
            )
            .cast("long")
            .alias("alloc"),
        )
    )


def temperature_sample(
    df: DataFrame,
    *,
    domain_col: str,
    id_col: str,
    budget: int,
    alpha_half: bool = True,
    salt: str = "temp",
) -> DataFrame:
    """Temperature-scaled domain mixing (the multilingual-LM sampling
    rule, e.g. mBERT/XLM-R's p ∝ n^α): allocate an integer row
    ``budget`` across domains proportional to ``n_d^α`` and draw that
    many rows per domain deterministically — α = 1/2 (``alpha_half``,
    the common T=2 flattening that up-weights tail domains without
    letting a mega-domain drown them) or α = 1 (proportional, the
    degenerate case, for A/B-ing the flattening itself).

    Pure composition of proven pieces, each exactness-bearing: domain
    weights are ``isqrt(n_d)`` — EXACT integer square root (float sqrt
    floored, then two-sided ±1 correction; the correction is the
    engine-stability device, double sqrt alone rounds differently at
    2⁵²-scale inputs) — allocation is Hamilton largest-remainder
    (``apportion_budget``: unique, Σ = budget, quota property), and the
    per-domain draw is the md5-rank top-alloc (``stratified_topk``'s
    machinery with a VARIABLE per-stratum k via one broadcast join).
    NULL domains/ids are dropped (stated). A domain's allocation is
    capped by its size implicitly (rank filter) — under-full domains
    leave the total below budget (visible via counts, not silently
    reassigned; stated).

    Returns the sampled rows (original columns) — deterministic,
    reproducible, engine-checkable.
    """
    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    for c in (domain_col, id_col):
        if c not in df.columns:
            raise ValueError(f"column {c!r} not in input: {df.columns}")
    base = df.filter(
        F.col(domain_col).isNotNull() & F.col(id_col).isNotNull()
    )
    counts = base.groupBy(F.col(domain_col).alias("key")).agg(
        F.count(F.lit(1)).cast("long").alias("_n")
    )
    if alpha_half:
        s0 = "CAST(FLOOR(SQRT(CAST(_n AS DOUBLE))) AS BIGINT)"
        isq = (
            f"CASE WHEN ({s0} + 1) * ({s0} + 1) <= _n THEN {s0} + 1 "
            f"WHEN {s0} * {s0} > _n THEN {s0} - 1 ELSE {s0} END"
        )
        weights = counts.select("key", F.expr(isq).alias("weight"))
    else:
        weights = counts.select("key", F.col("_n").alias("weight"))
    alloc = apportion_budget(
        weights, budget=budget, key_col="key", weight_col="weight"
    ).select(F.col("key").alias(domain_col), "alloc")
    w = Window.partitionBy(domain_col).orderBy(_md5_key(id_col, salt))
    return (
        base.withColumn("_rk", F.row_number().over(w))
        .join(F.broadcast(alloc), domain_col)
        .filter(F.col("_rk") <= F.col("alloc"))
        .drop("_rk", "alloc")
    )


def systematic_sample(
    df: DataFrame,
    k: int,
    *,
    id_col: str = "doc_id",
    weight_col: str = "n_tokens",
    salt: str = "sys",
    n_buckets: int = 64,
) -> DataFrame:
    """Deterministic systematic PPS sampling WITH replacement — draw
    exactly ``k`` picks where each row's expected multiplicity is
    proportional to its weight (the materialization step after DSIR/
    importance weighting: ``dsir_weights`` says HOW MUCH each document
    matters, this emits the resampled multiset). Classic systematic
    sampling: lay rows on the cumulative-weight line in md5(id) order
    (the deterministic stand-in for a random shuffle) and probe at the
    ``k`` midpoints ``(2i+1)·W div 2k``; a row is picked once per probe
    inside its weight interval, so ``Σ n_picks = k`` EXACTLY and no row
    can be picked more than ``⌈w·k/W⌉`` times — the variance-free
    sampler, fully reproducible on any engine or layout.

    The per-row pick count is CLOSED-FORM (no probe join): with
    exclusive prefix ``C`` and interval ``[C, C+w)``, picks are the
    integers ``i`` with ``2k·C ≤ (2i+1)·W < 2k·(C+w)`` — two exact
    integer ceilings per row. Prefixes come from the token_budget
    two-level order-preserving bucket machinery (no single-window
    serialization); the weight total is a 1-row broadcast. An overflow
    guard rejects ``2k·W`` beyond int64 loudly; negative weights raise
    (the exact_weighted_quantiles rule).

    Returns rows with ``n_picks ≥ 1``: ``(id_col, weight_col,
    n_picks)``.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if n_buckets < 1 or 65536 % n_buckets != 0:
        raise ValueError(f"n_buckets must divide 65536, got {n_buckets}")
    for c in (id_col, weight_col):
        if c not in df.columns:
            raise ValueError(f"column {c!r} not in input: {df.columns}")

    w = F.coalesce(F.col(weight_col).cast("long"), F.lit(0))
    rows = df.select(
        F.col(id_col).alias("_id"),
        F.when(w >= 0, w)
        .otherwise(
            F.raise_error(
                F.lit("systematic_sample: negative weight encountered")
            ).cast("long")
        )
        .alias("_w"),
    ).filter(F.col("_id").isNotNull())
    span = 65536 // n_buckets
    key = _md5_key("_id", salt)
    base = rows.withColumn("_key", key).withColumn(
        "_bkt",
        F.conv(F.substring("_key", 1, 4), 16, 10).cast("long") / span,
    ).withColumn("_bkt", F.col("_bkt").cast("long"))
    wloc = (
        Window.partitionBy("_bkt")
        .orderBy("_key", "_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = base.withColumn(
        "_cl", F.coalesce(F.sum("_w").over(wloc), F.lit(0).cast("long"))
    )
    btot = base.groupBy("_bkt").agg(F.sum("_w").alias("_bt"))
    woff = Window.orderBy("_bkt").rowsBetween(Window.unboundedPreceding, -1)
    offs = btot.select(
        "_bkt",
        F.coalesce(F.sum("_bt").over(woff), F.lit(0).cast("long")).alias(
            "_off"
        ),
    )
    tot = rows.agg(F.sum("_w").cast("long").alias("_tw"))
    # the ceiling numerators reach (2k+2)·W − 1, so the guard needs the
    # extra +2 margin, not just 2k
    lim = (2**63 - 1) // (2 * k + 2)
    kk = int(k)
    picked = (
        local.join(F.broadcast(offs), "_bkt")
        .join(F.broadcast(tot))
        .withColumn(
            "_tw",
            F.when(
                F.col("_tw") <= F.lit(0),
                # all-zero weights would make the 2*_tw divisor NULL the
                # interval math and silently return an EMPTY frame,
                # violating the "Σ n_picks = k EXACTLY" contract
                F.raise_error(
                    F.lit(
                        "systematic_sample: total weight is 0 — every "
                        "row has zero weight, no PPS sample exists"
                    )
                ).cast("long"),
            )
            .when(F.col("_tw") <= F.lit(lim), F.col("_tw"))
            .otherwise(
                F.raise_error(
                    F.lit(
                        "systematic_sample: 2k*W exceeds int64 — lower k "
                        "or rescale weights"
                    )
                ).cast("long")
            ),
        )
        .withColumn("_cp", F.col("_cl") + F.col("_off"))
        .withColumn("_ce", F.col("_cp") + F.col("_w"))
        .withColumn(
            "_imin",
            F.expr(
                f"CASE WHEN 2 * {kk} * _cp <= _tw THEN 0L"
                f" ELSE div(2 * {kk} * _cp - _tw + 2 * _tw - 1, 2 * _tw)"
                f" END"
            ),
        )
        .withColumn(
            "_imax",
            F.expr(
                f"CASE WHEN 2 * {kk} * _ce <= _tw THEN -1L"
                f" ELSE div(2 * {kk} * _ce - _tw + 2 * _tw - 1, 2 * _tw)"
                f" - 1 END"
            ),
        )
        .withColumn(
            "n_picks",
            F.greatest(
                F.lit(0).cast("long"),
                (
                    F.least(F.col("_imax"), F.lit(kk - 1))
                    - F.col("_imin")
                    + 1
                ).cast("long"),
            ),
        )
    )
    return picked.filter(F.col("n_picks") >= 1).select(
        F.col("_id").alias(id_col),
        F.col("_w").alias(weight_col),
        "n_picks",
    )


def temporal_split(
    df: DataFrame,
    *,
    id_col: str = "event_id",
    ts_col: str = "ts",
    test_ppm: int = 200_000,
    embargo_sec: int = 0,
    n_buckets: int = 64,
) -> DataFrame:
    """Leakage-safe TEMPORAL train/test split with an embargo gap — the
    time-series complement of :func:`grouped_split`: the newest
    ``test_ppm`` fraction of rows (by event time) becomes the test set,
    and rows within ``embargo_sec`` BEFORE the cut are quarantined
    (labelled ``embargo``, visible, used by neither side) so
    slow-decaying features computed on train rows cannot leak across
    the boundary (the standard walk-forward / purged-split rule).

    Pinned contract: the cut is the epoch-second value at exact global
    rank ``N − floor(N·test_ppm/10⁶)`` over the (multiset of) event
    times — an element pick via the order-preserving two-level bucket
    machinery over DISTINCT epochs (no global sort); rows with
    ``epoch > cut`` are ``test``; ``epoch ≤ cut − embargo_sec`` are
    ``train``; the rest are ``embargo``. Ties at the cut land on the
    train side of the boundary — deterministic, engine-identical.

    Returns ``(id_col, ts_col, epoch, split, cut_epoch)``; NULL
    id/ts rows are excluded.
    """
    if not 0 < test_ppm < 10**6:
        raise ValueError(f"test_ppm must be in (0, 1e6), got {test_ppm}")
    if embargo_sec < 0:
        raise ValueError(f"embargo_sec must be >= 0, got {embargo_sec}")
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    for c in (id_col, ts_col):
        if c not in df.columns:
            raise ValueError(f"column {c!r} not in input: {df.columns}")

    rows = df.select(
        F.col(id_col).alias("_id"),
        F.col(ts_col).alias("_ts"),
        F.unix_timestamp(F.col(ts_col)).cast("long").alias("_e"),
    ).filter(F.col("_id").isNotNull() & F.col("_e").isNotNull())

    per_e = rows.groupBy("_e").agg(F.count(F.lit(1)).alias("_n"))
    stats = per_e.agg(
        F.min("_e").alias("_mn"),
        F.max("_e").alias("_mx"),
        F.sum("_n").alias("_nt"),
    )
    pb = per_e.crossJoin(F.broadcast(stats)).withColumn(
        "_b", guarded_bucket("_e - _mn", n_buckets, op="temporal_split")
    )
    wl = Window.partitionBy("_b").orderBy("_e").rowsBetween(
        Window.unboundedPreceding, -1
    )
    loc = pb.withColumn("_bl", F.coalesce(F.sum("_n").over(wl), F.lit(0)))
    tot = pb.groupBy("_b").agg(F.sum("_n").alias("_bt"))
    wo = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
    offs = tot.select(
        "_b", F.coalesce(F.sum("_bt").over(wo), F.lit(0)).alias("_off")
    )
    # cut = the distinct epoch whose rank interval contains cut_rank
    cut = (
        loc.join(F.broadcast(offs), "_b")
        .withColumn(
            "_cut_rank", F.expr(f"_nt - div(_nt * {int(test_ppm)}, 1000000)")
        )
        .filter(
            (F.col("_bl") + F.col("_off") + 1 <= F.col("_cut_rank"))
            & (F.col("_cut_rank") <= F.col("_bl") + F.col("_off") + F.col("_n"))
        )
        .select(F.col("_e").alias("cut_epoch"))
    )
    emb = int(embargo_sec)
    return rows.join(F.broadcast(cut)).select(
        F.col("_id").alias(id_col),
        F.col("_ts").alias(ts_col),
        F.col("_e").alias("epoch"),
        F.when(F.col("_e") > F.col("cut_epoch"), F.lit("test"))
        .when(F.col("_e") <= F.col("cut_epoch") - emb, F.lit("train"))
        .otherwise(F.lit("embargo"))
        .alias("split"),
        "cut_epoch",
    )
