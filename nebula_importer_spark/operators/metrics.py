"""Exact distributed model-evaluation metrics.

A corpus pipeline that trains quality classifiers, rerankers, and
filters (the lm_perplexity / quality_score / bm25 surfaces here) needs
to EVALUATE them at data scale — and the standard tools either sample
(sklearn on a driver-side sample) or approximate (histogram AUC). At
100 TB the scored table doesn't fit a driver, and a global sort by
score is exactly the shuffle you don't want. This module computes the
exact tie-aware Mann-Whitney AUC with NO global sort: scores fall into
order-preserving equal-width buckets (broadcast 1-row min/max), prefix
sums run per bucket, and the bucket-level totals — one row per bucket —
take an exclusive prefix sum that broadcasts back as offsets (the
token_budget_sample / negative_samples two-level machinery applied to
rank statistics).

Exactness contract: scores must be INTEGRAL (quantize floats
caller-side — the layout.zorder_key / profile.column_histogram rule;
for a float score, a fixed-point ``cast(round(score·1e6) as long)``
preserves the AUC because ranks only need order). All rank arithmetic
is integer: tied groups contribute ``2·midrank`` terms so nothing is
ever halved, and the final AUC is one integer floor division at 1e12
scale — bit-identical on any engine, partitioning, or accumulation
order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from nebula_importer_spark.operators._buckets import guarded_bucket

#: AUC is returned as an integer in millionths of a millionth (1e12).
AUC_SCALE = 10**12


def exact_auc(
    df: DataFrame,
    *,
    score_col: str = "score",
    label_col: str = "label",
    n_buckets: int = 64,
) -> DataFrame:
    """Exact tie-aware ROC AUC of integral ``score_col`` against binary
    ``label_col`` (1 = positive, 0 = negative), computed as the
    Mann-Whitney U statistic with midranks:

        U = Σ_positives rank(score) − n_pos·(n_pos+1)/2
        AUC = U / (n_pos · n_neg)

    Tied scores take the average rank of their run; kept exact by
    working in DOUBLED ranks (``rank2 = 2·below + tied + 1`` per member
    of a tied group, an odd integer — never a .5).

    Distributed shape (no global sort, no driver collect):

    1. ONE partial-aggregable groupBy collapses the table to one row per
       DISTINCT score — ``(score, n, n_pos)``. This is the only
       data-sized shuffle, and it shuffles longs.
    2. Scores bucket by exact equal-width long math (broadcast 1-row
       min/max, same floor-div rule as profile.column_histogram) —
       buckets are ORDER-PRESERVING, so a per-bucket window prefix sum
       plus an exclusive prefix over the ≤ n_buckets bucket totals
       (driver-free: a broadcast self-join) yields every score's exact
       global ``below`` count.
    3. One final 1-row aggregation assembles U and the floor-divided
       ``auc_scaled`` (1e12 scale).

    Rows with NULL score or label are excluded and counted in the
    output. Returns one row:
    ``(n_pos, n_neg, n_scores, n_null, auc_scaled)``.
    Degenerate inputs (no positives or no negatives) return NULL
    ``auc_scaled`` — visible, not a fake 0.5.
    """
    for c in (score_col, label_col):
        if c not in df.columns:
            raise ValueError(f"column {c!r} not in input: {df.columns}")
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    by_name = {f.name: f.dataType for f in df.schema.fields}
    integral = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
    if not isinstance(by_name[score_col], integral):
        raise ValueError(
            f"exact_auc needs an integral score (quantize floats "
            f"caller-side): {score_col} is {by_name[score_col]}"
        )

    s = F.col(score_col)
    lbl = F.col(label_col)
    valid = df.filter(s.isNotNull() & lbl.isNotNull())
    # 1-row side aggregate, broadcast back — no separate driver action
    nulls = df.agg(
        F.sum(F.when(s.isNull() | lbl.isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_null")
    )

    # 1. one row per distinct score
    per_score = valid.groupBy(s.cast("long").alias("_s")).agg(
        F.count(F.lit(1)).cast("long").alias("_n"),
        F.sum(lbl.cast("long")).cast("long").alias("_np"),
    )

    # 2. order-preserving equal-width buckets + two-level prefix sum
    stats = per_score.agg(
        F.min("_s").alias("_mn"), F.max("_s").alias("_mx")
    )
    bucketed = per_score.crossJoin(F.broadcast(stats)).withColumn(
        "_b", guarded_bucket("_s - _mn", n_buckets, op="exact_auc")
    )
    w = (
        Window.partitionBy("_b")
        .orderBy("_s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = bucketed.withColumn(
        "_below_local", F.coalesce(F.sum("_n").over(w), F.lit(0).cast("long"))
    )
    totals = bucketed.groupBy("_b").agg(F.sum("_n").alias("_bt"))
    wb = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "_b", F.coalesce(F.sum("_bt").over(wb), F.lit(0).cast("long")).alias("_off")
    )
    ranked = local.join(F.broadcast(offsets), "_b").withColumn(
        "_below", F.col("_below_local") + F.col("_off")
    )

    # 3. positives in a tied run each carry rank2 = 2·below + n + 1
    out = ranked.agg(
        F.coalesce(F.sum("_np"), F.lit(0)).cast("long").alias("n_pos"),
        F.coalesce(F.sum("_n") - F.sum("_np"), F.lit(0))
        .cast("long")
        .alias("n_neg"),
        F.count(F.lit(1)).cast("long").alias("n_scores"),
        F.coalesce(
            F.sum(
                F.col("_np")
                * (F.lit(2) * F.col("_below") + F.col("_n") + F.lit(1))
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("_r2"),
    )
    # 2U = Σ rank2 − 2·n_pos(n_pos+1)/2 = _r2 − n_pos·(n_pos+1)
    return out.crossJoin(F.broadcast(nulls)).select(
        "n_pos",
        "n_neg",
        "n_scores",
        F.coalesce(F.col("n_null"), F.lit(0)).cast("long").alias("n_null"),
        # DECIMAL(38,0) intermediates: 1e12·U2 wraps int64 past ~10M rows;
        # decimal `div` is exact floor and lands back in a BIGINT, the
        # HUGEINT-`//` twin on the DuckDB side.
        F.when(
            (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
            F.expr(
                f"(CAST({AUC_SCALE} AS DECIMAL(38,0))"
                f" * (_r2 - n_pos * (n_pos + 1)))"
                f" div CAST(2 * n_pos * n_neg AS DECIMAL(38,0))"
            ),
        )
        .cast("long")
        .alias("auc_scaled"),
    )


#: B-cubed ratios are returned as integers in 1e12ths.
B3_SCALE = 10**12


def b_cubed(
    df: DataFrame,
    *,
    item_col: str = "item",
    cluster_col: str = "cluster",
    gold_col: str = "gold",
) -> DataFrame:
    """B-cubed precision/recall/F1 (Bagga & Baldwin 1998) of a clustering
    against a gold partition — the standard entity-resolution /
    coreference clustering score, here grading dedup components,
    label-prop communities, or canonicalization maps at data scale.

    Per-item definition: precision(i) = |C(i) ∩ G(i)| / |C(i)| averaged
    over items (recall symmetric with G). Grouping items by their
    (cluster, gold) cell collapses this to cell counts:

        P = (1/N) Σ_cells n_cg² / n_c      R = (1/N) Σ_cells n_cg² / n_g

    Distributed shape: ONE (cluster, gold) aggregation plus two
    single-column re-aggregations for the cluster/gold sizes — all
    partial-aggregable; the final assembly is a ≤ cells-sized join and a
    1-row agg. No windows, no sort, no driver collect.

    Exactness contract: each cell's term is floored AT B3_SCALE
    (``(1e12·n_cg²) div n_c``) before summing — term-wise flooring makes
    the sum order-free and engine-identical; the bias is < n_cells/1e12,
    below any decision threshold a release gate would use (the same
    trade the repo's ppm/scaled-ratio operators make). F1 assembles from
    the scaled P and R in DECIMAL(38,0) ``div``.

    NULL cluster or gold ids are excluded and counted (``n_null``) — an
    unassigned item is a pipeline bug to surface, not an implicit
    singleton. Returns one row:
    ``(n_items, n_null, n_clusters, n_gold, precision_s, recall_s, f1_s)``.
    """
    for c in (item_col, cluster_col, gold_col):
        if c not in df.columns:
            raise ValueError(f"column {c!r} not in input: {df.columns}")
    cl, gl = F.col(cluster_col), F.col(gold_col)
    valid = df.filter(cl.isNotNull() & gl.isNotNull()).select(
        F.col(item_col).alias("_i"), cl.alias("_c"), gl.alias("_g")
    )
    nulls = df.agg(
        F.sum(F.when(cl.isNull() | gl.isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_null")
    )
    cells = valid.groupBy("_c", "_g").agg(
        F.count(F.lit(1)).cast("long").alias("_n")
    )
    csz = cells.groupBy("_c").agg(F.sum("_n").alias("_nc"))
    gsz = cells.groupBy("_g").agg(F.sum("_n").alias("_ng"))
    # per-term work in DECIMAL(38,0): 1e12·n² wraps int64 for cells past
    # ~3M rows, and the SUM of terms is ≤ 1e12·N — decimal keeps both
    # exact; `div` on decimals is exact floor (the exact_auc discipline)
    terms = cells.join(csz, "_c").join(gsz, "_g").select(
        "_n",
        F.expr(
            f"(CAST({B3_SCALE} AS DECIMAL(38,0)) * _n * _n)"
            f" div CAST(_nc AS DECIMAL(38,0))"
        ).cast("decimal(38,0)").alias("_tp"),
        F.expr(
            f"(CAST({B3_SCALE} AS DECIMAL(38,0)) * _n * _n)"
            f" div CAST(_ng AS DECIMAL(38,0))"
        ).cast("decimal(38,0)").alias("_tr"),
    )
    agg = terms.agg(
        F.coalesce(F.sum("_n"), F.lit(0)).cast("long").alias("n_items"),
        F.coalesce(F.sum("_tp"), F.lit(0).cast("decimal(38,0)")).alias("_sp"),
        F.coalesce(F.sum("_tr"), F.lit(0).cast("decimal(38,0)")).alias("_sr"),
    )
    counts = valid.agg(
        F.count_distinct("_c").cast("long").alias("n_clusters"),
        F.count_distinct("_g").cast("long").alias("n_gold"),
    )
    out = agg.crossJoin(F.broadcast(counts)).crossJoin(F.broadcast(nulls))
    pdiv = "(_sp div CAST(n_items AS DECIMAL(38,0)))"
    rdiv = "(_sr div CAST(n_items AS DECIMAL(38,0)))"
    return out.select(
        "n_items",
        F.coalesce(F.col("n_null"), F.lit(0)).cast("long").alias("n_null"),
        "n_clusters",
        "n_gold",
        F.when(F.col("n_items") > 0, F.expr(pdiv))
        .cast("long")
        .alias("precision_s"),
        F.when(F.col("n_items") > 0, F.expr(rdiv))
        .cast("long")
        .alias("recall_s"),
        F.when(
            (F.col("n_items") > 0)
            & (F.expr(pdiv) + F.expr(rdiv) > 0),
            F.expr(
                f"(CAST(2 AS DECIMAL(38,0)) * {pdiv} * {rdiv})"
                f" div CAST({pdiv} + {rdiv} AS DECIMAL(38,0))"
            ),
        )
        .cast("long")
        .alias("f1_s"),
    )


#: Retrieval ratios (precision/recall/nDCG) are integers in millionths.
RET_SCALE = 10**6


def ndcg_discounts(k: int) -> list[int]:
    """The binary-relevance DCG discount table in RET_SCALE millionths:
    ``disc[i] = round(1e6 / log2(i + 2))`` for rank ``i+1``. Computed ONCE
    driver-side and embedded as plan literals in both engines (the
    seeded-hyperplane discipline of similarity.lsh_topk), so the float
    log never runs inside either engine and the metric is hash-stable."""
    import math

    return [round(RET_SCALE / math.log2(i + 2)) for i in range(k)]


def retrieval_metrics(
    ranked: DataFrame,
    truth: DataFrame,
    *,
    k: int,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Per-query retrieval evaluation — precision@k, recall@k and nDCG@k
    (binary relevance, Järvelin & Kekäläinen 2002) of any ranked
    retriever output against a relevant-pair truth table. The grading
    step for every retrieval stage in this repo (brute-force / LSH /
    IVF / PQ / int8 ANN, BM25, hybrid fusion): recall@k is THE metric a
    candidate-generation stage is sized by at 100 TB.

    Inputs: ``ranked`` = (query, doc, rank) with rank starting at 1
    (rows past ``k`` are ignored defensively); ``truth`` = (query, doc)
    relevant pairs, deduplicated here. The evaluation universe is
    ``ranked``'s query set — a query with no truth pairs gets NULL
    recall/nDCG (undefined, never a fake 0; the exact_auc discipline),
    while precision@k divides by the CONTRACTED k (standard P@k — a
    retriever that returns fewer than k rows is penalized, not excused).

    Exactness: hit indicators are integers; DCG sums the plan-literal
    ``ndcg_discounts`` table (ints ≤ 1e6, so dcg ≤ k·1e6 — nowhere near
    int64); ideal DCG is an element-pick from the literal prefix-sum
    table at min(n_relevant, k); all three ratios are exact integer
    floor divisions. No float enters the metric, so the output hashes
    identically on any engine given the same ranking.

    Distributed shape: one dedup exchange on the fixed-width truth pair
    key, one equi-join marking hits, ONE query-keyed partial agg, a
    truth-side per-query count and a final query-keyed join — all
    partial-aggregable, no windows, no sort, no collect.

    Returns ``(query, n_retrieved, n_relevant, n_hits, precision_ppm,
    recall_ppm, ndcg_ppm)`` — one row per query in ``ranked``.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    for c in (query_col, doc_col, rank_col):
        if c not in ranked.columns:
            raise ValueError(f"column {c!r} not in ranked: {ranked.columns}")
    for c in (query_col, doc_col):
        if c not in truth.columns:
            raise ValueError(f"column {c!r} not in truth: {truth.columns}")

    disc = ndcg_discounts(k)
    prefix = [0]
    for d in disc:
        prefix.append(prefix[-1] + d)
    disc_arr = F.array(*[F.lit(d).cast("long") for d in disc])
    prefix_arr = F.array(*[F.lit(p).cast("long") for p in prefix])

    tq, td = F.col(query_col), F.col(doc_col)
    truth_d = (
        truth.filter(tq.isNotNull() & td.isNotNull())
        .select(query_col, doc_col)
        .distinct()
    )
    rel_counts = truth_d.groupBy(query_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_relevant")
    )
    marked = (
        ranked.filter(F.col(rank_col) <= k)
        .join(
            truth_d.withColumn("_rel", F.lit(1)),
            [query_col, doc_col],
            "left",
        )
        .select(
            query_col,
            F.coalesce(F.col("_rel"), F.lit(0)).alias("_rel"),
            F.element_at(disc_arr, F.col(rank_col).cast("int")).alias("_d"),
        )
    )
    per_q = marked.groupBy(query_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_retrieved"),
        F.sum("_rel").cast("long").alias("n_hits"),
        F.sum(F.col("_rel") * F.col("_d")).cast("long").alias("_dcg"),
    )
    out = per_q.join(rel_counts, query_col, "left").select(
        query_col,
        "n_retrieved",
        F.coalesce(F.col("n_relevant"), F.lit(0))
        .cast("long")
        .alias("n_relevant"),
        "n_hits",
        "_dcg",
    )
    idcg = F.element_at(
        prefix_arr, F.least(F.col("n_relevant"), F.lit(k)).cast("int") + 1
    )
    return out.withColumn("_idcg", idcg).select(
        query_col,
        "n_retrieved",
        "n_relevant",
        "n_hits",
        F.expr(f"({RET_SCALE} * n_hits) div {k}")
        .cast("long")
        .alias("precision_ppm"),
        F.when(
            F.col("n_relevant") > 0,
            F.expr(f"({RET_SCALE} * n_hits) div n_relevant"),
        )
        .cast("long")
        .alias("recall_ppm"),
        F.when(
            F.col("_idcg") > 0,
            F.expr(f"(CAST({RET_SCALE} AS BIGINT) * _dcg) div _idcg"),
        )
        .cast("long")
        .alias("ndcg_ppm"),
    )


#: Cohen's kappa is returned as an integer in 1e12ths.
KAPPA_SCALE = 10**12


def cohens_kappa(
    df: DataFrame,
    col_a: str,
    col_b: str,
) -> DataFrame:
    """Cohen's kappa (Cohen 1960) — chance-corrected agreement between two
    categorical labelings of the same items: the standard
    inter-annotator / silver-vs-gold QA gate for labeled training data
    (does the heuristic lang-id agree with the declared language beyond
    what marginal frequencies alone would produce?).

    κ = (p_o − p_e) / (1 − p_e) with p_o the observed agreement rate and
    p_e = Σ_v p_a(v)·p_b(v) the chance rate. Cleared of denominators:

        κ = (N·Σagree − Σ_v ra_v·cb_v) / (N² − Σ_v ra_v·cb_v)

    — all integers, assembled here as one ``KAPPA_SCALE``-scaled
    DECIMAL(38,0) floor division (N² and N·Σ wrap int64 past ~3·10⁹
    rows; decimal keeps the metric exact at any N — the exact_auc
    discipline). κ is NULL when the denominator is 0 (both labelings
    constant and identical — agreement is undefined, not 1.0).

    Rows where either label is NULL are excluded and counted
    (``n_null``) — an unlabeled item is a pipeline bug to surface.

    Distributed shape: one map-side-combinable aggregation for
    N/agreement/nulls, two single-column marginal aggregations, an
    inner join of the marginals on the label value (values only one
    side uses contribute 0 to p_e — inner-join semantics ARE the
    formula), and 1-row broadcast assembly. Label values travel only
    in the ≤|label-universe|-sized marginal tables.

    Returns one row: ``(n_items, n_null, n_agree, po_s, pe_s, kappa_s)``
    with the three ratios in KAPPA_SCALE units.
    """
    for c in (col_a, col_b):
        if c not in df.columns:
            raise ValueError(f"column {c!r} not in input: {df.columns}")
    if col_a == col_b:
        raise ValueError("col_a and col_b must differ")
    a, b = F.col(col_a), F.col(col_b)
    valid = df.filter(a.isNotNull() & b.isNotNull()).select(
        a.alias("_a"), b.alias("_b")
    )
    base = df.agg(
        F.sum(F.when(a.isNull() | b.isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_null")
    )
    counts = valid.agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        F.sum(F.when(F.col("_a") == F.col("_b"), 1).otherwise(0))
        .cast("long")
        .alias("n_agree"),
    )
    ra = valid.groupBy("_a").agg(F.count(F.lit(1)).alias("_ra"))
    cb = valid.groupBy("_b").agg(F.count(F.lit(1)).alias("_cb"))
    pe_num = (
        ra.join(cb, ra["_a"] == cb["_b"])
        .agg(
            F.coalesce(
                F.sum(
                    F.col("_ra").cast("decimal(38,0)")
                    * F.col("_cb").cast("decimal(38,0)")
                ),
                F.lit(0).cast("decimal(38,0)"),
            ).alias("_pe")
        )
    )
    out = counts.crossJoin(F.broadcast(base)).crossJoin(F.broadcast(pe_num))
    nd = "CAST(n_items AS DECIMAL(38,0))"
    scale = f"CAST({KAPPA_SCALE} AS DECIMAL(38,0))"
    return out.select(
        "n_items",
        F.coalesce(F.col("n_null"), F.lit(0)).cast("long").alias("n_null"),
        "n_agree",
        F.when(
            F.col("n_items") > 0,
            F.expr(f"({scale} * n_agree) div {nd}"),
        )
        .cast("long")
        .alias("po_s"),
        F.when(
            F.col("n_items") > 0,
            F.expr(f"({scale} * _pe) div ({nd} * {nd})"),
        )
        .cast("long")
        .alias("pe_s"),
        # κ may be NEGATIVE (worse-than-chance agreement); Spark's `div`
        # truncates toward zero while DuckDB's `//` floors toward −∞, so
        # the sign is handled explicitly — both engines then compute the
        # identical magnitude-truncated quotient
        F.when(
            F.expr(f"{nd} * {nd} - _pe") > 0,
            F.when(
                F.expr(f"{nd} * n_agree - _pe") >= 0,
                F.expr(
                    f"({scale} * ({nd} * n_agree - _pe))"
                    f" div ({nd} * {nd} - _pe)"
                ),
            ).otherwise(
                -F.expr(
                    f"({scale} * (_pe - {nd} * n_agree))"
                    f" div ({nd} * {nd} - _pe)"
                )
            ),
        )
        .cast("long")
        .alias("kappa_s"),
    )


def calibration_report(
    df: DataFrame,
    *,
    score_col: str,
    label_col: str,
    n_bins: int = 10,
    score_scale: int = 10**6,
) -> DataFrame:
    """Reliability diagram + expected-calibration-error terms (Naeini et
    al. 2015 form) for a probabilistic scorer against binary outcomes —
    the companion audit to :func:`exact_auc`: AUC grades RANKING,
    calibration grades whether the score's VALUE means what it says
    (a 0.9-scored document should be positive ~90% of the time before
    the score is used as a sampling weight or threshold).

    Contract: ``score_col`` is an INTEGRAL score in
    ``[0, score_scale]`` units (floats quantize caller-side — the
    exact_auc discipline; a float score is rejected loudly);
    ``label_col`` is 0/1. Equal-width bins on the score domain:
    ``bin = min(n_bins−1, (score·n_bins) div score_scale)``. Rows with
    NULL score or label land in bin −1 (visible, like
    profile.column_histogram's NULL bucket — never silently dropped).

    Per bin: ``n``, ``n_pos``, ``conf_s = sum_score div n`` (mean
    claimed probability, floored in score units), ``acc_s =
    (score_scale·n_pos) div n`` (realized rate), and ``gap_abs =
    |sum_score − score_scale·n_pos|`` — the bin's UNNORMALIZED ECE
    term, an exact integer: ``ECE·score_scale = Σ gap_abs / N``, so
    the caller (or the gate oracle) assembles the scalar with ONE
    final floor division and no float ever enters.

    Distributed shape: ONE partial-aggregable groupBy over ≤ n_bins+1
    groups. Nothing else.
    """
    from pyspark.sql.types import IntegralType

    for c in (score_col, label_col):
        if c not in df.columns:
            raise ValueError(f"column {c!r} not in input: {df.columns}")
    if n_bins < 1:
        raise ValueError(f"n_bins must be >= 1, got {n_bins}")
    if score_scale < 1:
        raise ValueError(f"score_scale must be >= 1, got {score_scale}")
    if not isinstance(df.schema[score_col].dataType, IntegralType):
        raise ValueError(
            f"score column {score_col!r} must be integral in "
            f"[0, {score_scale}] units; quantize floats caller-side "
            f"(got {df.schema[score_col].dataType.simpleString()})"
        )
    s, y = F.col(score_col), F.col(label_col)
    binned = df.select(
        F.when(
            s.isNull() | y.isNull(), F.lit(-1)
        )
        .otherwise(
            F.least(
                F.lit(n_bins - 1),
                ((s.cast("long") * n_bins) / score_scale).cast("long"),
            )
        )
        .cast("int")
        .alias("bin"),
        s.cast("long").alias("_s"),
        y.cast("long").alias("_y"),
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.when(F.col("bin") >= 0, F.col("_y"))).cast("long").alias("n_pos"),
            F.sum(F.when(F.col("bin") >= 0, F.col("_s"))).cast("long").alias("_sum_s"),
        )
        .select(
            "bin",
            "n",
            F.coalesce(F.col("n_pos"), F.lit(0)).cast("long").alias("n_pos"),
            F.when(F.col("bin") >= 0, F.expr("_sum_s div n"))
            .cast("long")
            .alias("conf_s"),
            F.when(
                F.col("bin") >= 0,
                F.expr(f"({score_scale} * n_pos) div n"),
            )
            .cast("long")
            .alias("acc_s"),
            F.when(
                F.col("bin") >= 0,
                F.abs(F.col("_sum_s") - F.lit(score_scale) * F.col("n_pos")),
            )
            .cast("long")
            .alias("gap_abs"),
        )
    )


def bradley_terry(
    duels: DataFrame,
    *,
    item_a: str = "item_a",
    item_b: str = "item_b",
    wins_a: str = "wins_a",
    wins_b: str = "wins_b",
    n_rounds: int = 6,
    scale: int = 1_000_000,
) -> DataFrame:
    """Bradley-Terry preference strengths from pairwise duel counts by
    Hunter's MM iteration (Hunter 2004, "MM algorithms for generalized
    Bradley-Terry models") — THE estimator behind ranking items from
    pairwise judgments (preference data for reward models, annotator
    quality, reranker A/B duels). The MM update

        w_i ← W_i / Σ_j n_ij / (w_i + w_j)

    (``W_i`` total wins, ``n_ij`` matches between i and j) runs in EXACT
    integer micro-units: each pair contributes the truncating div
    ``(n_ij·10¹²) div (w_i + w_j)`` — a per-pair-exact term, so the
    per-item sum is order-free — and the update is one more truncating
    div. Same-input bit-identical on any engine/partitioning (the
    quantized-recurrence discipline of embedding_pca: determinism comes
    from re-quantizing every round, convergence-in-the-limit is traded
    for gate-checkable exactness at finite rounds).

    Conventions: duels arrive as unordered-pair win counts; reversed
    duplicates aggregate. Items that never win converge to strength 0
    (the true MLE degenerates without strong connectivity — Ford 1957's
    condition — so a 0 is a SIGNAL the comparison graph is one-sided,
    not noise). Zero-vs-zero pair denominators clamp to 1; a zero
    per-item divisor emits 0 (both only reachable in degenerate
    graphs).

    Distributed shape: the duel table aggregates ONCE to per-pair
    matches + per-item win totals; each MM round is one equi-join of
    the |pairs| match table against the |items| strength table + one
    item-keyed partial agg, localCheckpointed (iterative lineage
    discipline). Strengths never leave the cluster; only the final
    1-row Σw normalizer broadcasts back for ``score_ppm``.

    Returns ``(item, n_wins, n_matches, w_micro, score_ppm)``.
    """
    for c in (item_a, item_b, wins_a, wins_b):
        if c not in duels.columns:
            raise ValueError(f"column {c!r} not in input: {duels.columns}")
    if n_rounds < 1:
        raise ValueError(f"n_rounds must be >= 1, got {n_rounds}")
    if scale < 1:
        raise ValueError(f"scale must be >= 1, got {scale}")
    d38 = "decimal(38,0)"
    base = duels.select(
        F.col(item_a).alias("_a"),
        F.col(item_b).alias("_b"),
        F.col(wins_a).cast("long").alias("_wa"),
        F.col(wins_b).cast("long").alias("_wb"),
    )
    bad = base.filter(
        F.col("_a").isNull()
        | F.col("_b").isNull()
        | (F.col("_a") == F.col("_b"))
        | (F.col("_wa") < 0)
        | (F.col("_wb") < 0)
    ).limit(1)
    if bad.take(1):
        raise ValueError(
            "duels must have non-null distinct items and wins >= 0"
        )
    # directed view: (i, j, wins_of_i_vs_j) both ways, then aggregate —
    # reversed-duplicate inputs collapse here
    directed = base.select(
        F.col("_a").alias("_i"), F.col("_b").alias("_j"),
        F.col("_wa").alias("_w"), (F.col("_wa") + F.col("_wb")).alias("_n"),
    ).unionByName(
        base.select(
            F.col("_b").alias("_i"), F.col("_a").alias("_j"),
            F.col("_wb").alias("_w"),
            (F.col("_wa") + F.col("_wb")).alias("_n"),
        )
    )
    matches = (
        directed.groupBy("_i", "_j")
        .agg(F.sum("_n").alias("_n"), F.sum("_w").alias("_wi"))
        .filter(F.col("_n") > 0)
        .localCheckpoint(eager=True)
    )
    totals = (
        matches.groupBy("_i")
        .agg(
            F.sum("_wi").cast("long").alias("n_wins"),
            F.sum("_n").cast("long").alias("n_matches"),
        )
        .localCheckpoint(eager=True)
    )
    cur = totals.select(
        "_i", F.lit(scale).cast("long").alias("_wcur")
    )
    for _ in range(n_rounds):
        terms = (
            matches.join(
                cur.select(F.col("_i").alias("_j"), F.col("_wcur").alias(
                    "_wj")), "_j"
            )
            .join(cur, "_i")
            .select(
                "_i",
                F.expr(
                    f"(CAST(_n AS {d38}) * 1000000000000) div "
                    f"greatest(CAST(_wcur AS {d38}) + CAST(_wj AS {d38}),"
                    f" CAST(1 AS {d38}))"
                ).alias("_t"),
            )
        )
        denom = terms.groupBy("_i").agg(F.sum("_t").alias("_d"))
        cur = (
            totals.join(denom, "_i")
            .select(
                "_i",
                F.when(
                    F.col("_d") > 0,
                    F.expr(
                        f"(CAST(n_wins AS {d38}) * 1000000000000) div _d"
                    ),
                )
                .otherwise(F.lit(0))
                .cast("long")
                .alias("_wcur"),
            )
            .localCheckpoint(eager=True)
        )
    total_w = cur.agg(F.sum(F.col("_wcur").cast(d38)).alias("_tw"))
    return (
        totals.join(cur, "_i")
        .crossJoin(F.broadcast(total_w))
        .select(
            F.col("_i").alias("item"),
            "n_wins",
            "n_matches",
            F.col("_wcur").alias("w_micro"),
            F.when(
                F.col("_tw") > 0,
                F.expr(
                    f"(CAST(_wcur AS {d38}) * 1000000) div _tw"
                ),
            )
            .cast("long")
            .alias("score_ppm"),
        )
    )


def isotonic_calibration(
    df: DataFrame,
    *,
    score_col: str,
    y_col: str,
    n_cells: int = 32,
    scale: int = 1_000_000,
) -> DataFrame:
    """Exact isotonic regression of ``y`` on ``score`` — the calibration
    fit (Zadrozny-Elkan 2002 style) that turns a ranking score into a
    monotone probability estimate, solved EXACTLY via the minimax
    characterization of the PAV solution (Barlow et al. 1972):

        fit_i = max_{j ≤ i} min_{k ≥ i} mean(y over cells j..k)

    Two-level design (the voptimal_histogram pattern): ONE data pass
    folds (score, y) into ≤ ``n_cells`` equi-width score cells (count,
    Σy, score min/max — exact integers), then the O(m³) minimax runs
    entirely on that metadata table as two joins + two argmin/argmax
    aggs. No PAV pooling loop, no iteration — the closed form IS the
    distributed algorithm.

    Exact rational ordering without rationals: segment means ``S/N``
    are compared via the 10¹⁸-scaled truncating div ``(S·10¹⁸) div N``
    (DECIMAL(38,0)). Distinct rationals with denominators ≤ 10⁶ differ
    by ≥ 10⁻¹², which the 10¹⁸ quantum separates by ≥ 10⁶ ulps — the
    scaled total order is EXACT for any input below 10⁶ rows per run
    and |Σy| < 10²⁰/10¹⁸ headroom; far larger corpora should
    pre-aggregate per score cell first (which is what the first pass
    does, so the bound binds m, not rows). Emitted ``fit_micro`` is the
    scaled value floor-divided to micro units — deterministic on any
    engine/partitioning.

    NULL scores/y are dropped. ``y`` must be integral (labels or
    counts; quantize caller-side otherwise — the exact_auc rule).
    Returns per cell (score order): ``(cell, score_lo, score_hi,
    n_rows, mean_micro, fit_micro)`` with ``fit_micro`` nondecreasing.
    """
    by_name = {f.name: f.dataType for f in df.schema.fields}
    for c in (score_col, y_col):
        if c not in by_name:
            raise ValueError(f"column {c!r} not in input: {df.columns}")
    integral = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
    for c in (score_col, y_col):
        if not isinstance(by_name[c], integral):
            raise ValueError(
                f"column {c!r} must be integral (got {by_name[c]})"
            )
    if n_cells < 1:
        raise ValueError(f"n_cells must be >= 1, got {n_cells}")
    if scale < 1:
        raise ValueError(f"scale must be >= 1, got {scale}")
    from pyspark.sql.window import Window

    spark = df.sparkSession
    d38 = "decimal(38,0)"
    out_schema = (
        "cell long, score_lo long, score_hi long, n_rows long, "
        "mean_micro long, fit_micro long"
    )
    vals = df.select(
        F.col(score_col).cast("long").alias("_x"),
        F.col(y_col).cast("long").alias("_y"),
    ).filter(F.col("_x").isNotNull() & F.col("_y").isNotNull())
    bounds = vals.agg(
        F.min("_x").alias("_mn"), F.max("_x").alias("_mx")
    ).collect()[0]
    if bounds["_mn"] is None:
        return spark.createDataFrame([], out_schema)
    mn, mx = int(bounds["_mn"]), int(bounds["_mx"])
    if mx - mn >= (2**62) // n_cells:
        raise ValueError(
            "isotonic_calibration: score span too wide for exact cell "
            "arithmetic — quantize scores to a denser range first"
        )
    span = mx - mn + 1
    cells = (
        vals.select(
            F.expr(f"((_x - {mn}) * {n_cells}) div {span}").alias("_c"),
            "_x",
            "_y",
        )
        .groupBy("_c")
        .agg(
            F.count("*").cast(d38).alias("_n"),
            F.sum(F.col("_y").cast(d38)).alias("_sy"),
            F.min("_x").alias("_xlo"),
            F.max("_x").alias("_xhi"),
        )
    )
    widx = Window.orderBy("_c")
    wpre = widx.rowsBetween(Window.unboundedPreceding, 0)
    pre = (
        cells.select(
            (F.row_number().over(widx) - 1).alias("_i"),
            F.sum("_n").over(wpre).alias("_pc"),
            F.sum("_sy").over(wpre).alias("_psy"),
            "_n",
            "_sy",
            "_xlo",
            "_xhi",
        )
        .localCheckpoint(eager=True)
    )
    k18 = 10**18
    # all (j,k) segment means, 10^18-scaled: j via the (j-1) prefix row
    segs = (
        pre.select(F.col("_i").alias("_k"), F.col("_pc").alias("_hc"),
                   F.col("_psy").alias("_hs"))
        .join(
            pre.select(
                (F.col("_i") + 1).alias("_j"),
                F.col("_pc").alias("_qc"),
                F.col("_psy").alias("_qs"),
            ),
            F.col("_j") <= F.col("_k"),
        )
        .unionByName(
            pre.select(
                F.col("_i").alias("_k"),
                F.col("_pc").alias("_hc"),
                F.col("_psy").alias("_hs"),
            ).withColumn("_j", F.lit(0).cast("long"))
            .withColumn("_qc", F.lit(0).cast(d38))
            .withColumn("_qs", F.lit(0).cast(d38)),
            allowMissingColumns=False,
        )
        .select(
            "_j",
            "_k",
            F.expr(
                f"((_hs - _qs) * CAST({k18} AS {d38})) div (_hc - _qc)"
            ).alias("_sm"),
        )
        .distinct()
    )
    # triples: cell i inside segment (j,k); inner min over k, outer max
    inner = (
        segs.join(
            pre.select(F.col("_i")),
            (F.col("_j") <= F.col("_i")) & (F.col("_i") <= F.col("_k")),
        )
        .groupBy("_i", "_j")
        .agg(F.min("_sm").alias("_inner"))
    )
    fit = inner.groupBy("_i").agg(F.max("_inner").alias("_fit"))
    return (
        pre.join(fit, "_i")
        .select(
            F.col("_i").alias("cell"),
            F.col("_xlo").alias("score_lo"),
            F.col("_xhi").alias("score_hi"),
            F.col("_n").cast("long").alias("n_rows"),
            F.expr(f"(_sy * CAST({scale} AS {d38})) div _n")
            .cast("long")
            .alias("mean_micro"),
            F.expr(f"_fit div {k18 // scale}").cast("long").alias(
                "fit_micro"
            ),
        )
        .orderBy("cell")
    )


def diff_in_diff(
    df: DataFrame,
    *,
    group_col: str = "treated",
    period_col: str = "post",
    outcome_col: str = "outcome",
    scale: int = 1_000_000,
) -> DataFrame:
    """Difference-in-differences estimate — the 2×2 causal workhorse
    (Card-Krueger design): how much did the treated group's mean
    outcome move BEYOND the control group's move across the same
    pre→post boundary?

        DiD = (m̄_treated,post − m̄_treated,pre)
            − (m̄_control,post − m̄_control,pre)

    Exactness contract: each cell mean is quantized ONCE to micro units
    (``(Σy·scale) div n`` — truncating DECIMAL(38,0) div), and the DiD
    is exact integer arithmetic over those four quantized means — the
    estimate is DEFINED at micro resolution (a cross-multiplied exact
    rational needs a 4-cell common denominator that overflows any fixed
    width; one quantization per cell is the honest, engine-stable
    contract, same as bradley_terry's per-round floors).

    ``group_col``/``period_col`` must be 0/1 longs (map cohorts
    caller-side); NULL outcome/flag rows are dropped and counted. ANY
    empty cell makes the design undefined → NULL ``did_micro`` with the
    cell counts still visible (never a fake 0). One conditional-agg
    pass, 1-row output:

    ``(n_00, mean_00_micro, n_01, mean_01_micro, n_10, mean_10_micro,
    n_11, mean_11_micro, did_micro, n_dropped)`` — suffix ``gp`` =
    (group, period).
    """
    for c in (group_col, period_col, outcome_col):
        if c not in df.columns:
            raise ValueError(f"column {c!r} not in input: {df.columns}")
    if scale < 1:
        raise ValueError(f"scale must be >= 1, got {scale}")
    d38 = "decimal(38,0)"
    g, p, y = F.col(group_col), F.col(period_col), F.col(outcome_col)
    ok = g.isNotNull() & p.isNotNull() & y.isNotNull()
    bad_flags = df.filter(
        (g.isNotNull() & ~g.isin(0, 1)) | (p.isNotNull() & ~p.isin(0, 1))
    ).limit(1)
    if bad_flags.take(1):
        raise ValueError("group/period flags must be 0 or 1")
    aggs = [
        F.sum((~ok).cast("long")).alias("n_dropped"),
    ]
    for gi in (0, 1):
        for pi in (0, 1):
            cell = ok & (g == gi) & (p == pi)
            aggs.append(
                F.sum(cell.cast("long")).alias(f"n_{gi}{pi}")
            )
            aggs.append(
                F.sum(
                    F.when(cell, y.cast(d38)).otherwise(
                        F.lit(0).cast(d38)
                    )
                ).alias(f"_s{gi}{pi}")
            )
    row = df.agg(*aggs)
    means = []
    for gi in (0, 1):
        for pi in (0, 1):
            means.append(
                F.when(
                    F.col(f"n_{gi}{pi}") > 0,
                    F.expr(
                        f"(_s{gi}{pi} * CAST({scale} AS {d38}))"
                        f" div n_{gi}{pi}"
                    ),
                )
                .cast("long")
                .alias(f"mean_{gi}{pi}_micro")
            )
    out = row.select(
        "n_00", "n_01", "n_10", "n_11", "n_dropped", *means
    )
    did = (
        (F.col("mean_11_micro") - F.col("mean_10_micro"))
        - (F.col("mean_01_micro") - F.col("mean_00_micro"))
    )
    return out.select(
        "n_00",
        "mean_00_micro",
        "n_01",
        "mean_01_micro",
        "n_10",
        "mean_10_micro",
        "n_11",
        "mean_11_micro",
        F.when(
            (F.col("n_00") > 0)
            & (F.col("n_01") > 0)
            & (F.col("n_10") > 0)
            & (F.col("n_11") > 0),
            did,
        )
        .cast("long")
        .alias("did_micro"),
        F.coalesce("n_dropped", F.lit(0)).cast("long").alias("n_dropped"),
    )


def gini_stump(
    df: DataFrame,
    *,
    feature_cols: list[str],
    label_col: str = "label",
    n_cells: int = 32,
    scale: int = 1_000_000,
) -> DataFrame:
    """Exact depth-1 decision tree (CART split): over all features and
    all fine-cell thresholds, pick the split minimizing the weighted
    Gini impurity — the weak-learner / feature-screening primitive a
    quality-filter pipeline trains before anything deeper, and the
    single most informative "which column separates good from bad"
    answer.

    Sketch-first (the voptimal_histogram pattern): ONE data pass folds
    each feature into ≤ ``n_cells`` equi-width cells of (count,
    positives); candidate splits are the ≤ cells·features prefix
    boundaries of that METADATA table. The weighted impurity of a
    candidate is the exact rational

        G·n = 2·posL·negL/nL + 2·posR·negR/nR
            = (2·posL·negL·nR + 2·posR·negR·nL) / (nL·nR)

    totally ordered WITHOUT big quotients by the Euclidean
    (whole, frac) device (the theil_sen_trend trick: whole =
    floor(num/den) via pmod, frac = (pmod·10¹⁸) div den) — ties break
    toward (feature ASC, cell ASC), so the stump is UNIQUE and
    gate-checkable. Degenerate splits (empty side) are skipped; a
    feature whose cells all collapse contributes no candidates.

    Labels must be 0/1; NULL feature values are excluded from that
    feature's candidates (per-feature n may differ — stated); NULL
    labels are dropped globally. Returns ONE row:
    ``(feature, split_value, n_left, pos_left, n_right, pos_right,
    gini_micro, parent_gini_micro)`` — ``split_value`` the largest
    observed value on the left side (``x <= split_value`` goes left),
    ``gini_micro`` = floor(G·10⁶) of the winning split.
    """
    if not feature_cols:
        raise ValueError("feature_cols must be non-empty")
    by_name = {f.name: f.dataType for f in df.schema.fields}
    integral = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
    for c in [*feature_cols, label_col]:
        if c not in by_name:
            raise ValueError(f"column {c!r} not in input: {df.columns}")
        if not isinstance(by_name[c], integral):
            raise ValueError(
                f"column {c!r} must be integral (got {by_name[c]})"
            )
    if n_cells < 2:
        raise ValueError(f"n_cells must be >= 2, got {n_cells}")
    if scale < 1:
        raise ValueError(f"scale must be >= 1, got {scale}")
    from pyspark.sql.window import Window

    d38 = "decimal(38,0)"
    spark = df.sparkSession
    lbl = F.col(label_col)
    base = df.filter(lbl.isNotNull())
    if base.filter(~lbl.isin(0, 1)).take(1):
        raise ValueError("labels must be 0 or 1")
    legs = []
    for c in feature_cols:
        legs.append(
            base.filter(F.col(c).isNotNull()).select(
                F.lit(c).alias("_f"),
                F.col(c).cast("long").alias("_x"),
                lbl.cast("long").alias("_y"),
            )
        )
    melted = legs[0]
    for leg in legs[1:]:
        melted = melted.unionByName(leg)
    bounds = melted.groupBy("_f").agg(
        F.min("_x").alias("_mn"), F.max("_x").alias("_mx")
    )
    cells = (
        melted.join(F.broadcast(bounds), "_f")
        .select(
            "_f",
            guarded_bucket("_x - _mn", n_cells, op="gini_stump").alias("_c"),
            "_x",
            "_y",
        )
        .groupBy("_f", "_c")
        .agg(
            F.count(F.lit(1)).cast("long").alias("_n"),
            F.sum("_y").cast("long").alias("_p"),
            F.max("_x").alias("_xmax"),
        )
        .localCheckpoint(eager=True)
    )
    w = Window.partitionBy("_f").orderBy("_c")
    wpre = w.rowsBetween(Window.unboundedPreceding, 0)
    tot = Window.partitionBy("_f")
    cand = (
        cells.select(
            "_f",
            "_c",
            "_xmax",
            F.sum("_n").over(wpre).alias("_nl"),
            F.sum("_p").over(wpre).alias("_pl"),
            F.sum("_n").over(tot).alias("_nt"),
            F.sum("_p").over(tot).alias("_pt"),
        )
        .filter((F.col("_nl") > 0) & (F.col("_nl") < F.col("_nt")))
        .select(
            "_f",
            "_c",
            "_xmax",
            "_nl",
            "_pl",
            (F.col("_nt") - F.col("_nl")).alias("_nr"),
            (F.col("_pt") - F.col("_pl")).alias("_pr"),
            "_nt",
            "_pt",
        )
    )
    num = F.expr(
        f"2 * CAST(_pl AS {d38}) * (_nl - _pl) * _nr"
        f" + 2 * CAST(_pr AS {d38}) * (_nr - _pr) * _nl"
    )
    den = F.expr(f"CAST(_nl AS {d38}) * _nr * _nt")
    scored = cand.withColumn("_num", num).withColumn("_den", den)
    # Euclidean decomposition: exact total order on num/den in two longs
    scored = (
        scored.withColumn("_r", F.expr("pmod(_num, _den)"))
        .withColumn(
            "_wh", F.expr("CAST((_num - _r) / _den AS DECIMAL(38,0))")
        )
        .withColumn(
            "_fr",
            F.expr(
                f"CAST((_r * CAST({10**18} AS {d38})) div _den"
                f" AS BIGINT)"
            ),
        )
    )
    wbest = Window.orderBy(
        "_wh", "_fr", F.asc("_f"), F.asc("_c")
    )
    best = (
        scored.withColumn("_rk", F.row_number().over(wbest))
        .filter(F.col("_rk") == 1)
        .localCheckpoint(eager=True)
    )
    parent = F.expr(
        f"(2 * CAST(_pt AS {d38}) * (_nt - _pt) * CAST({scale} AS {d38}))"
        f" div (CAST(_nt AS {d38}) * _nt)"
    )
    return best.select(
        F.col("_f").alias("feature"),
        F.col("_xmax").alias("split_value"),
        F.col("_nl").cast("long").alias("n_left"),
        F.col("_pl").cast("long").alias("pos_left"),
        F.col("_nr").cast("long").alias("n_right"),
        F.col("_pr").cast("long").alias("pos_right"),
        (
            F.col("_wh").cast("long") * F.lit(scale)
            + F.expr(f"_fr div {10**18 // scale}")
        )
        .cast("long")
        .alias("gini_micro"),
        parent.cast("long").alias("parent_gini_micro"),
    )


def confusion_report(
    df: DataFrame,
    *,
    label_col: str = "label",
    pred_col: str = "pred",
    scale: int = 1_000_000,
) -> DataFrame:
    """Multi-class confusion-matrix report: per-class TP/FP/FN with
    exact-integer precision/recall/F1 — the per-class grading a trained
    classifier (lang-id, quality filter, routing model) gets before its
    predictions gate a 100-TB corpus. Complements exact_auc (threshold-
    free ranking) and cohens_kappa (chance-corrected agreement) with
    the per-class view that reveals WHICH class a filter is silently
    dropping.

    Sketch-first: ONE data pass folds rows into the (label, pred)
    contingency grid (classes² metadata rows); every class's counts
    derive from that grid's marginals. Classes are the UNION of
    observed labels and predictions, so a never-predicted class still
    gets its zero-precision row and a hallucinated class its
    zero-recall row. Rates are exact quantized rationals —
    ``precision_ppm = tp·scale div (tp+fp)`` etc., ``f1_ppm =
    2·tp·scale div (2·tp+fp+fn)`` — NULL when the denominator is 0
    (undefined, not fake 0: engine-identical, distinguishable).

    Two summary rows ride along: class ``<micro>`` (pooled counts —
    micro-P = micro-R = accuracy in the single-label setting) and
    ``<macro>`` (unweighted mean of per-class ppm values with NULLs
    counted as 0 — the sklearn zero_division=0 convention, stated;
    tp/fp/fn NULL there since counts don't average). Rows with a NULL
    label or prediction are dropped (stated).

    Returns ``(class, support, tp, fp, fn, precision_ppm, recall_ppm,
    f1_ppm)`` — one row per class plus the two summary rows.
    """
    if scale < 1:
        raise ValueError(f"scale must be >= 1, got {scale}")
    for c in (label_col, pred_col):
        if c not in df.columns:
            raise ValueError(f"column {c!r} not in input: {df.columns}")
    if label_col == pred_col:
        raise ValueError("label_col and pred_col must differ")
    d38 = "decimal(38,0)"
    cells = (
        df.filter(
            F.col(label_col).isNotNull() & F.col(pred_col).isNotNull()
        )
        .select(
            F.col(label_col).cast("string").alias("_l"),
            F.col(pred_col).cast("string").alias("_p"),
        )
        .groupBy("_l", "_p")
        .agg(F.count(F.lit(1)).cast("long").alias("_n"))
        .localCheckpoint(eager=True)
    )
    lab = cells.groupBy("_l").agg(F.sum("_n").alias("_nl"))
    prd = cells.groupBy("_p").agg(F.sum("_n").alias("_np"))
    diag = cells.filter(F.col("_l") == F.col("_p")).select(
        F.col("_l").alias("_c"), F.col("_n").alias("_tp")
    )
    classes = (
        lab.select(F.col("_l").alias("_c"), "_nl")
        .join(prd.select(F.col("_p").alias("_c"), "_np"), "_c", "full")
        .join(diag, "_c", "left")
        .select(
            "_c",
            F.coalesce("_nl", F.lit(0)).cast("long").alias("support"),
            F.coalesce("_tp", F.lit(0)).cast("long").alias("tp"),
            (
                F.coalesce("_np", F.lit(0)) - F.coalesce("_tp", F.lit(0))
            ).cast("long").alias("fp"),
            (
                F.coalesce("_nl", F.lit(0)) - F.coalesce("_tp", F.lit(0))
            ).cast("long").alias("fn"),
        )
    )

    def _rates(src: DataFrame) -> DataFrame:
        return (
            src.withColumn(
                "precision_ppm",
                F.expr(
                    f"CASE WHEN tp + fp = 0 THEN NULL ELSE CAST("
                    f"CAST(tp AS {d38}) * {scale} div (tp + fp)"
                    f" AS BIGINT) END"
                ),
            )
            .withColumn(
                "recall_ppm",
                F.expr(
                    f"CASE WHEN tp + fn = 0 THEN NULL ELSE CAST("
                    f"CAST(tp AS {d38}) * {scale} div (tp + fn)"
                    f" AS BIGINT) END"
                ),
            )
            .withColumn(
                "f1_ppm",
                F.expr(
                    f"CASE WHEN 2 * tp + fp + fn = 0 THEN NULL ELSE CAST("
                    f"CAST(2 AS {d38}) * tp * {scale}"
                    f" div (2 * tp + fp + fn) AS BIGINT) END"
                ),
            )
        )

    per_class = _rates(classes)
    micro = _rates(
        classes.agg(
            F.sum("support").cast("long").alias("support"),
            F.sum("tp").cast("long").alias("tp"),
            F.sum("fp").cast("long").alias("fp"),
            F.sum("fn").cast("long").alias("fn"),
        ).select(F.lit("<micro>").alias("_c"), "support", "tp", "fp", "fn")
    )
    macro = per_class.agg(
        F.sum("support").cast("long").alias("support"),
        F.count(F.lit(1)).alias("_k"),
        F.sum(F.coalesce("precision_ppm", F.lit(0))).alias("_sp"),
        F.sum(F.coalesce("recall_ppm", F.lit(0))).alias("_sr"),
        F.sum(F.coalesce("f1_ppm", F.lit(0))).alias("_sf"),
    ).select(
        F.lit("<macro>").alias("_c"),
        "support",
        F.lit(None).cast("long").alias("tp"),
        F.lit(None).cast("long").alias("fp"),
        F.lit(None).cast("long").alias("fn"),
        F.expr("CAST(_sp div _k AS BIGINT)").alias("precision_ppm"),
        F.expr("CAST(_sr div _k AS BIGINT)").alias("recall_ppm"),
        F.expr("CAST(_sf div _k AS BIGINT)").alias("f1_ppm"),
    )
    return (
        per_class.unionByName(micro)
        .unionByName(macro)
        .withColumnRenamed("_c", "class")
    )


def mcnemar_test(
    df: DataFrame,
    *,
    label_col: str = "label",
    pred_a_col: str = "pred_a",
    pred_b_col: str = "pred_b",
    scale: int = 1_000_000,
) -> DataFrame:
    """McNemar's paired test (McNemar 1947): do two classifiers graded
    on the SAME rows differ beyond what their disagreement pattern
    explains — the A/B gate for swapping one corpus filter for another,
    where unpaired accuracy deltas mislead (the discordant cells b and
    c carry ALL the evidence; rows both models get right or both get
    wrong are uninformative).

    ONE aggregation pass (map-side combinable sums — zero joins, zero
    extra shuffles beyond the final 1-row reduce) folds the table into
    the paired 2×2: ``n11`` both correct, ``n10`` only A correct,
    ``n01`` only B correct, ``n00`` both wrong. The statistic is the
    exact quantized rational ``(n10−n01)²·scale div (n10+n01)`` (χ²,
    1 dof) plus Edwards' continuity-corrected variant
    ``(max(|n10−n01|−1, 0))²·scale div (n10+n01)`` — both NULL when
    n10+n01 = 0 (no discordant pairs: no evidence, not zero evidence).
    Rows with a NULL label or either prediction NULL are dropped
    (stated; a NULL prediction is an abstention, not a wrong answer —
    filter upstream to score abstentions as errors).

    Returns ONE row: ``(n, n11, n10, n01, n00, chi2_micro,
    chi2_corrected_micro)``.
    """
    if scale < 1:
        raise ValueError(f"scale must be >= 1, got {scale}")
    for c in (label_col, pred_a_col, pred_b_col):
        if c not in df.columns:
            raise ValueError(f"column {c!r} not in input: {df.columns}")
    if len({label_col, pred_a_col, pred_b_col}) != 3:
        raise ValueError("label/pred_a/pred_b columns must be distinct")
    d38 = "decimal(38,0)"
    a_ok = (F.col(pred_a_col) == F.col(label_col)).cast("long")
    b_ok = (F.col(pred_b_col) == F.col(label_col)).cast("long")
    agg = (
        df.filter(
            F.col(label_col).isNotNull()
            & F.col(pred_a_col).isNotNull()
            & F.col(pred_b_col).isNotNull()
        )
        .select(a_ok.alias("_a"), b_ok.alias("_b"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.expr("_a * _b")).cast("long").alias("n11"),
            F.sum(F.expr("_a * (1 - _b)")).cast("long").alias("n10"),
            F.sum(F.expr("(1 - _a) * _b")).cast("long").alias("n01"),
            F.sum(F.expr("(1 - _a) * (1 - _b)")).cast("long").alias("n00"),
        )
    )
    return agg.select(
        F.coalesce("n", F.lit(0)).alias("n"),
        F.coalesce("n11", F.lit(0)).alias("n11"),
        F.coalesce("n10", F.lit(0)).alias("n10"),
        F.coalesce("n01", F.lit(0)).alias("n01"),
        F.coalesce("n00", F.lit(0)).alias("n00"),
        F.expr(
            f"CASE WHEN coalesce(n10, 0) + coalesce(n01, 0) = 0 THEN NULL"
            f" ELSE CAST(CAST(n10 - n01 AS {d38}) * (n10 - n01) * {scale}"
            f" div (n10 + n01) AS BIGINT) END"
        ).alias("chi2_micro"),
        F.expr(
            f"CASE WHEN coalesce(n10, 0) + coalesce(n01, 0) = 0 THEN NULL"
            f" ELSE CAST(CAST(greatest(abs(n10 - n01) - 1, 0) AS {d38})"
            f" * greatest(abs(n10 - n01) - 1, 0) * {scale}"
            f" div (n10 + n01) AS BIGINT) END"
        ).alias("chi2_corrected_micro"),
    )


def krippendorff_alpha(
    df: DataFrame,
    *,
    item_col: str = "item",
    value_col: str = "value",
    max_raters: int = 12,
    scale: int = 1_000_000,
) -> DataFrame:
    """Krippendorff's alpha (nominal) — chance-corrected agreement over
    items rated by VARYING numbers of raters, the generalization
    cohens_kappa (exactly 2 fixed raters) can't cover: the reliability
    gate for multi-annotator labeling campaigns before their labels
    train a filter.

    Input is long format: one row per (item, rating value); rater
    identity is irrelevant for alpha (only the value multiset per item
    matters). Sketch-first: ONE pass folds rows into the (item, value)
    grid; per-item tallies, value marginals, and the statistic derive
    from that metadata. Items with fewer than 2 ratings are unpairable
    and excluded (counted in ``n_unpairable``, per Krippendorff).

    Exactness device: the per-item observed-disagreement term
    ``(m_u² − Σ_c o_uc²)/(m_u−1)`` has a VARYING denominator, so the sum
    is pre-scaled by ``L = lcm(1..max_raters−1)`` — every ``L/(m_u−1)``
    is then an exact integer and the sum an exact long. With
    ``B = Σ_c n_c(n−n_c)`` the alpha is the exact rational
    ``1 − (n−1)·A/(L·B)`` and ``alpha_micro`` its true floor in micro
    units (negative-safe via the pmod device) — bit-identical on any
    engine. Items exceeding ``max_raters`` ratings raise (the lcm bound
    is the exactness contract; raise it for bigger panels — L(16)
    = 720720 still leaves DECIMAL(38,0) headroom beyond 10⁹ ratings).

    NULL items or values are dropped (stated). ``alpha_micro`` is NULL
    when expected disagreement is 0 (every pairable rating identical —
    agreement is undefined, not perfect). Returns ONE row:
    ``(n_items, n_unpairable, n, n_values, alpha_micro)`` with ``n``
    the pairable-rating count.
    """
    if scale < 1:
        raise ValueError(f"scale must be >= 1, got {scale}")
    if not 2 <= max_raters <= 40:
        raise ValueError(
            f"max_raters must be in [2, 40] (lcm headroom), got {max_raters}"
        )
    for c in (item_col, value_col):
        if c not in df.columns:
            raise ValueError(f"column {c!r} not in input: {df.columns}")
    if item_col == value_col:
        raise ValueError("item_col and value_col must differ")
    import math

    lcm = 1
    for k in range(1, max_raters):
        lcm = math.lcm(lcm, k)
    d38 = "decimal(38,0)"
    cells = (
        df.filter(F.col(item_col).isNotNull() & F.col(value_col).isNotNull())
        .select(
            F.col(item_col).cast("string").alias("_u"),
            F.col(value_col).cast("string").alias("_v"),
        )
        .groupBy("_u", "_v")
        .agg(F.count(F.lit(1)).cast("long").alias("_o"))
        .localCheckpoint(eager=True)
    )
    items = cells.groupBy("_u").agg(
        F.sum("_o").alias("_m"),
        F.sum(F.expr("_o * _o")).alias("_sq"),
    )
    over = items.filter(F.col("_m") > max_raters).take(1)
    if over:
        raise ValueError(
            f"item {over[0]['_u']!r} has {over[0]['_m']} ratings "
            f"> max_raters={max_raters}; raise max_raters (lcm exactness "
            "bound) or pre-sample ratings per item"
        )
    pairable = items.filter(F.col("_m") >= 2).localCheckpoint(eager=True)
    counts = items.agg(
        F.count(F.lit(1)).alias("_ni"),
        F.sum(F.expr("CASE WHEN _m < 2 THEN 1 ELSE 0 END")).alias("_nu"),
    ).collect()[0]
    n_items = int(counts["_ni"] or 0)
    n_unpair = int(counts["_nu"] or 0)
    spark = df.sparkSession
    out_schema = (
        "n_items long, n_unpairable long, n long, n_values long, "
        "alpha_micro long"
    )
    if n_items == n_unpair:
        return spark.createDataFrame(
            [(n_items, n_unpair, 0, 0, None)], out_schema
        )
    # A = Σ_u (m²−Σo²)·(L/(m−1)) over pairable items; n = Σ_u m
    a_row = pairable.agg(
        F.sum(
            F.expr(f"CAST((_m * _m - _sq) AS {d38}) * ({lcm} div (_m - 1))")
        ).alias("_a"),
        F.sum("_m").cast("long").alias("_n"),
    ).collect()[0]
    a_term, n = int(a_row["_a"]), int(a_row["_n"])
    # value marginals over PAIRABLE items only
    marg = (
        cells.join(pairable.select("_u"), "_u")
        .groupBy("_v")
        .agg(F.sum("_o").alias("_nc"))
    )
    b_row = marg.agg(
        F.sum(F.expr(f"CAST(_nc AS {d38}) * ({n} - _nc)")).alias("_b"),
        F.count(F.lit(1)).alias("_nv"),
    ).collect()[0]
    b_term, n_values = int(b_row["_b"]), int(b_row["_nv"])
    if b_term == 0:
        alpha = None
    else:
        num = lcm * b_term - (n - 1) * a_term
        den = lcm * b_term
        alpha = (num * scale - (num * scale % den + den) % den) // den
    return spark.createDataFrame(
        [(n_items, n_unpair, n, n_values, alpha)], out_schema
    )


def rbo_overlap(
    df: DataFrame,
    *,
    query_col: str = "query",
    system_col: str = "system",
    rank_col: str = "rank",
    item_col: str = "item",
    systems: tuple[str, str] = ("a", "b"),
    p: tuple[int, int] = (9, 10),
    k: int = 20,
    scale: int = 1_000_000,
) -> DataFrame:
    """Rank-biased overlap (Webber, Moffat & Zobel 2010), truncated at
    depth ``k``: how similar are two systems' rankings per query,
    weighted toward the top — the ranking-DIFF metric retrieval_metrics
    (one run vs relevance labels) can't express: it compares two runs
    to each other with no labels at all (A/B-ing a retriever swap,
    detecting index drift, regression-gating an ANN approximation
    against the exact ranking).

    ``RBO@k = (1−p)·Σ_{d=1..k} p^{d−1}·X_d/d`` with ``X_d`` the overlap
    of the two depth-d prefixes. Exactness: ``p`` is the RATIONAL
    ``p_num/p_den`` (default 9/10), so the depth-d weight is the exact
    rational ``(p_den−p_num)·p_num^{d−1}/p_den^d``; each term is
    floored ONCE to micro units then exactly summed (the chi2 floor-
    per-cell contract — bit-identical on any engine, < k micro below
    the true value). Bounds ``p_den ≤ 10``, ``k ≤ 25`` keep
    ``p_den^k·k`` and ``p_num^{k−1}·k·scale`` inside DECIMAL(38,0).

    Distributed shape: prefixes join on (query, item) — one equi-join;
    a match at ranks (ra, rb) enters every depth ``d ≥ max(ra, rb)``,
    so per-query match depths fold to ≤ k metadata rows and the k
    depth legs are a broadcast dimension. Queries appearing in either
    system get a row (zero overlap → rbo 0). Duplicate (query, system,
    rank) rows or duplicate items inside a prefix raise (a ranking
    must be a function of rank; a silent dup would double-count X_d).

    Returns per query: ``(query, n_a, n_b, overlap_at_k, rbo_micro)``
    — ``n_a``/``n_b`` the prefix sizes actually present (≤ k).
    """
    pn, pd_ = p
    if not (0 < pn < pd_ <= 10):
        raise ValueError(f"p must satisfy 0 < num < den <= 10, got {p}")
    if not 1 <= k <= 25:
        raise ValueError(f"k must be in [1, 25], got {k}")
    if scale < 1:
        raise ValueError(f"scale must be >= 1, got {scale}")
    if systems[0] == systems[1]:
        raise ValueError("systems must differ")
    for c in (query_col, system_col, rank_col, item_col):
        if c not in df.columns:
            raise ValueError(f"column {c!r} not in input: {df.columns}")
    d38 = "decimal(38,0)"
    spark = df.sparkSession
    base = (
        df.filter(
            F.col(system_col).isin(*systems)
            & F.col(query_col).isNotNull()
            & F.col(rank_col).isNotNull()
            & F.col(item_col).isNotNull()
            & (F.col(rank_col) >= 1)
            & (F.col(rank_col) <= k)
        )
        .select(
            F.col(query_col).cast("string").alias("_q"),
            F.col(system_col).cast("string").alias("_s"),
            F.col(rank_col).cast("long").alias("_r"),
            F.col(item_col).cast("string").alias("_i"),
        )
        .localCheckpoint(eager=True)
    )
    dup_rank = (
        base.groupBy("_q", "_s", "_r").count().filter("count > 1").take(1)
    )
    if dup_rank:
        r0 = dup_rank[0]
        raise ValueError(
            f"duplicate rank {r0['_r']} in (query={r0['_q']!r}, "
            f"system={r0['_s']!r}) — a ranking maps each rank to one item"
        )
    dup_item = (
        base.groupBy("_q", "_s", "_i").count().filter("count > 1").take(1)
    )
    if dup_item:
        r0 = dup_item[0]
        raise ValueError(
            f"duplicate item {r0['_i']!r} in (query={r0['_q']!r}, "
            f"system={r0['_s']!r}) prefix — items must be distinct"
        )
    a = base.filter(F.col("_s") == systems[0]).select(
        "_q", "_i", F.col("_r").alias("_ra")
    )
    bq = base.filter(F.col("_s") == systems[1]).select(
        "_q", "_i", F.col("_r").alias("_rb")
    )
    sizes = base.groupBy("_q").agg(
        F.sum((F.col("_s") == systems[0]).cast("long")).alias("n_a"),
        F.sum((F.col("_s") == systems[1]).cast("long")).alias("n_b"),
    )
    mdepth = (
        a.join(bq, ["_q", "_i"])
        .select("_q", F.greatest("_ra", "_rb").alias("_m"))
        .groupBy("_q", "_m")
        .agg(F.count(F.lit(1)).cast("long").alias("_c"))
    )
    # depth legs with exact rational weights (p_den−p_num)·p_num^(d−1)/p_den^d
    depths = spark.createDataFrame(
        [
            (d, str((pd_ - pn) * pn ** (d - 1)), str(pd_**d * d))
            for d in range(1, k + 1)
        ],
        "d long, wnum string, wden string",
    )
    terms = (
        mdepth.join(F.broadcast(depths), mdepth["_m"] <= depths["d"])
        .groupBy("_q", "d", "wnum", "wden")
        .agg(F.sum("_c").alias("_x"))
        .select(
            "_q",
            F.col("d").alias("_d"),
            "_x",
            F.expr(
                f"CAST(CAST(wnum AS {d38}) * _x * {scale}"
                f" div CAST(wden AS {d38}) AS BIGINT)"
            ).alias("_t"),
        )
    )
    agg = terms.groupBy("_q").agg(
        F.sum("_t").cast("long").alias("rbo_micro"),
        F.max(F.when(F.col("_d") == k, F.col("_x"))).alias("overlap_at_k"),
    )
    return (
        sizes.join(agg, "_q", "left")
        .select(
            F.col("_q").alias("query"),
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            F.coalesce("overlap_at_k", F.lit(0))
            .cast("long")
            .alias("overlap_at_k"),
            F.coalesce("rbo_micro", F.lit(0)).cast("long").alias("rbo_micro"),
        )
    )


def average_precision(
    ranked: DataFrame,
    truth: DataFrame,
    *,
    k: int,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    rank_col: str = "rank",
    scale: int = 1_000_000,
) -> DataFrame:
    """Per-query average precision truncated at ``k`` (the MAP family)
    — the single-number rank-sensitive grade retrieval_metrics' P/R/
    nDCG@k triple doesn't give: every relevant doc contributes the
    precision AT ITS OWN RANK, so burying hit #2 from rank 2 to rank
    k−1 is punished even though P@k and recall@k can't see it.

    ``AP@k = (1/R) Σ_{r≤k, r hit} P@r`` with ``R = |truth(q)|``. Each
    ``P@r = hits_≤r / r`` is a per-hit exact rational floored ONCE to
    micro units then exactly summed, and the final ``/R`` is one more
    exact floor — the RBO floor-per-term contract: bit-identical on any
    engine, < (hits+1) micro below the true value, engine-stable where
    a float Σ would be partition-order-dependent. Queries with no truth
    pairs get NULL (undefined, never fake 0 — the exact_auc
    discipline); rows past rank ``k`` are ignored defensively; truth
    pairs are deduplicated here.

    Distributed shape: hit marking is one equi-join against the dedup'd
    truth pairs; the running hit count is ONE window over rank within
    query — hits only (≤ k rows per query reach the window input after
    the join, bounded state); a truth-side count and one final
    query-keyed join. Returns ``(query_id, n_ranked, n_rel, n_hits,
    ap_micro)``.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if scale < 1:
        raise ValueError(f"scale must be >= 1, got {scale}")
    for c, side, d in (
        (query_col, "ranked", ranked),
        (doc_col, "ranked", ranked),
        (rank_col, "ranked", ranked),
    ):
        if c not in d.columns:
            raise ValueError(f"column {c!r} not in {side}: {d.columns}")
    for c in (query_col, doc_col):
        if c not in truth.columns:
            raise ValueError(f"column {c!r} not in truth: {truth.columns}")
    d38 = "decimal(38,0)"
    from pyspark.sql.window import Window

    base = ranked.filter(
        F.col(query_col).isNotNull()
        & F.col(doc_col).isNotNull()
        & (F.col(rank_col) >= 1)
        & (F.col(rank_col) <= k)
    ).select(
        F.col(query_col).alias("_q"),
        F.col(doc_col).alias("_d"),
        F.col(rank_col).cast("long").alias("_r"),
    )
    tpairs = (
        truth.filter(
            F.col(query_col).isNotNull() & F.col(doc_col).isNotNull()
        )
        .select(
            F.col(query_col).alias("_q"), F.col(doc_col).alias("_d")
        )
        .distinct()
    )
    nrel = tpairs.groupBy("_q").agg(
        F.count(F.lit(1)).cast("long").alias("n_rel")
    )
    nranked = base.groupBy("_q").agg(
        F.count(F.lit(1)).cast("long").alias("n_ranked")
    )
    hits = base.join(tpairs, ["_q", "_d"])
    w = Window.partitionBy("_q").orderBy("_r")
    terms = hits.select(
        "_q",
        "_r",
        F.count(F.lit(1)).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ).alias("_h"),
    ).select(
        "_q",
        F.expr(f"CAST(CAST(_h AS {d38}) * {scale} div _r AS BIGINT)").alias(
            "_t"
        ),
    )
    ap = terms.groupBy("_q").agg(
        F.sum("_t").cast("long").alias("_sum"),
        F.count(F.lit(1)).cast("long").alias("n_hits"),
    )
    return (
        nranked.join(nrel, "_q", "left")
        .join(ap, "_q", "left")
        .select(
            F.col("_q").alias(query_col),
            "n_ranked",
            F.coalesce("n_rel", F.lit(0)).alias("n_rel"),
            F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
            F.expr(
                f"CASE WHEN n_rel IS NULL OR n_rel = 0 THEN NULL ELSE"
                f" CAST(CAST(coalesce(_sum, 0) AS {d38}) div n_rel"
                f" AS BIGINT) END"
            ).alias("ap_micro"),
        )
    )


def regression_report(
    df: DataFrame,
    *,
    label_col: str = "label",
    pred_col: str = "pred",
    scale: int = 1_000_000,
) -> DataFrame:
    """Regression evaluation — the numeric-target sibling of
    confusion_report: exact integer error moments for a predictor of an
    integral target (quality scores, token counts, latency — quantize
    float targets caller-side, the zorder_key rule). One map-side-
    combinable aggregation, zero joins.

    All exact: ``n``, ``mae_micro = Σ|e|·scale div n``, ``bias_micro =
    Σe·scale floor-div n`` (negative-safe pmod floor — systematic over/
    under-prediction, which MAE hides), ``mse_micro = Σe²·scale div n``,
    and ``r2_milli`` = floor(R²·1000) computed as the exact rational
    ``1 − SSE/SST`` with cross-multiplied integers
    (``(SST−SSE)·n·1000 −` adjusted for the mean term: SST·n =
    n·Σy² − (Σy)²; SSE·n = n·Σe²; both exact longs in DECIMAL(38,0)) —
    NULL when SST = 0 (constant target: undefined, not fake 0/1).
    R² may be negative (model worse than the mean) — the floor device
    is negative-safe.

    NULL label/pred rows are dropped (stated). Returns ONE row:
    ``(n, mae_micro, bias_micro, mse_micro, r2_milli)``.
    """
    if scale < 1:
        raise ValueError(f"scale must be >= 1, got {scale}")
    by_name = {f.name: f.dataType for f in df.schema.fields}
    integral = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
    for c in (label_col, pred_col):
        if c not in by_name:
            raise ValueError(f"column {c!r} not in input: {df.columns}")
        if not isinstance(by_name[c], integral):
            raise ValueError(
                f"column {c!r} must be integral (got {by_name[c]}) — "
                "quantize floats caller-side"
            )
    if label_col == pred_col:
        raise ValueError("label_col and pred_col must differ")
    d38 = "decimal(38,0)"
    agg = (
        df.filter(F.col(label_col).isNotNull() & F.col(pred_col).isNotNull())
        .select(
            F.col(label_col).cast("long").alias("_y"),
            (F.col(pred_col).cast("long") - F.col(label_col).cast("long"))
            .alias("_e"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.abs(F.col("_e"))).cast("long").alias("_sae"),
            F.sum("_e").cast("long").alias("_se"),
            F.sum(F.expr(f"CAST(_e AS {d38}) * _e")).alias("_see"),
            F.sum("_y").cast("long").alias("_sy"),
            F.sum(F.expr(f"CAST(_y AS {d38}) * _y")).alias("_syy"),
        )
    )
    sst = f"(CAST(n AS {d38}) * _syy - CAST(_sy AS {d38}) * _sy)"
    num = f"({sst} - CAST(n AS {d38}) * _see)"
    return agg.select(
        "n",
        F.expr(
            f"CASE WHEN n = 0 THEN NULL ELSE"
            f" CAST(CAST(_sae AS {d38}) * {scale} div n AS BIGINT) END"
        ).alias("mae_micro"),
        F.expr(
            f"CASE WHEN n = 0 THEN NULL ELSE"
            f" CAST((CAST(_se AS {d38}) * {scale}"
            f" - pmod(CAST(_se AS {d38}) * {scale}, n)) / n AS BIGINT) END"
        ).alias("bias_micro"),
        F.expr(
            f"CASE WHEN n = 0 THEN NULL ELSE"
            f" CAST(_see * CAST({scale} AS {d38}) div n AS BIGINT) END"
        ).alias("mse_micro"),
        F.expr(
            f"CASE WHEN n = 0 OR {sst} = 0 THEN NULL ELSE"
            f" CAST(({num} * 1000 - pmod({num} * 1000, {sst}))"
            f" / {sst} AS BIGINT) END"
        ).alias("r2_milli"),
    )


def spearman_corr(
    df: DataFrame,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Exact tie-aware Spearman rank correlation between two integral
    columns — the monotone-association grade (quality score vs human
    rating, length vs tokens) where Pearson assumes linearity and
    Kendall costs a pair join.

    Exactness: both variables take DOUBLED midranks (``2·below + tied
    + 1`` per member, always an odd integer — the ``exact_auc``
    discipline), so every sufficient statistic (Σrx, Σry, Σrx², Σry²,
    Σrx·ry) is an exact DECIMAL(38,0) sum — accumulation-order-proof
    where a float covariance drifts. The classic
    ``ρ = (nΣxy − ΣxΣy) / √(nΣx²−(Σx)²) √(nΣy²−(Σy)²)`` then costs
    exactly two sqrts and one division per OUTPUT ROW (one row total),
    from integers both engines cast identically.

    Distributed shape: ranks are value-functions, so each variable
    collapses to one row per DISTINCT value (the only data-sized
    shuffles, both on longs); midranks come from the ``exact_auc``
    order-preserving bucket machinery — a per-bucket cumulative window
    plus an exclusive prefix over the ≤64 bucket totals (no
    single-partition window over the distinct table, no global sort);
    rows join their two midranks back on long keys; ONE final
    aggregation emits the statistics. No driver collect.

    NULL-x or NULL-y rows are excluded and counted. A constant variable
    has zero rank variance → NULL rho (visible, not 0). Returns one row
    ``(n, n_null, rho)`` with rho rounded to 6 places.
    """
    for c in (x_col, y_col):
        if c not in df.columns:
            raise ValueError(f"column {c!r} not in input: {df.columns}")
    by_name = {f.name: f.dataType for f in df.schema.fields}
    integral = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
    for c in (x_col, y_col):
        if not isinstance(by_name[c], integral):
            raise ValueError(
                f"spearman_corr needs integral variables (quantize floats "
                f"caller-side): {c} is {by_name[c]}"
            )

    x, y = F.col(x_col), F.col(y_col)
    valid = df.select(
        x.cast("long").alias("_x"), y.cast("long").alias("_y")
    ).filter(F.col("_x").isNotNull() & F.col("_y").isNotNull())
    nulls = df.agg(
        F.sum(F.when(x.isNull() | y.isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_null")
    )

    def _ranks(col: str, n_buckets: int = 64) -> DataFrame:
        per = valid.groupBy(F.col(col).alias("_v")).agg(
            F.count(F.lit(1)).cast("long").alias("_n")
        )
        stats = per.agg(F.min("_v").alias("_mn"), F.max("_v").alias("_mx"))
        bucketed = per.crossJoin(F.broadcast(stats)).withColumn(
            "_b", guarded_bucket("_v - _mn", n_buckets, op="spearman_corr")
        )
        w = (
            Window.partitionBy("_b")
            .orderBy("_v")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        local = bucketed.withColumn(
            "_bl", F.coalesce(F.sum("_n").over(w), F.lit(0).cast("long"))
        )
        totals = bucketed.groupBy("_b").agg(F.sum("_n").alias("_bt"))
        wb = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
        offsets = totals.select(
            "_b",
            F.coalesce(F.sum("_bt").over(wb), F.lit(0).cast("long")).alias(
                "_off"
            ),
        )
        return local.join(F.broadcast(offsets), "_b").select(
            "_v",
            (
                F.lit(2) * (F.col("_bl") + F.col("_off"))
                + F.col("_n")
                + F.lit(1)
            )
            .cast("long")
            .alias("_r2"),
        )

    rx = _ranks("_x").select(F.col("_v").alias("_x"), F.col("_r2").alias("_rx"))
    ry = _ranks("_y").select(F.col("_v").alias("_y"), F.col("_r2").alias("_ry"))
    joined = valid.join(rx, "_x").join(ry, "_y")
    d = "CAST({} AS DECIMAL(38,0))"
    agg = joined.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.expr(f"sum({d.format('_rx')})").alias("_sx"),
        F.expr(f"sum({d.format('_ry')})").alias("_sy"),
        F.expr(f"sum({d.format('_rx')} * {d.format('_rx')})").alias("_sxx"),
        F.expr(f"sum({d.format('_ry')} * {d.format('_ry')})").alias("_syy"),
        F.expr(f"sum({d.format('_rx')} * {d.format('_ry')})").alias("_sxy"),
    )
    num = F.col("n") * F.col("_sxy") - F.col("_sx") * F.col("_sy")
    dx = F.col("n") * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    dy = F.col("n") * F.col("_syy") - F.col("_sy") * F.col("_sy")
    rho = F.round(
        num.cast("double")
        / (F.sqrt(dx.cast("double")) * F.sqrt(dy.cast("double"))),
        6,
    )
    return agg.crossJoin(F.broadcast(nulls)).select(
        "n",
        F.coalesce(F.col("n_null"), F.lit(0)).cast("long").alias("n_null"),
        F.when((dx > 0) & (dy > 0), rho).alias("rho"),
    )


def rouge_n(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    cand_col: str = "cand",
    ref_col: str = "ref",
    n: int = 2,
) -> DataFrame:
    """ROUGE-N (Lin, 2004) per candidate/reference pair — the n-gram
    overlap grade summarization/translation training-data curation runs
    before trusting a (document, summary) pair: clipped n-gram matches
    against the reference, reported as recall (ROUGE's headline number),
    precision (= BLEU-n modified precision for one reference), and F1.

    Pinned exactness: tokens are the repo-wide explicit-whitespace
    convention (text.py:NOT_WS, RE2/DuckDB-identical), lowercased;
    n-grams join tokens with the \\x1f unit separator (cannot appear
    inside a token — tokens never contain whitespace and \\x1f is not
    produced by NOT_WS splitting, so gram rendering is injective);
    ``matched = Σ_g min(count_cand(g), count_ref(g))`` is the exact
    clipped multiset intersection; the three scores floor to ppm from
    pure integer counts (F1 needs no float detour:
    ``2·matched·10⁶ div (cand_total + ref_total)``). Empty sides score
    0, not NULL.

    Distributed shape: gram totals are map-side ``size()`` on the gram
    arrays (no shuffle); the clipped intersection is ONE shuffle keyed
    by (pair id, gram) — partial-agg'd counts, then a per-pair sum of
    ``least``. No window, no collect; a hot pair costs its own gram
    count only.

    Returns ``(id_col, cand_grams, ref_grams, matched, recall_ppm,
    precision_ppm, f1_ppm)``.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    for c in (id_col, cand_col, ref_col):
        if c not in df.columns:
            raise ValueError(f"column {c!r} not in input: {df.columns}")
    from nebula_importer_spark.operators.text import _word_ngrams_all

    # grams are space-joined (tokens contain no whitespace, so the
    # rendering is injective) via text.py's shifted zip_with build —
    # measured ~8x faster than per-element slice+array_join
    def grams(col: str):
        return _word_ngrams_all(
            F.lower(F.coalesce(F.col(col), F.lit(""))), n
        )

    base = df.select(
        F.col(id_col).alias("_id"),
        grams(cand_col).alias("_cg"),
        grams(ref_col).alias("_rg"),
    ).localCheckpoint(eager=True)
    totals = base.select(
        "_id",
        F.size("_cg").cast("long").alias("cand_grams"),
        F.size("_rg").cast("long").alias("ref_grams"),
    )
    cc = (
        base.select("_id", F.explode("_cg").alias("_g"))
        .groupBy("_id", "_g")
        .agg(F.count(F.lit(1)).cast("long").alias("_nc"))
    )
    rc = (
        base.select("_id", F.explode("_rg").alias("_g"))
        .groupBy("_id", "_g")
        .agg(F.count(F.lit(1)).cast("long").alias("_nr"))
    )
    matched = (
        cc.join(rc, ["_id", "_g"])
        .groupBy("_id")
        .agg(F.sum(F.least("_nc", "_nr")).cast("long").alias("matched"))
    )
    out = (
        totals.join(matched, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            "cand_grams",
            "ref_grams",
            F.coalesce("matched", F.lit(0)).cast("long").alias("matched"),
        )
        .select(
            id_col,
            "cand_grams",
            "ref_grams",
            "matched",
            F.when(
                F.col("ref_grams") > 0,
                F.expr("matched * 1000000L div ref_grams"),
            ).otherwise(F.lit(0)).cast("long").alias("recall_ppm"),
            F.when(
                F.col("cand_grams") > 0,
                F.expr("matched * 1000000L div cand_grams"),
            ).otherwise(F.lit(0)).cast("long").alias("precision_ppm"),
            F.when(
                F.col("cand_grams") + F.col("ref_grams") > 0,
                F.expr("2 * matched * 1000000L div (cand_grams + ref_grams)"),
            ).otherwise(F.lit(0)).cast("long").alias("f1_ppm"),
        )
    )
    return out


def distinct_ngrams(
    df: DataFrame,
    *,
    group_col: str,
    text_col: str = "text",
    n: int = 2,
) -> DataFrame:
    """Distinct-N diversity (Li et al., 2016) per group — the standard
    degeneracy check on a text slice (a generation run, a domain, a
    dedup survivor set): distinct n-grams over total n-grams. A slice
    whose distinct_ppm collapses is repeating itself.

    Same token/gram conventions as :func:`rouge_n` (NOT_WS tokens,
    lowercased, \\x1f-joined grams). One shuffle keyed by
    (group, gram-hash) — grams shuffle as xxhash64 longs, never as
    strings (the dedup-family discipline; a 64-bit collision inside one
    group is the accepted sketch-family risk, and the count_distinct is
    EXACT over those hashes). Totals partial-aggregate map-side.

    Returns ``(group_col, total_grams, distinct_grams, distinct_ppm)``.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    for c in (group_col, text_col):
        if c not in df.columns:
            raise ValueError(f"column {c!r} not in input: {df.columns}")
    from nebula_importer_spark.operators.text import _word_ngrams_all

    grams = _word_ngrams_all(
        F.lower(F.coalesce(F.col(text_col), F.lit(""))), n
    )
    exploded = df.select(
        F.col(group_col).alias("_grp"), F.explode(grams).alias("_g")
    ).select("_grp", F.xxhash64("_g").alias("_h"))
    out = exploded.groupBy("_grp").agg(
        F.count(F.lit(1)).cast("long").alias("total_grams"),
        F.count_distinct("_h").cast("long").alias("distinct_grams"),
    )
    return out.select(
        F.col("_grp").alias(group_col),
        "total_grams",
        "distinct_grams",
        F.expr("distinct_grams * 1000000L div total_grams")
        .cast("long")
        .alias("distinct_ppm"),
    )


def corpus_bleu(
    df: DataFrame,
    *,
    cand_col: str = "cand",
    ref_col: str = "ref",
    max_n: int = 4,
) -> DataFrame:
    """Corpus-level BLEU (Papineni et al., 2002) over (candidate,
    reference) pairs — the other standard n-gram grade beside
    :func:`rouge_n`: corpus-pooled clipped precisions p_1..p_N, the
    brevity penalty, and ``BLEU = BP · exp(Σ ln p_n / N)``.

    Exactness discipline (the kn_lm/nb micro-nat rule): every count is
    an exact long from one (pair, n, gram)-keyed aggregation; each
    ``ln p_n`` and the BP exponent floor to micro-nats through a fixed
    IEEE chain on the 1-row totals frame, so the only float ops are a
    handful of scalar ln/exp on integer-derived inputs — the same
    accumulation-order-proof shape the gate already hashes for the LM
    scorers. A zero clipped count for any n (BLEU undefined in log
    space) reports ``bleu_micro = 0`` — the standard smoothing-free
    convention, stated rather than NaN'd.

    Distributed shape: tokens/grams are map-side array ops; ONE shuffle
    keyed by (pair, n, gram) produces per-side counts; the clipped sums
    partial-aggregate to a single row. Returns one row:
    ``(cand_len, ref_len, matched_1..N, cand_grams_1..N, bleu_micro)``.
    """
    if not 1 <= max_n <= 8:
        raise ValueError(f"max_n must be in [1, 8], got {max_n}")
    for c in (cand_col, ref_col):
        if c not in df.columns:
            raise ValueError(f"column {c!r} not in input: {df.columns}")
    from nebula_importer_spark.operators.text import NOT_WS

    def toks(col: str):
        return F.expr(
            f"regexp_extract_all(lower(coalesce(`{col}`, '')), '{NOT_WS}+', 0)"
        )

    def grams(tcol, n: int):
        # same shifted zip_with build as _word_ngrams_all, applied to an
        # already-tokenized array (the two legs reuse one tokenization)
        if n == 1:
            return tcol
        sz = F.size(tcol)
        g = tcol
        for k in range(1, n):
            shifted = F.slice(tcol, k + 1, F.greatest(sz - k, F.lit(0)))
            g = F.zip_with(g, shifted, lambda x, y: F.concat(x, F.lit(" "), y))
        return F.filter(g, lambda x: x.isNotNull())

    base = df.select(
        F.monotonically_increasing_id().alias("_pid"),
        toks(cand_col).alias("_ct"),
        toks(ref_col).alias("_rt"),
    ).localCheckpoint(eager=True)

    lens = base.agg(
        F.sum(F.size("_ct")).cast("long").alias("cand_len"),
        F.sum(F.size("_rt")).cast("long").alias("ref_len"),
    )

    legs = None
    for n in range(1, max_n + 1):
        leg = base.select(
            "_pid",
            F.lit(n).alias("_n"),
            grams(F.col("_ct"), n).alias("_cg"),
            grams(F.col("_rt"), n).alias("_rg"),
        )
        legs = leg if legs is None else legs.unionByName(leg)
    cc = (
        legs.select("_pid", "_n", F.explode("_cg").alias("_g"))
        .groupBy("_pid", "_n", "_g")
        .agg(F.count(F.lit(1)).alias("_nc"))
    )
    rc = (
        legs.select("_pid", "_n", F.explode("_rg").alias("_g"))
        .groupBy("_pid", "_n", "_g")
        .agg(F.count(F.lit(1)).alias("_nr"))
    )
    per_n = (
        cc.join(rc, ["_pid", "_n", "_g"], "left")
        .groupBy("_n")
        .agg(
            F.sum(F.least("_nc", F.coalesce("_nr", F.lit(0))))
            .cast("long")
            .alias("_m"),
            F.sum("_nc").cast("long").alias("_c"),
        )
    )
    # pivot the ≤N rows wide on the driver-free path: conditional aggs
    aggs = []
    for n in range(1, max_n + 1):
        aggs.append(
            F.sum(F.when(F.col("_n") == n, F.col("_m")).otherwise(0))
            .cast("long")
            .alias(f"matched_{n}")
        )
        aggs.append(
            F.sum(F.when(F.col("_n") == n, F.col("_c")).otherwise(0))
            .cast("long")
            .alias(f"cand_grams_{n}")
        )
    wide = per_n.agg(*aggs).join(F.broadcast(lens))

    # log-space assembly on the 1-row frame: micro-nat floors per term
    logp_terms = []
    any_zero = F.lit(False)
    for n in range(1, max_n + 1):
        m, c = F.col(f"matched_{n}"), F.col(f"cand_grams_{n}")
        any_zero = any_zero | (m <= 0) | (c <= 0)
        logp_terms.append(
            F.floor(
                F.log(m.cast("double") / c.cast("double")) * F.lit(10**6)
            ).cast("long")
        )
    sum_logp = logp_terms[0]
    for t in logp_terms[1:]:
        sum_logp = sum_logp + t
    bp_exp = F.floor(
        F.least(
            F.lit(0.0),
            F.lit(1.0)
            - F.col("ref_len").cast("double")
            / F.col("cand_len").cast("double"),
        )
        * F.lit(10**6)
    ).cast("long")
    bleu = F.floor(
        F.exp(
            (bp_exp.cast("double") + sum_logp.cast("double") / max_n)
            / F.lit(10**6)
        )
        * F.lit(10**6)
    ).cast("long")
    out = wide.select(
        "cand_len",
        "ref_len",
        *[f"matched_{n}" for n in range(1, max_n + 1)],
        *[f"cand_grams_{n}" for n in range(1, max_n + 1)],
        F.when(any_zero | (F.col("cand_len") <= 0), F.lit(0).cast("long"))
        .otherwise(bleu)
        .alias("bleu_micro"),
    )
    return out
