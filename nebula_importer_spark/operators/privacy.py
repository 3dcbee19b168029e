"""Privacy audits over tabular releases: k-anonymity and l-diversity.

The release-side companion of the PII surface (operators/text.py:
redact_pii scrubs free text; these audit the STRUCTURED columns a
training-data release carries). Definitions are the standard ones —
k-anonymity (Sweeney 2002): every quasi-identifier equivalence class
holds ≥ k rows; l-diversity (Machanavajjhala et al. 2007): every class
shows ≥ l distinct values of the sensitive attribute. Both audits
return the VIOLATING classes (empty output = the release passes), with
group sizes as evidence — the actionable artifact, not a pass/fail bit.

Distributed shape: each audit is one quasi-identifier-keyed aggregation
— count is fully partial-aggregable; count_distinct is the standard
two-phase expand. The violation filter cuts output to the (usually
tiny) failing tail before anything is returned. No row data leaves the
aggregation — the audit itself never materializes the sensitive rows.

Reference analog: none — nebula-importer ships rows as given
(pkg/spec/v3/prop.go renders values verbatim); a pipeline that BUILDS
release tables needs the audit the reference never had to.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _check_cols(qi_cols: list[str]) -> None:
    if not qi_cols:
        raise ValueError("qi_cols must name at least one quasi-identifier")
    if len(set(qi_cols)) != len(qi_cols):
        raise ValueError(f"qi_cols contains duplicates: {qi_cols}")


def k_anonymity_violations(
    df: DataFrame, qi_cols: list[str], k: int
) -> DataFrame:
    """Equivalence classes of the quasi-identifier combination with fewer
    than ``k`` rows — the classes whose members a linking attack can
    narrow below the k-crowd. Returns ``(*qi_cols, group_size)``;
    NULL quasi-identifier values form their own class (SQL GROUP BY
    semantics — identical in any engine, so the audit is gate-checkable).
    """
    _check_cols(qi_cols)
    if k < 2:
        raise ValueError(f"k must be >= 2 for a meaningful audit, got {k}")
    return (
        df.groupBy(*qi_cols)
        .agg(F.count(F.lit(1)).alias("group_size"))
        .filter(F.col("group_size") < k)
    )


def l_diversity_violations(
    df: DataFrame, qi_cols: list[str], sensitive_col: str, l_threshold: int
) -> DataFrame:
    """Equivalence classes whose sensitive attribute shows fewer than
    ``l_threshold`` distinct values — k-anonymity's complement (a class
    of 1000 rows that all share one diagnosis still leaks it). Returns
    ``(*qi_cols, group_size, n_sensitive)``. NULL sensitive values do
    not count toward diversity (count_distinct skips NULL — an unknown
    value discloses nothing and must not inflate the audit)."""
    _check_cols(qi_cols)
    if sensitive_col in qi_cols:
        raise ValueError(
            f"sensitive_col {sensitive_col!r} cannot also be a "
            "quasi-identifier"
        )
    if l_threshold < 2:
        raise ValueError(f"l_threshold must be >= 2, got {l_threshold}")
    return (
        df.groupBy(*qi_cols)
        .agg(
            F.count(F.lit(1)).alias("group_size"),
            F.count_distinct(sensitive_col).alias("n_sensitive"),
        )
        .filter(F.col("n_sensitive") < l_threshold)
    )


def t_closeness_emd(
    df: DataFrame,
    qi_cols: list[str],
    sensitive_col: str,
    *,
    t_threshold_ppm: int = 200_000,
) -> DataFrame:
    """t-closeness audit for an ORDERED sensitive attribute (Li, Li &
    Venkatasubramanian 2007) — the third rung after k-anonymity and
    l-diversity: a class can be large (k-safe) and diverse (l-safe) and
    still leak by SKEW (everyone in it earns top-decile salary). The
    distance between a class's sensitive distribution and the global
    one is the Earth Mover's Distance under the ordered-domain ground
    metric: ``EMD = (1/(m−1)) · Σ_i |Σ_{j≤i}(p_j − q_j)|`` over the m
    observed values.

    Exactness: the cumulative difference is kept as the CROSS-MULTIPLIED
    integer ``cum_class·N_total − cum_global·N_class`` (common
    denominator — no per-class float division), summed exactly in
    int64, and the final report is integer ppm:
    ``emd_ppm = (10⁶·Σ|…|) div (N_class·N_total·(m−1))`` — hash-stable
    at any partitioning. Overflow bound: Σ|…| ≤ m·N_class·N_total must
    stay under 2^63 (audit tables, not event firehoses — documented).

    Distributed shape: one partial-agg'd groupBy on (class, value), one
    on value (global), a per-class ordered cumulative window over the
    OBSERVED value domain (m rows per class — domain-sized, not
    row-sized), and a final per-class agg. NULL sensitive values are
    excluded on BOTH sides (an unknown value discloses nothing).

    Returns classes with ``emd_ppm > t_threshold_ppm``:
    ``(*qi_cols, group_size, emd_ppm)``.
    """
    from pyspark.sql.window import Window as W

    _check_cols(qi_cols)
    if sensitive_col in qi_cols:
        raise ValueError(
            f"sensitive_col {sensitive_col!r} cannot also be a "
            "quasi-identifier"
        )
    if not 0 <= t_threshold_ppm <= 1_000_000:
        raise ValueError(
            f"t_threshold_ppm must be in [0, 1e6], got {t_threshold_ppm}"
        )
    base = df.filter(F.col(sensitive_col).isNotNull())
    gv = base.groupBy(*qi_cols, sensitive_col).agg(
        F.count(F.lit(1)).cast("long").alias("_cnt")
    )
    glob = base.groupBy(sensitive_col).agg(
        F.count(F.lit(1)).cast("long").alias("_gcnt")
    )
    m_total = glob.agg(
        F.count(F.lit(1)).cast("long").alias("_m"),
        F.sum("_gcnt").cast("long").alias("_nt"),
    )
    sizes = gv.groupBy(*qi_cols).agg(
        F.sum("_cnt").cast("long").alias("_nc")
    )
    # every class must see EVERY observed value (p_j = 0 rows included):
    # cross the class list with the global value list, then left-join
    # actual class counts
    classes = sizes.select(*qi_cols, "_nc")
    full = classes.join(F.broadcast(glob)).join(
        gv, [*qi_cols, sensitive_col], "left"
    ).select(
        *qi_cols, "_nc", sensitive_col, "_gcnt",
        F.coalesce(F.col("_cnt"), F.lit(0).cast("long")).alias("_cnt"),
    )
    w = W.partitionBy(*qi_cols).orderBy(sensitive_col)
    cum = full.select(
        *qi_cols, "_nc",
        F.sum("_cnt").over(w).alias("_cc"),
        F.sum("_gcnt").over(w).alias("_cg"),
    )
    per_class = cum.crossJoin(F.broadcast(m_total)).groupBy(
        *qi_cols, "_nc", "_m", "_nt"
    ).agg(
        F.sum(
            F.abs(F.col("_cc") * F.col("_nt") - F.col("_cg") * F.col("_nc"))
        ).cast("long").alias("_s")
    )
    emd_ppm = F.expr("(1000000 * _s) div (_nc * _nt * greatest(_m - 1, 1))")
    return per_class.select(
        *qi_cols,
        F.col("_nc").alias("group_size"),
        emd_ppm.cast("long").alias("emd_ppm"),
    ).filter(F.col("emd_ppm") > t_threshold_ppm)


def mondrian_anonymize(
    df: DataFrame,
    qi_cols: list[str],
    *,
    k: int,
    rounds: int = 8,
) -> DataFrame:
    """Mondrian multidimensional k-anonymization (LeFevre et al.,
    ICDE 2006) — the BUILD step next to this module's audits
    (k_anonymity_violations grades a generalization; this one
    constructs it): recursively cut the quasi-identifier space at
    per-partition medians until no cut can keep both halves ≥ k,
    emitting the generalized boxes a release would publish.

    Deterministic single-cut variant, every rule total-ordered:

    - cut dimension = the widest span (max − min) in the partition,
      ties to the FIRST column in ``qi_cols`` order;
    - cut value = the LOWER MEDIAN (the element at 0-based
      ``(n−1) div 2`` of the sorted multiset — exact_quantiles' p50
      rule), left = ``value ≤ median``;
    - a cut happens iff both sides keep ≥ k rows (tie-heavy medians
      legitimately block a cut — that is Mondrian's strictness, not a
      failure);
    - depth bounded by ``rounds`` ON BOTH ENGINES: a group still
      cuttable after the last round simply stays coarser — k-anonymity
      holds at ANY depth, so the bound trades resolution, never safety.

    QI columns must be integral (quantize floats caller-side — the
    exact_quantiles rule); rows with a NULL QI are dropped (a release
    table needs complete quasi-identifiers; count them upstream).
    Input smaller than k yields the single root box (visibly < k —
    the caller's data is below the privacy floor).

    Distributed shape per round: one group-keyed stats agg, the
    two-pass exact_quantiles median per ACTIVE group (histogram
    selection — no global or per-group sort of data), one left-count
    agg, one broadcast-decision relabel; the relabeled frame is
    localCheckpointed per round (iterative lineage discipline — at
    10^12 rows swap for the connected_components parquet snapshots).
    Active groups only ever shrink.

    Returns one row per final partition:
    ``(group_id, n_rows, <c>_lo, <c>_hi …)`` — ``group_id`` the
    deterministic cut path (``r``, ``rL``, ``rLR`` …).
    """
    from nebula_importer_spark.operators.profile import exact_quantiles

    if not qi_cols:
        raise ValueError("qi_cols must be non-empty")
    if len(set(qi_cols)) != len(qi_cols):
        raise ValueError(f"duplicate qi_cols: {qi_cols}")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    by_name = {f.name: f.dataType for f in df.schema.fields}
    integral = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
    for c in qi_cols:
        if c not in by_name:
            raise ValueError(f"column {c!r} not in input: {df.columns}")
        if not isinstance(by_name[c], integral):
            raise ValueError(
                f"QI column {c!r} must be integral (got {by_name[c]}) — "
                "quantize floats caller-side"
            )
        if c.startswith("_"):
            raise ValueError(f"QI column {c!r} collides with scratch names")
    nd = len(qi_cols)
    cond = F.lit(True)
    for c in qi_cols:
        cond = cond & F.col(c).isNotNull()
    rows = (
        df.select(*[F.col(c).cast("long").alias(c) for c in qi_cols])
        .filter(cond)
        .withColumn("_g", F.lit("r"))
        .localCheckpoint(eager=True)
    )

    def _val_of_dim() -> F.Column:
        expr = F.lit(None).cast("long")
        for i in range(nd - 1, -1, -1):
            expr = F.when(F.col("_dim") == i, F.col(qi_cols[i])).otherwise(
                expr
            )
        return expr

    for _ in range(rounds):
        aggs = [F.count(F.lit(1)).alias("_n")]
        for i, c in enumerate(qi_cols):
            aggs.append(F.min(c).alias(f"_mn{i}"))
            aggs.append(F.max(c).alias(f"_mx{i}"))
        stats = rows.groupBy("_g").agg(*aggs)
        spans = F.array(
            *[
                F.struct(
                    (F.col(f"_mx{i}") - F.col(f"_mn{i}")).alias("s"),
                    F.lit(nd - 1 - i).cast("long").alias("ri"),
                )
                for i in range(nd)
            ]
        )
        best = F.array_max(spans)
        cand = (
            stats.filter(F.col("_n") >= 2 * k)
            .select(
                "_g",
                (F.lit(nd - 1) - best["ri"]).cast("int").alias("_dim"),
                best["s"].alias("_span"),
            )
            .filter(F.col("_span") > 0)
            .localCheckpoint(eager=True)
        )
        if cand.isEmpty():
            break
        melted = rows.join(F.broadcast(cand), "_g").select(
            "_g", _val_of_dim().alias("_val")
        )
        med = exact_quantiles(
            melted, "_val", (50,), group_cols=["_g"]
        ).select("_g", F.col("value").alias("_s"))
        left = (
            melted.join(F.broadcast(med), "_g")
            .groupBy("_g")
            .agg(
                F.sum((F.col("_val") <= F.col("_s")).cast("long")).alias(
                    "_l"
                ),
                F.count(F.lit(1)).alias("_nn"),
            )
        )
        dec = (
            cand.join(med, "_g")
            .join(left, "_g")
            .filter(
                (F.col("_l") >= k) & (F.col("_nn") - F.col("_l") >= k)
            )
            .select("_g", "_dim", "_s")
            .localCheckpoint(eager=True)
        )
        if dec.isEmpty():
            break
        rows = (
            rows.join(F.broadcast(dec), "_g", "left")
            .withColumn(
                "_g",
                F.when(F.col("_dim").isNull(), F.col("_g")).otherwise(
                    F.concat(
                        F.col("_g"),
                        F.when(
                            _val_of_dim() <= F.col("_s"), F.lit("L")
                        ).otherwise(F.lit("R")),
                    )
                ),
            )
            .drop("_dim", "_s")
            .localCheckpoint(eager=True)
        )
    out_aggs = [F.count(F.lit(1)).cast("long").alias("n_rows")]
    for c in qi_cols:
        out_aggs.append(F.min(c).alias(f"{c}_lo"))
        out_aggs.append(F.max(c).alias(f"{c}_hi"))
    return rows.groupBy(F.col("_g").alias("group_id")).agg(*out_aggs)


def pseudonymize(
    df: DataFrame,
    cols: list[str],
    *,
    salt: str,
    prefix: str = "tok_",
) -> DataFrame:
    """Deterministic pseudonymization: replace identifier columns with
    salted md5 tokens — the share-with-a-vendor / cross-team-join
    release transform that k_anonymity_violations and
    l_diversity_violations AUDIT but don't BUILD (mondrian_anonymize
    generalizes quasi-identifiers; this tokenizes direct identifiers).

    The token is ``prefix + md5(salt ‖ column-name ‖ '|' ‖ value)[:16]``
    — deterministic per (column, value), so referential consistency
    survives: equi-joins on a tokenized key yield EXACTLY the pairs the
    raw key would (the property that makes tokenized releases still
    analyzable), while the same value in DIFFERENT columns gets
    different tokens (column name in the hash — no cross-column linkage
    for free). NULL stays NULL (absence is not an identifier). Map-only
    — zero shuffles, whole-stage-codegen'd md5.

    Security contract (stated plainly): md5 here is a keyed DETERMINISTIC
    token, not an anonymization proof — with a weak salt or a guessable
    value space it is dictionary-reversible; treat the salt as a secret
    and the output as pseudonymous, not anonymous (GDPR terms). Use
    :func:`pseudonym_mapping` for the escrow table.
    """
    if not cols:
        raise ValueError("cols must be non-empty")
    if not salt:
        raise ValueError("salt must be non-empty (it is the token key)")
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"columns not in the frame: {missing}")
    out = df
    for c in cols:
        tok = F.concat(
            F.lit(prefix),
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(salt),
                        F.lit(c),
                        F.lit("|"),
                        F.col(c).cast("string"),
                    )
                ),
                1,
                16,
            ),
        )
        out = out.withColumn(
            c, F.when(F.col(c).isNull(), F.lit(None)).otherwise(tok)
        )
    return out


def pseudonym_mapping(
    df: DataFrame,
    col: str,
    *,
    salt: str,
    prefix: str = "tok_",
) -> DataFrame:
    """The escrow table for :func:`pseudonymize`: one row per DISTINCT
    non-NULL value of ``col`` with its token — re-identification under
    controlled access, and the audit artifact proving token uniqueness
    (collisions in md5-16 are birthday-bounded ~2³²; check
    ``n_distinct(token) == n_distinct(value)`` downstream on release-
    critical columns). One distinct exchange on the value."""
    if col not in df.columns:
        raise ValueError(f"column {col!r} not in the frame: {df.columns}")
    if not salt:
        raise ValueError("salt must be non-empty (it is the token key)")
    vals = df.filter(F.col(col).isNotNull()).select(col).distinct()
    return vals.select(
        F.col(col).alias("value"),
        F.concat(
            F.lit(prefix),
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(salt),
                        F.lit(col),
                        F.lit("|"),
                        F.col(col).cast("string"),
                    )
                ),
                1,
                16,
            ),
        ).alias("token"),
    )
