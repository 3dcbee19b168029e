"""Data-quality gates: declarative constraint validation and keyed
snapshot diff.

The reference validates per-row at parse time against its YAML schema
and writes rejects (/root/reference/pkg/reader/reader.go, the
failed-row files of /root/reference/pkg/manager); a 100-TB pipeline
additionally needs TABLE-level contracts — "this key is unique",
"this FK resolves", "tonight's snapshot changed only what the upstream
said it would" — checked before a bad drop poisons a training run.
This module is the Deequ-style half of that story (profile.py is the
discovery half: you profile an unknown source, then pin what you
learned as constraints here).

Distributed shape: every row-local rule (non-null, range, membership,
regex) compiles into ONE shared aggregation pass — adding rules adds
columns to the agg, not jobs. Uniqueness adds one partial-agg'd
groupBy on the rule's key; referential integrity adds one left-anti
join against the (distinct, usually broadcast-sized) referenced keys.
Outputs are rule-per-row integer counts — exact, engine-stable,
gate-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: rule kinds accepted by :func:`dq_constraints`
_KINDS = ("not_null", "unique", "in_set", "in_range", "matches", "ref")


def dq_constraints(
    df: DataFrame,
    rules: list[dict],
) -> DataFrame:
    """Validate declarative constraints; returns one row per rule:
    ``(rule, kind, n_violations, passed)`` ordered as given.

    Rule shapes (dicts, ``name`` optional — defaults to a derived id):

    - ``{"kind": "not_null", "col": c}`` — NULL values
    - ``{"kind": "unique", "cols": [c, ...]}`` — rows beyond the first
      per duplicated key (NULL keys participate like values, as in a
      uniqueness index audit)
    - ``{"kind": "in_set", "col": c, "values": [...]}`` — non-NULL
      values outside the set (NULL is a not_null concern, not a set one)
    - ``{"kind": "in_range", "col": c, "lo": x, "hi": y}`` — non-NULL
      values outside ``[lo, hi]``
    - ``{"kind": "matches", "col": c, "pattern": re2}`` — non-NULL
      values not fully matching (RE2-safe patterns only — the oracle is
      RE2; same discipline as text.py's explicit classes)
    - ``{"kind": "ref", "col": c, "ref": other_df, "ref_col": k}`` —
      non-NULL values with no match in the referenced key set (SQL FK
      semantics: NULL FKs are not violations)

    All row-local rules share ONE aggregation pass; each unique rule is
    one partial-agg'd groupBy; each ref rule is one anti-join against
    the referenced distinct keys (broadcast when dimension-sized — the
    usual case).
    """
    if not rules:
        raise ValueError("rules must be non-empty")
    row_local_aggs: list = []
    row_local_meta: list[tuple[str, str, str]] = []  # (alias, name, kind)
    extra_rows: list[tuple[str, str, DataFrame]] = []

    def _col_of(rule: dict, key: str = "col") -> str:
        c = rule.get(key)
        if not c or c not in df.columns:
            raise ValueError(f"rule {rule}: column {c!r} not in {df.columns}")
        return c

    for idx, rule in enumerate(rules):
        kind = rule.get("kind")
        if kind not in _KINDS:
            raise ValueError(f"rule {rule}: kind must be one of {_KINDS}")
        if kind == "not_null":
            c = _col_of(rule)
            name = rule.get("name", f"not_null:{c}")
            row_local_aggs.append(
                F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
                .cast("long").alias(f"_r{idx}")
            )
            row_local_meta.append((f"_r{idx}", name, kind))
        elif kind == "in_set":
            c = _col_of(rule)
            vals = rule.get("values")
            if not vals:
                raise ValueError(f"rule {rule}: values must be non-empty")
            name = rule.get("name", f"in_set:{c}")
            row_local_aggs.append(
                F.sum(
                    F.when(
                        F.col(c).isNotNull() & ~F.col(c).isin(list(vals)), 1
                    ).otherwise(0)
                ).cast("long").alias(f"_r{idx}")
            )
            row_local_meta.append((f"_r{idx}", name, kind))
        elif kind == "in_range":
            c = _col_of(rule)
            lo, hi = rule.get("lo"), rule.get("hi")
            if lo is None or hi is None:
                raise ValueError(f"rule {rule}: lo and hi are required")
            name = rule.get("name", f"in_range:{c}")
            row_local_aggs.append(
                F.sum(
                    F.when(
                        F.col(c).isNotNull()
                        & ((F.col(c) < F.lit(lo)) | (F.col(c) > F.lit(hi))),
                        1,
                    ).otherwise(0)
                ).cast("long").alias(f"_r{idx}")
            )
            row_local_meta.append((f"_r{idx}", name, kind))
        elif kind == "matches":
            c = _col_of(rule)
            pat = rule.get("pattern")
            if not pat:
                raise ValueError(f"rule {rule}: pattern is required")
            name = rule.get("name", f"matches:{c}")
            row_local_aggs.append(
                F.sum(
                    F.when(
                        F.col(c).isNotNull()
                        & ~F.col(c).rlike(f"^(?:{pat})$"),
                        1,
                    ).otherwise(0)
                ).cast("long").alias(f"_r{idx}")
            )
            row_local_meta.append((f"_r{idx}", name, kind))
        elif kind == "unique":
            cols = rule.get("cols")
            if not cols or any(c not in df.columns for c in cols):
                raise ValueError(f"rule {rule}: cols must all exist")
            name = rule.get("name", "unique:" + ",".join(cols))
            dups = (
                df.groupBy(*cols)
                .agg(F.count(F.lit(1)).alias("_n"))
                .agg(
                    F.coalesce(
                        F.sum(F.when(F.col("_n") > 1, F.col("_n") - 1)),
                        F.lit(0),
                    ).cast("long").alias("n_violations")
                )
            )
            extra_rows.append((name, kind, dups))
        else:  # ref
            c = _col_of(rule)
            ref, ref_col = rule.get("ref"), rule.get("ref_col")
            if ref is None or not ref_col or ref_col not in ref.columns:
                raise ValueError(f"rule {rule}: ref/ref_col are required")
            name = rule.get("name", f"ref:{c}->{ref_col}")
            keys = ref.select(F.col(ref_col).alias(c)).filter(
                F.col(c).isNotNull()
            ).distinct()
            miss = (
                df.filter(F.col(c).isNotNull())
                .join(keys, c, "left_anti")
                .agg(F.count(F.lit(1)).cast("long").alias("n_violations"))
            )
            extra_rows.append((name, kind, miss))

    parts: list[DataFrame] = []
    if row_local_aggs:
        one = df.agg(*row_local_aggs)
        melted = one.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(name).alias("rule"),
                            F.lit(kind).alias("kind"),
                            F.coalesce(
                                F.col(alias), F.lit(0).cast("long")
                            ).alias("n_violations"),
                        )
                        for alias, name, kind in row_local_meta
                    ]
                )
            ).alias("_s")
        ).select("_s.rule", "_s.kind", "_s.n_violations")
        parts.append(melted)
    for name, kind, cnt in extra_rows:
        parts.append(
            cnt.select(
                F.lit(name).alias("rule"),
                F.lit(kind).alias("kind"),
                F.col("n_violations"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select(
        "rule", "kind", "n_violations",
        (F.col("n_violations") == 0).alias("passed"),
    )


def table_diff(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Keyed snapshot diff — the "what actually changed between
    yesterday's table and today's" audit: returns one row per metric,
    ``(metric, n)`` with ``added`` (key only in right), ``removed``
    (key only in left), ``changed`` (key in both, any compared column
    differs), ``unchanged``, and one ``changed:<col>`` row per compared
    column. Comparison is null-safe (``<=>``): NULL==NULL is unchanged,
    NULL→value is a change.

    Distributed shape: ONE full-outer join on the key (the join both
    sides would need for ANY diff semantics) and one aggregation pass
    computing every metric simultaneously — per-column counters are
    extra agg columns, not extra jobs. Duplicate keys are the caller's
    contract (enforce with dq_constraints' unique rule first); a dup
    key would make "the" diff ill-defined.
    """
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    for c in key_cols:
        if c not in left.columns or c not in right.columns:
            raise ValueError(f"key column {c!r} must be in both frames")
    cmp_cols = compare_cols or [
        c for c in left.columns if c not in key_cols and c in right.columns
    ]
    for c in cmp_cols:
        if c not in left.columns or c not in right.columns:
            raise ValueError(f"compare column {c!r} must be in both frames")
    l = left.select(
        *[F.col(c).alias(f"_lk_{c}") for c in key_cols],
        *[F.col(c).alias(f"_l_{c}") for c in cmp_cols],
        F.lit(1).alias("_in_l"),
    )
    r = right.select(
        *[F.col(c).alias(f"_rk_{c}") for c in key_cols],
        *[F.col(c).alias(f"_r_{c}") for c in cmp_cols],
        F.lit(1).alias("_in_r"),
    )
    cond = None
    for c in key_cols:
        t = F.col(f"_lk_{c}") == F.col(f"_rk_{c}")
        cond = t if cond is None else (cond & t)
    j = l.join(r, cond, "full_outer")
    col_changed = {
        c: F.when(
            F.col("_in_l").isNotNull()
            & F.col("_in_r").isNotNull()
            & ~F.col(f"_l_{c}").eqNullSafe(F.col(f"_r_{c}")),
            1,
        ).otherwise(0)
        for c in cmp_cols
    }
    any_changed = None
    for c in cmp_cols:
        any_changed = (
            col_changed[c]
            if any_changed is None
            else F.greatest(any_changed, col_changed[c])
        )
    if any_changed is None:
        any_changed = F.lit(0)
    agg = j.agg(
        F.sum(
            F.when(F.col("_in_l").isNull(), 1).otherwise(0)
        ).cast("long").alias("_added"),
        F.sum(
            F.when(F.col("_in_r").isNull(), 1).otherwise(0)
        ).cast("long").alias("_removed"),
        F.sum(
            F.when(
                F.col("_in_l").isNotNull() & F.col("_in_r").isNotNull(),
                any_changed,
            ).otherwise(0)
        ).cast("long").alias("_changed"),
        F.sum(
            F.when(
                F.col("_in_l").isNotNull() & F.col("_in_r").isNotNull(),
                1 - any_changed,
            ).otherwise(0)
        ).cast("long").alias("_unchanged"),
        *[
            F.sum(col_changed[c]).cast("long").alias(f"_cc_{i}")
            for i, c in enumerate(cmp_cols)
        ],
    )
    rows = [
        F.struct(F.lit("added").alias("metric"),
                 F.coalesce(F.col("_added"), F.lit(0)).alias("n")),
        F.struct(F.lit("removed").alias("metric"),
                 F.coalesce(F.col("_removed"), F.lit(0)).alias("n")),
        F.struct(F.lit("changed").alias("metric"),
                 F.coalesce(F.col("_changed"), F.lit(0)).alias("n")),
        F.struct(F.lit("unchanged").alias("metric"),
                 F.coalesce(F.col("_unchanged"), F.lit(0)).alias("n")),
        *[
            F.struct(
                F.lit(f"changed:{c}").alias("metric"),
                F.coalesce(F.col(f"_cc_{i}"), F.lit(0)).alias("n"),
            )
            for i, c in enumerate(cmp_cols)
        ],
    ]
    return agg.select(F.explode(F.array(*rows)).alias("_s")).select(
        "_s.metric", F.col("_s.n").cast("long").alias("n")
    )


#: floor(log10(1 + 1/d) · 10^6) for d = 1..9 — Benford's law in exact ppm.
#: Precomputed plan CONSTANTS (no runtime log, no float in either engine).
BENFORD_PPM = {
    1: 301029, 2: 176091, 3: 124938, 4: 96910, 5: 79181,
    6: 66946, 7: 57991, 8: 51152, 9: 45757,
}


def benford_audit(df: DataFrame, cols: list[str]) -> DataFrame:
    """First-significant-digit distribution vs Benford's law — the
    classic fabricated-/synthetic-data and unit-mixup detector for
    amount-like columns (Nigrini's forensic-accounting test applied to
    pipeline DQ: a column whose digits suddenly stop being Benford has
    usually changed units, pipelines, or honesty upstream).

    Exact everywhere: the leading digit comes from the integer's STRING
    rendering (no log10 float — both engines render longs identically),
    expected frequencies are precomputed ppm constants, and the per-
    column distance is the cleared-denominator chi-square analogue
    ``chi2_scaled = Σ_d (O_d·10⁶ − N·e_d)² div (N·e_d)`` — one
    truncating DECIMAL(38,0) div per digit, order-free. Zero and NULL
    values are excluded (they have no significant digit) and counted;
    MISSING digits still emit a row with ``n_obs = 0`` (an absent digit
    is the loudest Benford signal, so the 9-digit grid is dense).

    Integral columns only (quantize floats caller-side — floor a price
    to cents/dollars first). One melt pass + one (column, digit) agg —
    at most ``9·len(cols)`` result rows; a broadcast 9-row grid join
    densifies. Columns with no qualifying rows are absent entirely.

    Returns ``(column, digit, n_obs, observed_ppm, expected_ppm,
    chi2_scaled, n_total, n_excluded)``.
    """
    from pyspark.sql import types as T

    if not cols:
        raise ValueError("benford_audit needs at least one column")
    by_name = {f.name: f.dataType for f in df.schema.fields}
    integral = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
    for c in cols:
        if c not in by_name:
            raise ValueError(f"column {c!r} not in input: {df.columns}")
        if not isinstance(by_name[c], integral):
            raise ValueError(
                f"column {c!r} must be integral (got {by_name[c]}) — "
                "quantize floats caller-side"
            )
    d38 = "decimal(38,0)"
    spark = df.sparkSession
    legs = [
        df.select(
            F.lit(c).alias("column"),
            F.substring(F.abs(F.col(c)).cast("string"), 1, 1)
            .cast("long")
            .alias("digit"),
            F.when(
                F.col(c).isNull() | (F.col(c) == 0), F.lit(1)
            )
            .otherwise(F.lit(0))
            .alias("_ex"),
        )
        for c in cols
    ]
    melted = legs[0]
    for leg in legs[1:]:
        melted = melted.unionByName(leg)
    counts = (
        melted.groupBy("column")
        .agg(
            F.sum(F.lit(1) - F.col("_ex")).cast("long").alias("n_total"),
            F.sum("_ex").cast("long").alias("n_excluded"),
        )
        .filter(F.col("n_total") > 0)
    )
    per_digit = (
        melted.filter(F.col("_ex") == 0)
        .groupBy("column", "digit")
        .agg(F.count(F.lit(1)).cast("long").alias("n_obs"))
    )
    grid = spark.createDataFrame(
        [(d, e) for d, e in BENFORD_PPM.items()],
        "digit long, expected_ppm long",
    )
    dense = (
        counts.crossJoin(F.broadcast(grid))
        .join(per_digit, ["column", "digit"], "left")
        .select(
            "column",
            "digit",
            F.coalesce("n_obs", F.lit(0)).cast("long").alias("n_obs"),
            "expected_ppm",
            "n_total",
            "n_excluded",
        )
    )
    term = F.expr(
        f"((CAST(n_obs AS {d38}) * 1000000 - CAST(n_total AS {d38}) *"
        f" expected_ppm) * (CAST(n_obs AS {d38}) * 1000000 -"
        f" CAST(n_total AS {d38}) * expected_ppm))"
        f" div (CAST(n_total AS {d38}) * expected_ppm)"
    )
    chi = dense.select("column", term.alias("_t")).groupBy("column").agg(
        F.sum("_t").cast("long").alias("chi2_scaled")
    )
    return dense.join(F.broadcast(chi), "column").select(
        "column",
        "digit",
        "n_obs",
        F.expr("(CAST(n_obs AS DECIMAL(38,0)) * 1000000) div n_total")
        .cast("long")
        .alias("observed_ppm"),
        "expected_ppm",
        "chi2_scaled",
        "n_total",
        "n_excluded",
    )


def referential_integrity(
    child: DataFrame,
    parent: DataFrame,
    *,
    fk_cols: list[str],
    pk_cols: list[str],
    scale: int = 1_000_000,
) -> DataFrame:
    """Cross-table referential-integrity audit: how many child rows
    point at a parent key that doesn't exist — the join-safety gate a
    pipeline runs before an inner join silently drops orphans (or a
    snapshot load half-succeeded). fd_violations audits WITHIN a table;
    this audits the FK edge BETWEEN tables.

    SQL FK semantics (stated): a child row with any NULL FK column is
    exempt (counted in ``n_null_fk``, never an orphan — the MATCH
    SIMPLE rule); the parent side is deduplicated on the key. Shape:
    one distinct on the parent key (dimension-sized, broadcast-able by
    the optimizer) + ONE anti-join; counts ride a single aggregation.
    ``orphan_ppm`` is exact over the CHECKED rows (non-NULL-FK), NULL
    when nothing was checkable (0/0 undefined, the fd_violations
    discipline).

    Returns ONE row: ``(n_child, n_null_fk, n_checked, n_orphans,
    n_orphan_keys, holds, orphan_ppm)``.
    """
    if scale < 1:
        raise ValueError(f"scale must be >= 1, got {scale}")
    if not fk_cols or not pk_cols:
        raise ValueError("fk_cols and pk_cols must be non-empty")
    if len(fk_cols) != len(pk_cols):
        raise ValueError(
            f"fk_cols ({len(fk_cols)}) and pk_cols ({len(pk_cols)}) "
            "must have the same arity"
        )
    for c in fk_cols:
        if c not in child.columns:
            raise ValueError(f"column {c!r} not in child: {child.columns}")
    for c in pk_cols:
        if c not in parent.columns:
            raise ValueError(f"column {c!r} not in parent: {parent.columns}")
    d38 = "decimal(38,0)"
    fk = [F.col(c).alias(f"_k{i}") for i, c in enumerate(fk_cols)]
    pk = [F.col(c).alias(f"_k{i}") for i, c in enumerate(pk_cols)]
    keys = [f"_k{i}" for i in range(len(fk_cols))]
    some_null = None
    for k in keys:
        cond = F.col(k).isNull()
        some_null = cond if some_null is None else (some_null | cond)
    c_rows = child.select(*fk)
    n_child = c_rows.count()
    checked = c_rows.filter(~some_null)
    pkeys = parent.select(*pk).distinct()
    orphans = checked.join(pkeys, keys, "left_anti")
    agg = orphans.agg(
        F.count(F.lit(1)).cast("long").alias("n_orphans"),
        F.count_distinct(*[F.col(k) for k in keys])
        .cast("long")
        .alias("n_orphan_keys"),
    ).crossJoin(
        checked.agg(F.count(F.lit(1)).cast("long").alias("n_checked"))
    )
    return agg.select(
        F.lit(n_child).cast("long").alias("n_child"),
        (F.lit(n_child) - F.col("n_checked")).cast("long").alias("n_null_fk"),
        "n_checked",
        "n_orphans",
        "n_orphan_keys",
        (F.col("n_orphans") == 0).alias("holds"),
        F.expr(
            f"CASE WHEN n_checked = 0 THEN NULL ELSE CAST("
            f"CAST(n_orphans AS {d38}) * {scale} div n_checked"
            f" AS BIGINT) END"
        ).alias("orphan_ppm"),
    )


def table_fingerprint(
    df: DataFrame,
    columns: list[str],
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Order-insensitive table fingerprint — a constant-size digest two
    pipelines (or two snapshots, or Spark and a replica engine) can
    compare to decide "same multiset of rows?" without shipping or
    joining the data: the reconciliation primitive behind
    migration sign-off and cross-cluster copies, where ``table_diff``
    (which needs both tables co-located) is the expensive follow-up run
    only when fingerprints disagree.

    Digest contract (pinned, engine-reproducible): each row renders
    canonically — the listed ``columns`` IN THE GIVEN ORDER, values as
    canonical strings, ESCAPED so the rendering is injective
    (``\\`` → ``\\\\``, then ``|`` → ``\\|``, then NUL → ``\\0`` —
    without this, rows ``('a|b','c')`` and ``('a','b|c')`` would render
    identically), NULLs as the ``NUL+"null"`` sentinel (a raw NUL can
    never survive escaping, so the sentinel cannot collide with any
    value), joined by ``|`` — then hashes to a 52-bit integer (first 13
    hex digits of md5, the sketch-family hash), and the fingerprint is
    the exact SUM
    of row hashes mod 2^62 (DECIMAL(38,0) internally — a BIGINT sum
    wraps past ~2000 G rows). Sum is commutative/associative, so the
    digest is independent of layout, partitioning, and row order, and
    ANY single-row difference changes it (equal multisets ⟹ equal
    digests; a collision needs an adversarial 52-bit match). Float
    columns must be quantized caller-side (their string renderings are
    not engine-pinned — the exact_auc rule).

    One map pass + one partial-agg'd aggregation (per group with
    ``group_cols`` — partition-level reconciliation — or one global
    row). Returns ``(*group_cols, n_rows, fingerprint)``.
    """
    if not columns:
        raise ValueError("columns must be a non-empty list")
    groups = list(group_cols or [])
    for c in [*columns, *groups]:
        if c not in df.columns:
            raise ValueError(f"column {c!r} not in input: {df.columns}")
    overlap = set(columns) & set(groups)
    if overlap:
        raise ValueError(f"group_cols overlap digest columns: {sorted(overlap)}")
    from pyspark.sql import types as T

    floaty = (T.FloatType, T.DoubleType)
    by_name = {f.name: f.dataType for f in df.schema.fields}
    for c in columns:
        if isinstance(by_name[c], floaty):
            raise ValueError(
                f"table_fingerprint needs engine-pinned renderings: "
                f"quantize float column {c!r} caller-side"
            )

    def _esc(c: str):
        # escape order matters: backslash first, then the delimiter and
        # the NUL used by the NULL sentinel — rendering stays injective
        v = F.col(c).cast("string")
        v = F.replace(v, F.lit("\\"), F.lit("\\\\"))
        v = F.replace(v, F.lit("|"), F.lit("\\|"))
        v = F.replace(v, F.lit("\x00"), F.lit("\\0"))
        return F.coalesce(v, F.lit("\x00null"))

    rendered = F.concat_ws("|", *[_esc(c) for c in columns])
    h = F.conv(F.substring(F.md5(rendered), 1, 13), 16, 10).cast("long")
    base = df.select(*groups, h.alias("_h"))
    agg = base.groupBy(*groups) if groups else base.groupBy()
    out = agg.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.expr(
            f"CAST(sum(CAST(_h AS DECIMAL(38,0))) % {2**62} AS BIGINT)"
        ).alias("fingerprint"),
    )
    return out
