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
