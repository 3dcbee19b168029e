"""Shared order-preserving equal-width bucket arithmetic with the int64
headroom guard.

Every two-level prefix-sum rank computation in the repo buckets values
as ``((v - mn) * n_buckets) div (mx - mn + 1)``. That product silently
wraps int64 when the value span reaches ``2^62 div n_buckets`` (e.g.
hash-like longs), producing NEGATIVE buckets that corrupt the
order-preserving prefix sums downstream — a wrong-answer bug, not a
crash. ``balanced_shards`` guarded its id span this way from the start;
this module makes the same fail-loud guard the shared path for every
value-bucketed rank computation (exact AUC, Spearman, quantile
normalization, vocab growth, join-size estimation, temporal splits,
PSI cells, ...).

``try_subtract`` pins the overflow-of-the-span-itself case: a span
past int64 yields NULL, which fails the guard and raises — identical
behavior under ANSI-on and ANSI-off sessions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def guarded_bucket(
    offset_sql: str,
    n_buckets: int,
    *,
    mn: str = "_mn",
    mx: str = "_mx",
    op: str,
) -> Column:
    """Bucket index ``(offset * n_buckets) div (mx - mn + 1)`` as exact
    long math, raising (instead of wrapping negative) when the
    ``mn..mx`` span is too wide for the product to stay inside int64.

    ``offset_sql`` is a SQL fragment whose value is in ``[0, mx - mn]``
    (typically ``"_v - _mn"``; balanced_shards' descending weight side
    uses ``"_mx - _w"``). ``mn``/``mx`` are column names from an
    already-joined 1-row (or per-group) bounds frame. The guard is
    per-row but the bounds are constant per group, so it costs nothing
    measurable; when it holds, ``offset <= mx - mn`` guarantees every
    intermediate fits in int64.
    """
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    limit = (2**62) // n_buckets
    span = F.try_subtract(F.col(mx), F.col(mn))
    return F.when(
        span.isNotNull() & (span >= 0) & (span < limit),
        F.expr(f"(({offset_sql}) * {n_buckets}) div ({mx} - {mn} + 1)"),
    ).otherwise(
        F.raise_error(
            F.lit(
                f"{op}: value span too wide for exact bucket arithmetic "
                "— quantize or remap values to a denser range first"
            )
        ).cast("long")
    )
