"""Row-filter DSL → Spark SQL expression.

The reference compiles a boolean expression over ``Record[i]`` with expr-lang
once per tag/edge and silently skips rows evaluating false
(pkg/spec/base/filter.go:13-34; grammar docs/filter-expression.md:1-35:
``== != < > <= >=``, ``not``/``!``, ``and``/``&&``, ``or``/``||``,
indexing ``Record[i]``). That grammar is a strict subset of Spark SQL, so the
translation is purely syntactic: ``Record[i]`` becomes a reference to the
i-th source column *cast to string* (record values are strings in the
reference, so comparisons must be string comparisons).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, functions as F

_RECORD_REF = re.compile(r"Record\[(\d+)\]")
_BANG_NOT = re.compile(r"!(?!=)")  # standalone ! (but not !=) → NOT


class FilterError(ValueError):
    pass


def translate_filter(expr: str, cols: list[str]) -> str:
    """Return a Spark SQL boolean expression string."""

    def _ref(m: re.Match[str]) -> str:
        i = int(m.group(1))
        if i >= len(cols):
            raise FilterError(f"filter references Record[{i}] but row width is {len(cols)}")
        return f"cast(`{cols[i]}` as string)"

    out = _RECORD_REF.sub(_ref, expr)
    out = out.replace("&&", " and ").replace("||", " or ")
    out = _BANG_NOT.sub(" not ", out)
    return out


def compile_filter(expr: str, cols: list[str]) -> Column:
    """Filter DSL string → boolean Column (rows failing are silently skipped,
    not rejected — reference pkg/spec/v3/node.go:160-167)."""
    return F.expr(translate_filter(expr, cols))
