"""Row-filter DSL → Spark SQL expression.

The reference compiles a boolean expression over ``Record[i]`` with expr-lang
once per tag/edge and silently skips rows evaluating false
(pkg/spec/base/filter.go:13-34; grammar docs/filter-expression.md:1-35:
``== != < > <= >=``, ``not``/``!``, ``and``/``&&``, ``or``/``||``,
indexing ``Record[i]``). That grammar is a strict subset of Spark SQL, so the
translation is purely syntactic: ``Record[i]`` becomes a reference to the
i-th source column *cast to string* (record values are strings in the
reference, so comparisons must be string comparisons).

Two deliberate properties of the translator:

1. **String literals are opaque.** Substitution (``Record[i]``, ``&&``,
   ``||``, ``!``) happens ONLY outside quoted literals — ``Record[0] !=
   "a&&b"`` keeps its literal intact, and ``== "no!"`` does not grow a
   ``not``. The expression is tokenized around literals first (both quote
   styles, with backslash escapes — expr-lang accepts both).
2. **The grammar is validated, not passed through.** expr-lang is a full
   expression language; everything outside the supported grammar raises
   :class:`FilterError` at config-validate/compile time instead of falling
   through to Spark SQL with possibly different semantics mid-job.

Beyond the documented subset, the translator maps the expr-lang built-ins
whose semantics carry over 1:1 (the reference compiles the FULL language,
so real-world configs use these):

   ``x in ["a", "b"]``      → ``x in ('a', 'b')``
   ``s matches "^re$"``     → ``s rlike '^re$'``
   ``len(s)``               → ``length(s)``  (char count on strings)
   ``hasPrefix(s, p)``      → ``startswith(s, p)``
   ``hasSuffix(s, p)``      → ``endswith(s, p)``
   ``abs/upper/lower/trim`` → same name in Spark SQL

Deliberately NOT mapped (semantics differ or need real parsing, and no
reference example uses them): arithmetic (record values are strings, so
expr-lang ``+`` concatenates where Spark would numeric-cast — silent
divergence), closures (``all/any/filter/map``), ``contains``/
``startsWith`` as infix operators, ``indexOf`` (0- vs 1-based),
method-call syntax. These fail validation with a clear error.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, functions as F

_RECORD_REF = re.compile(r"Record\[(\d+)\]")
_BANG_NOT = re.compile(r"!(?!=)")  # standalone ! (but not !=) → NOT
# A quoted literal in either style; backslash escapes any next char.
_STRING_LIT = re.compile(r'"(?:[^"\\]|\\.)*"|\'(?:[^\'\\]|\\.)*\'')
# Tokens legal OUTSIDE literals once Record refs are resolved. Order matters:
# multi-char operators before their single-char prefixes. Mapped built-in
# function names must be CALLED (paren lookahead) — a bare `len` is an
# unresolvable identifier in Spark SQL, so it fails here instead.
_TOKEN = re.compile(
    r"\s+|==|!=|<=|>=|&&|\|\||[<>()!,\[\]]"
    r"|\b(?:and|or|not|true|false|in|matches)\b"
    r"|\b(?:len|abs|upper|lower|trim|hasPrefix|hasSuffix)\b(?=\s*\()"
    r"|-?\d+(?:\.\d+)?"
)
# expr-lang built-in → Spark SQL function (names already identical pass
# through via the token above: abs, upper, lower, trim).
_FN_RENAMES = [
    (re.compile(r"\blen\s*\("), "length("),
    (re.compile(r"\bhasPrefix\s*\("), "startswith("),
    (re.compile(r"\bhasSuffix\s*\("), "endswith("),
    (re.compile(r"\bmatches\b"), "rlike"),
]


class FilterError(ValueError):
    pass


def _map_segments(expr: str, fn) -> str:
    """Apply ``fn`` to the parts of ``expr`` outside quoted string literals;
    literals pass through byte-identical. An unterminated quote is a grammar
    error (expr-lang would reject it too)."""
    out: list[str] = []
    last = 0
    for m in _STRING_LIT.finditer(expr):
        out.append(fn(expr[last : m.start()]))
        out.append(m.group(0))
        last = m.end()
    tail = expr[last:]
    if '"' in tail or "'" in tail:
        raise FilterError(f"unterminated string literal in filter: {expr!r}")
    out.append(fn(tail))
    return "".join(out)


def _validate_segment(seg: str, expr: str) -> None:
    """Every char outside literals must belong to a documented-grammar token,
    and operand tokens must not be ADJACENT: the signed-number token would
    otherwise tokenize ``5-3`` as ``5`` then ``-3`` and let arithmetic slip
    through to Spark SQL, where string operands numeric-cast instead of
    type-erroring as expr-lang would (review finding). ``seg`` arrives with
    Record refs already replaced by a number placeholder."""
    pos = 0
    prev_operand = False
    while pos < len(seg):
        m = _TOKEN.match(seg, pos)
        if m is None:
            raise FilterError(
                f"unsupported filter construct at {seg[pos:pos + 20]!r} in "
                f"{expr!r}: the filter grammar is Record[i], string/number "
                "literals, == != < > <= >=, and/&&, or/||, not/!, parentheses "
                "(reference docs/filter-expression.md)"
            )
        tok = m.group(0)
        pos = m.end()
        if tok.isspace():
            continue
        is_value = (
            tok in ("true", "false")
            or tok[0].isdigit()
            or (tok[0] == "-" and len(tok) > 1 and tok[1].isdigit())
        )
        if prev_operand and is_value:
            raise FilterError(
                f"adjacent operands (arithmetic?) at {tok!r} in {expr!r}: "
                "arithmetic is not part of the filter grammar (expr-lang "
                "would type-error on string records; Spark SQL would "
                "numeric-cast — silent divergence, so it is rejected)"
            )
        prev_operand = is_value or tok in (")", "]")


def translate_filter(expr: str, cols: list[str]) -> str:
    """Return a Spark SQL boolean expression string (raises
    :class:`FilterError` on out-of-range refs or off-grammar constructs)."""

    def _ref(m: re.Match[str]) -> str:
        i = int(m.group(1))
        if i >= len(cols):
            raise FilterError(f"filter references Record[{i}] but row width is {len(cols)}")
        return f"cast(`{cols[i]}` as string)"

    def _rewrite(seg: str) -> str:
        _validate_segment(_RECORD_REF.sub(" 0 ", seg), expr)
        # Stash resolved Record refs behind inert placeholders so NO later
        # textual rewrite can touch the substituted column names — a source
        # column literally named "matches" (or containing &&/[/!) must come
        # through byte-identical inside its backticks (review finding).
        refs: list[str] = []

        def _stash(m: re.Match[str]) -> str:
            refs.append(_ref(m))
            return f"\x00{len(refs) - 1}\x00"

        seg = _RECORD_REF.sub(_stash, seg)
        # `&&` is a Spark SQL synonym for AND, but `||` is CONCAT there —
        # both get rewritten to the keyword forms for unambiguous semantics.
        seg = seg.replace("&&", " and ").replace("||", " or ")
        for pat, repl in _FN_RENAMES:
            seg = pat.sub(repl, seg)
        # Record refs are stashed above, so remaining brackets are
        # expr-lang list literals (`in [..]`) → SQL IN-list parens.
        seg = seg.replace("[", "(").replace("]", ")")
        seg = _BANG_NOT.sub(" not ", seg)
        return re.sub(r"\x00(\d+)\x00", lambda m: refs[int(m.group(1))], seg)

    return _map_segments(expr, _rewrite)


def compile_filter(expr: str, cols: list[str]) -> Column:
    """Filter DSL string → boolean Column (rows failing are silently skipped,
    not rejected — reference pkg/spec/v3/node.go:160-167)."""
    return F.expr(translate_filter(expr, cols))


def validate_filter(expr: str) -> None:
    """Config-time validation without needing the source column list: checks
    literal termination + grammar only (width checks happen at compile time
    when the source schema is known). Raises :class:`FilterError`."""
    _map_segments(expr, lambda seg: (_validate_segment(_RECORD_REF.sub(" 0 ", seg), expr), seg)[1])
