"""Structural audits that catch registry/definition rot statically.

Motivated by a real regression: a second top-level ``rrf_fuse`` added to
``operators/search.py`` silently shadowed the first at import (last def
wins), flipping the output schema of a registered gate query. These
audits turn that whole class of mistake into a 2-second pytest failure:

1. no module in the package (or the entry module) may define the same
   top-level name twice;
2. no dict literal in the entry module may repeat a string key (a
   duplicate registry key silently dedupes at runtime);
3. every ``oracle_sql()`` key must have a matching ``queries()`` entry.

(The deeper schema-alignment check — Spark plan columns vs DuckDB
DESCRIBE of the oracle — lives in ``tools/check_oracle.py`` and the
full-sweep gate, since it needs a live session.)
"""

from __future__ import annotations

import ast
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
PACKAGE = REPO / "nebula_importer_spark"
ENTRY = REPO / "__spark_entry__.py"


def _scanned_files():
    return sorted(PACKAGE.rglob("*.py")) + [ENTRY]


def duplicate_toplevel_defs(source: str) -> list[str]:
    """Names bound by more than one direct module-body def/class.

    Only direct children of the module body count — conditional
    fallbacks (``try: import fast / except: def slow()``) live inside
    Try/If nodes and are legitimate. ``@overload`` stubs would be too,
    but the package doesn't use them; if it ever does, whitelist here.
    """
    seen: dict[str, int] = {}
    dupes = []
    for node in ast.parse(source).body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            if node.name in seen:
                dupes.append(f"{node.name} (lines {seen[node.name]} and {node.lineno})")
            else:
                seen[node.name] = node.lineno
    return dupes


def duplicate_dict_keys(source: str) -> list[str]:
    """String keys repeated inside any dict literal (last wins silently)."""
    dupes = []
    for node in ast.walk(ast.parse(source)):
        if not isinstance(node, ast.Dict):
            continue
        seen: dict[str, int] = {}
        for key in node.keys:
            if isinstance(key, ast.Constant) and isinstance(key.value, str):
                if key.value in seen:
                    dupes.append(
                        f"{key.value!r} (lines {seen[key.value]} and {key.lineno})"
                    )
                else:
                    seen[key.value] = key.lineno
    return dupes


def test_no_duplicate_toplevel_definitions():
    offenders = {}
    for path in _scanned_files():
        dupes = duplicate_toplevel_defs(path.read_text())
        if dupes:
            offenders[str(path.relative_to(REPO))] = dupes
    assert not offenders, (
        "duplicate top-level definitions (later one shadows the earlier "
        f"at import): {offenders}"
    )


def test_no_duplicate_dict_keys_in_entry_module():
    dupes = duplicate_dict_keys(ENTRY.read_text())
    assert not dupes, f"duplicate dict keys in __spark_entry__.py: {dupes}"


def test_synthetic_duplicates_are_detected():
    """The audits themselves must flag a planted duplicate."""
    assert duplicate_toplevel_defs(
        "def f():\n    pass\n\nx = 1\n\ndef f():\n    pass\n"
    ) == ["f (lines 1 and 6)"]
    # nested / conditional defs are NOT flagged
    assert duplicate_toplevel_defs(
        "try:\n    def f():\n        pass\nexcept ImportError:\n"
        "    def f():\n        pass\n"
    ) == []
    assert duplicate_dict_keys("d = {'a': 1, 'b': 2, 'a': 3}") == [
        "'a' (lines 1 and 1)"
    ]


def test_registry_keys_consistent():
    import __spark_entry__ as entry

    qkeys = set(entry.queries())
    okeys = set(entry.oracle_sql())
    assert okeys <= qkeys, f"oracles without queries: {sorted(okeys - qkeys)}"
    # the registry is the driver contract: non-trivially large, no blanks
    assert len(qkeys) >= 260
    assert all(k and k == k.strip() for k in qkeys)
