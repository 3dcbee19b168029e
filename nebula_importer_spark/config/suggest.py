"""Source-config suggestion: from a sniffed CSV to a reference-shaped
YAML source block.

The reference requires a hand-written YAML declaring every prop's type
and index (/root/reference/pkg/spec/v3/prop.go, examples/*.yaml); for an
unknown 100-TB drop, writing that YAML starts with schema sniffing
(operators/profile.py:infer_column_types). This module renders the
sniff result into the exact ``sources:`` entry shape the reference's
examples use — a starting point a human reviews, not a bypass of the
declared-schema contract (defaults are conservative: STRING on no
evidence, the id prop must be INT or STRING per the reference's NodeID
restriction and degrades to STRING otherwise).

Deterministic hand-rendering (no yaml-lib dict ordering surprises): the
golden tests pin the byte-exact output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from .model import ID_TYPES

#: TIME sniffs can't be a NodeID and GEOGRAPHY never sniffs; everything
#: infer_column_types emits is a valid reference prop type already.


def suggest_source_config(
    df: DataFrame,
    *,
    path: str,
    tag_name: str,
    id_col: str | None = None,
    delimiter: str = ",",
    with_header: bool = True,
) -> str:
    """Render a reference-shaped YAML ``sources:`` entry for a sniffed
    string-columns frame (a CSV read with header): one ``id`` block
    (``id_col``, default the first column; its type clamped to the
    reference's NodeID restriction INT/STRING) and one ``props`` entry
    per remaining column with the evidence-backed type and its 0-based
    index. Columns whose evidence includes blanks get ``nullable: true``
    with the default ``nullValue: ""`` left implicit.

    Runs ONE infer_column_types pass (schema-sized collect). Returns
    the YAML string; parseable by config.parse.load_config when wrapped
    with client/manager blocks (golden-tested).
    """
    from ..operators.profile import infer_column_types

    cols = list(df.columns)
    if id_col is None:
        id_col = cols[0]
    if id_col not in cols:
        raise ValueError(f"id_col {id_col!r} not in columns: {cols}")
    info = {r["column"]: r for r in infer_column_types(df).collect()}
    idx = {c: i for i, c in enumerate(cols)}

    id_type = info[id_col]["inferred_type"]
    if id_type not in ID_TYPES:
        id_type = "STRING"

    lines = [
        f"  - path: {path}",
        "    csv:",
        f'      delimiter: "{delimiter}"',
        f"      withHeader: {'true' if with_header else 'false'}",
        "    tags:",
        f"      - name: {tag_name}",
        "        id:",
        f'          type: "{id_type}"',
        f"          index: {idx[id_col]}",
        "        props:",
    ]
    for c in cols:
        if c == id_col:
            continue
        r = info[c]
        lines.append(f"          - name: {c}")
        lines.append(f'            type: "{r["inferred_type"]}"')
        lines.append(f"            index: {idx[c]}")
        if (r["n_blank"] or 0) > 0 or (r["n_null"] or 0) > 0:
            lines.append("            nullable: true")
    return "\n".join(lines) + "\n"
