"""nGQL statement rendering vs the reference's statement-builder formats
(reference pkg/spec/v3/node_test.go / edge_test.go golden shapes)."""

from __future__ import annotations

from pyspark.sql import functions as F

from nebula_importer_spark.config.model import (
    EdgeSpec,
    Mode,
    NodeIDSpec,
    NodeSpec,
    PropSpec,
)
from nebula_importer_spark.plans.ngql import (
    escape_identifier,
    render_edge_statements,
    render_node_statements,
)


def _stmts(df):
    return [
        (r["statement"], r["n_records"])
        for r in df.orderBy("statement").collect()
    ]


def _people(spark):
    return spark.createDataFrame(
        [(1, "str1", 1.1), (2, "str2", 2.2)],
        "vid long, prop1 string, prop2 double",
    ).coalesce(1)


def test_escape_identifier():
    assert escape_identifier("name") == "`name`"
    assert escape_identifier("we`ird\\x") == "`we\\`ird\\\\x`"


def test_insert_vertex_statement(spark):
    spec = NodeSpec(
        "name",
        NodeIDSpec(type="INT", index=0),
        [PropSpec("prop1", "STRING", 1), PropSpec("prop2", "DOUBLE", 2)],
    )
    got = _stmts(render_node_statements(_people(spark), spec))
    assert got == [
        (
            'INSERT VERTEX IGNORE_EXISTED_INDEX `name`(`prop1`, `prop2`) '
            'VALUES 1:("str1", 1.1), 2:("str2", 2.2)',
            2,
        )
    ]
    # batch=1 → one statement per record, each with the full prefix
    got = _stmts(render_node_statements(_people(spark), spec, batch=1))
    assert got == [
        ('INSERT VERTEX IGNORE_EXISTED_INDEX `name`(`prop1`, `prop2`) VALUES 1:("str1", 1.1)', 1),
        ('INSERT VERTEX IGNORE_EXISTED_INDEX `name`(`prop1`, `prop2`) VALUES 2:("str2", 2.2)', 1),
    ]


def test_update_and_delete_vertex_statements(spark):
    upd = NodeSpec(
        "name",
        NodeIDSpec(type="INT", index=0),
        [PropSpec("prop1", "STRING", 1)],
        mode=Mode.UPDATE,
    )
    got = _stmts(render_node_statements(_people(spark), upd))
    assert got == [
        ('UPDATE VERTEX ON `name` 1 SET `prop1` = "str1";'
         'UPDATE VERTEX ON `name` 2 SET `prop1` = "str2";', 2)
    ]
    dele = NodeSpec("name", NodeIDSpec(type="INT", index=0), [], mode=Mode.DELETE)
    got = _stmts(render_node_statements(_people(spark), dele))
    assert got == [("DELETE TAG `name` FROM 1;DELETE TAG `name` FROM 2;", 2)]


def _knows(spark, with_rank=False):
    df = spark.createDataFrame(
        [(1, "id1", 1, "str1", 1.1), (2, "id2", 2, "str2", 2.2)],
        "src long, dst string, rank long, prop1 string, prop2 double",
    ).coalesce(1)
    return df if with_rank else df.drop("rank")


def test_insert_edge_statement(spark):
    spec = EdgeSpec(
        "name",
        src=NodeIDSpec(type="INT", index=0),
        dst=NodeIDSpec(type="STRING", index=1),
        props=[PropSpec("prop1", "STRING", 2), PropSpec("prop2", "DOUBLE", 3)],
    )
    got = _stmts(render_edge_statements(_knows(spark), spec))
    assert got == [
        (
            'INSERT EDGE IGNORE_EXISTED_INDEX `name`(`prop1`, `prop2`) '
            'VALUES 1->"id1":("str1", 1.1), 2->"id2":("str2", 2.2)',
            2,
        )
    ]
    ranked = EdgeSpec(
        "name",
        src=NodeIDSpec(type="INT", index=0),
        dst=NodeIDSpec(type="STRING", index=1),
        rank_index=0,
        props=[PropSpec("prop1", "STRING", 2)],
    )
    got = _stmts(render_edge_statements(_knows(spark, with_rank=True), ranked))
    assert got == [
        (
            'INSERT EDGE IGNORE_EXISTED_INDEX `name`(`prop1`) '
            'VALUES 1->"id1"@1:("str1"), 2->"id2"@2:("str2")',
            2,
        )
    ]


def test_update_and_delete_edge_statements(spark):
    upd = EdgeSpec(
        "name",
        src=NodeIDSpec(type="INT", index=0),
        dst=NodeIDSpec(type="STRING", index=1),
        props=[PropSpec("prop1", "STRING", 2)],
        mode=Mode.UPDATE,
    )
    got = _stmts(render_edge_statements(_knows(spark), upd))
    assert got == [
        ('UPDATE EDGE ON `name` 1->"id1" SET `prop1` = "str1";'
         'UPDATE EDGE ON `name` 2->"id2" SET `prop1` = "str2";', 2)
    ]
    dele = EdgeSpec(
        "name",
        src=NodeIDSpec(type="INT", index=0),
        dst=NodeIDSpec(type="STRING", index=1),
        mode=Mode.DELETE,
    )
    got = _stmts(render_edge_statements(_knows(spark), dele))
    assert got == [('DELETE EDGE `name` 1->"id1", 2->"id2"', 2)]


def test_typed_literals_and_null(spark):
    df = spark.createDataFrame(
        [("k", "2020-01-02", None, "true")],
        "vid string, d string, s string, b string",
    ).select(
        "vid",
        F.col("d").cast("date").alias("d"),
        "s",
        F.col("b").cast("boolean").alias("b"),
    )
    spec = NodeSpec(
        "t",
        NodeIDSpec(type="STRING", index=0),
        [
            PropSpec("d", "DATE", 1),
            PropSpec("s", "STRING", 2),
            PropSpec("b", "BOOL", 3),
        ],
    )
    (stmt, n), = _stmts(render_node_statements(df, spec))
    assert stmt == (
        'INSERT VERTEX IGNORE_EXISTED_INDEX `t`(`d`, `s`, `b`) '
        'VALUES "k":(DATE("2020-01-02"), NULL, true)'
    )


def test_string_escaping_in_values(spark):
    df = spark.createDataFrame(
        [(1, 'he said "hi"\\now')], "vid long, prop1 string"
    )
    spec = NodeSpec("t", NodeIDSpec(type="INT", index=0), [PropSpec("prop1", "STRING", 1)])
    (stmt, _), = _stmts(render_node_statements(df, spec))
    assert '\\"hi\\"' in stmt and "\\\\n" in stmt

def test_pipeline_statements_from_reference_example(spark, tmp_path):
    """End-to-end: the reference's own basic insert config renders its
    Person INSERT statements through the Pipeline API."""
    from pathlib import Path

    from nebula_importer_spark.config import load_config
    from nebula_importer_spark.plans.pipeline import Pipeline

    ex = Path("/root/reference/examples/basic/basic.string.insert.v3.yaml")
    if not ex.exists():
        import pytest

        pytest.skip("reference checkout not present")
    cfg = load_config(str(ex))
    cfg.log = None
    p = Pipeline(cfg, spark, staging_dir=str(tmp_path / "stage"))
    rows = p.statements("Person").collect()
    total = sum(r["n_records"] for r in rows)
    assert total == 15  # 13 plain + 2 filtered-alias Person records
    joined = " ".join(r["statement"] for r in rows)
    assert "INSERT VERTEX IGNORE_EXISTED_INDEX `Person`(`firstName`" in joined
    assert '"933":("Mahinda"' in joined
    assert 'DATE("1989-12-03")' in joined


def test_null_rank_fragments_are_excluded(spark):
    """Unrenderable keys (null rank on a ranked edge) must neither count in
    n_records nor leave an empty/invalid VALUES list."""
    df = spark.createDataFrame(
        [(1, "a", 7, "x"), (2, "b", None, "y")],
        "src long, dst string, rank long, prop1 string",
    ).coalesce(1)
    spec = EdgeSpec(
        "e",
        src=NodeIDSpec(type="INT", index=0),
        dst=NodeIDSpec(type="STRING", index=1),
        rank_index=0,
        props=[PropSpec("prop1", "STRING", 2)],
    )
    got = _stmts(render_edge_statements(df, spec))
    assert got == [
        ('INSERT EDGE IGNORE_EXISTED_INDEX `e`(`prop1`) VALUES 1->"a"@7:("x")', 1)
    ]
    # an all-null batch renders NO statement at all
    all_null = df.filter("rank is null")
    assert render_edge_statements(all_null, spec).count() == 0


def test_datetime_preserves_fractional_seconds(spark):
    df = spark.createDataFrame(
        [("k", "2020-01-01 12:00:00.123"), ("k2", "2020-01-01 12:00:00")],
        "vid string, dt string",
    ).select("vid", F.col("dt").cast("timestamp_ntz").alias("dt"))
    spec = NodeSpec(
        "t", NodeIDSpec(type="STRING", index=0), [PropSpec("dt", "DATETIME", 1)]
    )
    joined = " ".join(s for s, _ in _stmts(render_node_statements(df, spec, batch=1)))
    assert 'DATETIME("2020-01-01T12:00:00.123")' in joined
    assert 'DATETIME("2020-01-01T12:00:00")' in joined  # no spurious .000


def test_datetime_preserves_microseconds(spark):
    """Sub-millisecond precision must survive rendering (ADVICE: SSS
    pattern silently truncated micros)."""
    df = spark.createDataFrame(
        [("k", "2020-01-01 12:00:00.000123"), ("k2", "2020-01-01 12:00:00.120")],
        "vid string, dt string",
    ).select("vid", F.col("dt").cast("timestamp_ntz").alias("dt"))
    spec = NodeSpec(
        "t", NodeIDSpec(type="STRING", index=0), [PropSpec("dt", "DATETIME", 1)]
    )
    joined = " ".join(s for s, _ in _stmts(render_node_statements(df, spec, batch=1)))
    assert 'DATETIME("2020-01-01T12:00:00.000123")' in joined
    assert 'DATETIME("2020-01-01T12:00:00.12")' in joined  # trailing zeros trimmed


def test_go_quote_roundtrip_property(spark):
    """Property: for any text over the supported escape alphabet, the
    rendered statement literal unescapes back to the original string —
    i.e. go_quote is injective and lossless for graph data."""
    import re

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from nebula_importer_spark.plans.ngql import go_quote

    alphabet = st.sampled_from(
        list("abzAZ09 _-.,:;!?()[]{}")
        + ['"', "\\", "\n", "\t", "\r", "é", "界"]
        # full C0 + DEL coverage for the strconv.Quote hex/named escapes
        + [chr(i) for i in range(0x00, 0x20)]
        + ["\x7f"]
    )

    def unquote(lit: str) -> str:
        assert lit[0] == '"' and lit[-1] == '"'
        body = lit[1:-1]
        out, i = [], 0
        mapping = {
            "\\": "\\", '"': '"', "n": "\n", "t": "\t", "r": "\r",
            "a": "\a", "b": "\b", "f": "\f", "v": "\v",
        }
        while i < len(body):
            if body[i] == "\\":
                if body[i + 1] == "x":
                    out.append(chr(int(body[i + 2 : i + 4], 16)))
                    i += 4
                else:
                    out.append(mapping[body[i + 1]])
                    i += 2
            else:
                out.append(body[i])
                i += 1
        return "".join(out)

    # one Spark action for the whole sample set (hypothesis drives data
    # generation only; the comparison is vectorized through one collect)
    @settings(max_examples=40, deadline=None)
    @given(st.lists(st.text(alphabet, max_size=30), min_size=1, max_size=8))
    def check(texts):
        df = spark.createDataFrame([(t,) for t in texts], "s string")
        rows = df.select(go_quote(F.col("s")).alias("q"), "s").collect()
        for r in rows:
            assert unquote(r["q"]) == r["s"], (r["q"], r["s"])

    check()
