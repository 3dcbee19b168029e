"""Reference integration-case parity (mirrors the *behaviors* exercised by
/root/reference/integration-testing/testdata/cases-string & cases-int —
fixtures re-synthesized, not copied; see FIXTURES.md §3):

multi-tag fan-out from one file, concat ids, int-VID + HASH, glob sources,
header skip with embedded-newline quoted fields (lazyQuotes), reordered
props, the BOOL/INT/FLOAT/DOUBLE/STRING nullable/default/alternativeIndices
type matrix, DATE/TIME/DATETIME/TIMESTAMP incl. numeric epoch, GEOGRAPHY
shape validation, duplicate (src,dst) rows differing by rank, and
UPDATE/DELETE modes through the full Pipeline.run path."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from nebula_importer_spark.config.model import (
    CsvOptions,
    EdgeSpec,
    GraphConfig,
    Mode,
    NodeIDSpec,
    NodeSpec,
    PropSpec,
    SourceSpec,
)
from nebula_importer_spark.plans.pipeline import Pipeline


@pytest.fixture()
def course_csv(tmp_path):
    # id,name,credits,building — feeds BOTH course and building tags (G7)
    p = tmp_path / "course.csv"
    p.write_text(
        "c101,Math,4,West\n"
        "c102,English,3,East\n"
        '"z103","History",2,North\n'
        "0test,Physics,5,South\n"
    )
    return str(p)


def test_multi_tag_fanout_single_scan(spark, course_csv):
    cfg = GraphConfig(
        space="s",
        sources=[
            SourceSpec(
                path=course_csv,
                tags=[
                    NodeSpec(
                        "course",
                        NodeIDSpec(type="STRING", index=0),
                        [PropSpec("name", "STRING", 1), PropSpec("credits", "INT", 2)],
                    ),
                    NodeSpec(
                        "building",
                        NodeIDSpec(type="STRING", index=3),
                        [PropSpec("name", "STRING", 3)],
                    ),
                ],
            )
        ],
    )
    p = Pipeline(cfg, spark)
    courses = {r["vid"]: r for r in p.vertices("course").collect()}
    # quoted id unquoted by csv parse; leading-zero id preserved as string
    assert set(courses) == {"c101", "c102", "z103", "0test"}
    assert courses["c101"]["credits"] == 4
    buildings = {r["vid"] for r in p.vertices("building").collect()}
    assert buildings == {"West", "East", "North", "South"}


def test_concat_id_pattern_and_int_hash_vid(spark, course_csv):
    cfg = GraphConfig(
        space="s",
        sources=[
            SourceSpec(
                path=course_csv,
                tags=[
                    NodeSpec(
                        "course2",
                        # c1{id}c2{name}2 pattern (cases.string.v3.yaml:115-148 analog)
                        NodeIDSpec(type="STRING", concat_items=["c1", 0, "c2", 1, "2"]),
                        [],
                    ),
                    NodeSpec(
                        "course_hash",
                        NodeIDSpec(type="INT", index=0, function="HASH"),
                        [PropSpec("name", "STRING", 1)],
                    ),
                ],
            )
        ],
    )
    p = Pipeline(cfg, spark)
    vids = {r["vid"] for r in p.vertices("course2").collect()}
    assert "c1c101c2Math2" in vids
    hashed = p.vertices("course_hash")
    assert dict(hashed.dtypes)["vid"] == "bigint"
    assert hashed.count() == 4
    assert hashed.select("vid").distinct().count() == 4


def test_glob_sources(spark, tmp_path):
    (tmp_path / "glob-follow-1.csv").write_text("a,b,1,0.5\n")
    (tmp_path / "glob-follow-2.csv").write_text("c,d,2,0.7\n")
    cfg = GraphConfig(
        space="s",
        sources=[
            SourceSpec(
                path=str(tmp_path / "glob-follow-*.csv"),
                edges=[
                    EdgeSpec(
                        "follow",
                        src=NodeIDSpec(type="STRING", index=0),
                        dst=NodeIDSpec(type="STRING", index=1),
                        rank_index=2,
                        props=[PropSpec("likeness", "DOUBLE", 3)],
                    )
                ],
            )
        ],
    )
    rows = {(r["src"], r["dst"], r["rank"]) for r in Pipeline(cfg, spark).edges("follow").collect()}
    assert rows == {("a", "b", 1), ("c", "d", 2)}


def test_header_skip_with_embedded_newline(spark, tmp_path):
    # header interpreted only as skip; quoted field contains a newline
    p = tmp_path / "course-with-header.csv"
    p.write_text(
        'id,name,credits,building\n'
        'c1,"Multi\nLine",3,West\n'
        "c2,Plain,4,East\n"
    )
    cfg = GraphConfig(
        space="s",
        sources=[
            SourceSpec(
                path=str(p),
                csv=CsvOptions(with_header=True, lazy_quotes=True),
                tags=[
                    NodeSpec(
                        "course",
                        NodeIDSpec(type="STRING", index=0),
                        [PropSpec("name", "STRING", 1)],
                    )
                ],
            )
        ],
    )
    rows = {r["vid"]: r["name"] for r in Pipeline(cfg, spark).vertices("course").collect()}
    assert rows == {"c1": "Multi\nLine", "c2": "Plain"}


def test_reordered_props_bind_by_index(spark, tmp_path):
    # two specs of the same file with prop order permuted must agree
    p = tmp_path / "student.csv"
    p.write_text("s1,Ann,20,female\n")
    mk = lambda props: GraphConfig(
        space="s",
        sources=[
            SourceSpec(
                path=str(p),
                tags=[
                    NodeSpec(
                        "student",
                        NodeIDSpec(type="STRING", concat_items=["student_", 0]),
                        props,
                    )
                ],
            )
        ],
    )
    a = Pipeline(
        mk([PropSpec("name", "STRING", 1), PropSpec("age", "INT", 2)]), spark
    ).vertices("student").first()
    b = Pipeline(
        mk([PropSpec("age", "INT", 2), PropSpec("name", "STRING", 1)]), spark
    ).vertices("student").first()
    assert a["vid"] == b["vid"] == "student_s1"
    assert a["name"] == b["name"] == "Ann"
    assert a["age"] == b["age"] == 20


def test_type_matrix_nullable_defaults(spark, tmp_path):
    # basic_type_test analog: b BOOL@1 nullable; i INT@2 nullable default 0;
    # f FLOAT@3 nullable alt [2]; d DOUBLE@4 nullable alt [3,2] default 0
    p = tmp_path / "types.csv"
    p.write_text(
        "r1,true,42,1.5,2.5\n"
        "r2,,,,\n"
        "r3,false,7,,\n"
    )
    cfg = GraphConfig(
        space="s",
        sources=[
            SourceSpec(
                path=str(p),
                tags=[
                    NodeSpec(
                        "t",
                        NodeIDSpec(type="STRING", index=0),
                        [
                            PropSpec("b", "BOOL", 1, nullable=True),
                            PropSpec("i", "INT", 2, nullable=True, default_value="0"),
                            PropSpec("f", "FLOAT", 3, nullable=True, alternative_indices=[2]),
                            PropSpec(
                                "d", "DOUBLE", 4,
                                nullable=True, alternative_indices=[3, 2], default_value="0",
                            ),
                        ],
                    )
                ],
            )
        ],
    )
    rows = {r["vid"]: r for r in Pipeline(cfg, spark).vertices("t").collect()}
    assert rows["r1"]["b"] is True and rows["r1"]["i"] == 42
    assert rows["r1"]["d"] == 2.5
    assert rows["r2"]["b"] is None
    assert rows["r2"]["i"] == 0  # default fires
    assert rows["r2"]["f"] is None  # no default → null
    assert rows["r2"]["d"] == 0.0  # default after both fallbacks
    assert rows["r3"]["f"] == 7.0  # alternativeIndices fallback to col 2
    assert rows["r3"]["d"] == 7.0  # alt [3,2] → col2


def test_date_time_matrix_with_epoch(spark, tmp_path):
    p = tmp_path / "dates.csv"
    p.write_text(
        "d1,2020-01-02,18:38:23.284,2020-01-11T19:28:23,1578770903\n"
        "d2,2020-03-04,08:00:01,2020-03-04T00:00:00,2020-03-04T10:10:10\n"
        "dnull,,,,\n"
    )
    cfg = GraphConfig(
        space="s",
        sources=[
            SourceSpec(
                path=str(p),
                tags=[
                    NodeSpec(
                        "d",
                        NodeIDSpec(type="STRING", index=0),
                        [
                            PropSpec("c1", "DATE", 1, nullable=True),
                            PropSpec("c2", "TIME", 2, nullable=True),
                            PropSpec("c3", "DATETIME", 3, nullable=True),
                            PropSpec("c4", "TIMESTAMP", 4, nullable=True),
                        ],
                    )
                ],
            )
        ],
    )
    rows = {r["vid"]: r for r in Pipeline(cfg, spark).vertices("d").collect()}
    assert rows["d1"]["c1"] == datetime.date(2020, 1, 2)
    assert rows["d1"]["c2"] == "18:38:23.284"
    assert rows["d1"]["c3"] == datetime.datetime(2020, 1, 11, 19, 28, 23)
    # numeric epoch branch of TIMESTAMP dual mode
    assert rows["d1"]["c4"].replace(tzinfo=None) == datetime.datetime(2020, 1, 11, 19, 28, 23)
    assert rows["d2"]["c4"].replace(tzinfo=None) == datetime.datetime(2020, 3, 4, 10, 10, 10)
    assert all(rows["dnull"][c] is None for c in ("c1", "c2", "c3", "c4"))


def test_geography_shapes(spark, tmp_path):
    p = tmp_path / "geo.csv"
    p.write_text(
        'g1,Point(3 8),point(3 8),"LineString(3 8, 4 9)","Polygon((0 1, 2 4, 0 1))"\n'
        'g2,"LINESTRING(0 1, 2 3)","LineString(0 1, 2 3)",junk,Point(1 1)\n'
    )
    cfg = GraphConfig(
        space="s",
        sources=[
            SourceSpec(
                path=str(p),
                tags=[
                    NodeSpec(
                        "g",
                        NodeIDSpec(type="STRING", index=0),
                        [
                            PropSpec("any_shape", "GEOGRAPHY", 1, nullable=True),
                            PropSpec("only_point", "GEOGRAPHY(POINT)", 2, nullable=True),
                            PropSpec("only_ls", "GEOGRAPHY(LINESTRING)", 3, nullable=True),
                            PropSpec("only_poly", "GEOGRAPHY(POLYGON)", 4, nullable=True),
                        ],
                    )
                ],
            )
        ],
    )
    rows = {r["vid"]: r for r in Pipeline(cfg, spark).vertices("g").collect()}
    assert rows["g1"]["any_shape"] == "Point(3 8)"
    assert rows["g1"]["only_poly"].startswith("Polygon")
    assert rows["g2"]["any_shape"].startswith("LINESTRING")
    assert rows["g2"]["only_ls"] is None  # 'junk' fails shape validation
    assert rows["g2"]["only_poly"] is None  # Point in a POLYGON column


def test_duplicate_src_dst_distinct_ranks(spark, tmp_path):
    p = tmp_path / "follow.csv"
    p.write_text("a,b,1,0.1\na,b,2,0.2\na,b,2,0.9\n")
    cfg = GraphConfig(
        space="s",
        sources=[
            SourceSpec(
                path=str(p),
                edges=[
                    EdgeSpec(
                        "follow",
                        src=NodeIDSpec(type="STRING", index=0),
                        dst=NodeIDSpec(type="STRING", index=1),
                        rank_index=2,
                        props=[PropSpec("likeness", "DOUBLE", 3)],
                    )
                ],
            )
        ],
    )
    res = Pipeline(cfg, spark).run(tmp_path / "out")
    stored = spark.read.parquet(str(tmp_path / "out" / "s" / "edges" / "follow" / "v=1"))
    rows = {(r["src"], r["dst"], r["rank"]): r["likeness"] for r in stored.collect()}
    # rank is part of the edge key: (a,b,1) and (a,b,2) both survive;
    # duplicate (a,b,2) resolves last-write-wins
    assert set(rows) == {("a", "b", 1), ("a", "b", 2)}
    assert rows[("a", "b", 2)] == 0.9
    assert not res.is_failed()


def test_update_and_delete_modes_end_to_end(spark, tmp_path):
    base = tmp_path / "people_base.csv"
    base.write_text("p1,Ann\np2,Bob\np3,Cid\n")
    upd = tmp_path / "people_upd.csv"
    upd.write_text("p2,Bobby\npX,Ghost\n")
    dele = tmp_path / "people_del.csv"
    dele.write_text("p3,whatever\n")

    def cfg(path: str, mode: Mode) -> GraphConfig:
        return GraphConfig(
            space="s",
            sources=[
                SourceSpec(
                    path=path,
                    tags=[
                        NodeSpec(
                            "person",
                            NodeIDSpec(type="STRING", index=0),
                            [PropSpec("name", "STRING", 1)],
                            mode=mode,
                        )
                    ],
                )
            ],
        )

    out = tmp_path / "out"
    Pipeline(cfg(str(base), Mode.INSERT), spark).run(out)
    r2 = Pipeline(cfg(str(upd), Mode.UPDATE), spark).run(out)
    assert r2.elements[0].rejected == 1  # pX addresses a missing vertex
    Pipeline(cfg(str(dele), Mode.DELETE), spark).run(out)
    # v=3 on disk is an incremental delta (only touched buckets); the
    # manifest-resolved read reconstructs the full table state.
    from nebula_importer_spark.plans.merge import TableStore

    store = TableStore(out / "s", spark)
    assert store.current_version("tags/person") == 3
    rows = {r["vid"]: r["name"] for r in store.read("tags/person").collect()}
    assert rows == {"p1": "Ann", "p2": "Bobby"}  # p2 updated, p3 deleted, pX rejected


def test_snapshot_time_travel(spark, tmp_path):
    base = tmp_path / "b.csv"
    base.write_text("k1,v1\n")
    upd = tmp_path / "u.csv"
    upd.write_text("k1,v2\n")

    def cfg(path):
        return GraphConfig(
            space="s",
            sources=[
                SourceSpec(
                    path=str(path),
                    tags=[
                        NodeSpec(
                            "t",
                            NodeIDSpec(type="STRING", index=0),
                            [PropSpec("val", "STRING", 1)],
                        )
                    ],
                )
            ],
        )

    from nebula_importer_spark.plans.merge import TableStore

    out = tmp_path / "out"
    Pipeline(cfg(base), spark).run(out)
    Pipeline(cfg(upd), spark).run(out)
    store = TableStore(out / "s", spark)
    assert store.versions("tags/t") == [1, 2]
    v1 = {r["vid"]: r["val"] for r in store.read("tags/t", version=1).collect()}
    v2 = {r["vid"]: r["val"] for r in store.read("tags/t").collect()}
    assert v1 == {"k1": "v1"} and v2 == {"k1": "v2"}


def test_json_source_positional_binding(spark, tmp_path):
    p = tmp_path / "data.json"
    p.write_text(
        '{"id": "j1", "name": "Ann", "age": 30}\n'
        '{"id": "j2", "name": "Bob", "age": 40}\n'
    )
    cfg = GraphConfig(
        space="s",
        sources=[
            SourceSpec(
                path=str(p),
                format="json",
                tags=[
                    NodeSpec(
                        "person",
                        # JSON keys bind positionally by the reader's column
                        # order (alphabetical for spark.read.json): age,id,name
                        NodeIDSpec(type="STRING", index=1),
                        [PropSpec("name", "STRING", 2), PropSpec("age", "INT", 0)],
                    )
                ],
            )
        ],
    )
    rows = {r["vid"]: r for r in Pipeline(cfg, spark).vertices("person").collect()}
    assert rows["j1"]["name"] == "Ann" and rows["j1"]["age"] == 30


def test_multiple_sources_same_tag_union(spark, tmp_path):
    (tmp_path / "a.csv").write_text("a1,Ann\n")
    (tmp_path / "b.csv").write_text("b1,Bob\n")
    mk_source = lambda p: SourceSpec(
        path=str(p),
        tags=[
            NodeSpec(
                "person",
                NodeIDSpec(type="STRING", index=0),
                [PropSpec("name", "STRING", 1)],
            )
        ],
    )
    cfg = GraphConfig(
        space="s", sources=[mk_source(tmp_path / "a.csv"), mk_source(tmp_path / "b.csv")]
    )
    p = Pipeline(cfg, spark)
    rows = {r["vid"]: r["name"] for r in p.vertices("person").collect()}
    assert rows == {"a1": "Ann", "b1": "Bob"}
    res = p.run(tmp_path / "out")
    from nebula_importer_spark.plans.merge import TableStore

    store = TableStore(tmp_path / "out" / "s", spark)
    assert store.current_version("tags/person") == 2
    assert store.read("tags/person").count() == 2  # second source upserts


def test_edge_update_and_delete_modes(spark, tmp_path):
    (tmp_path / "e_base.csv").write_text("a,b,0.1\na,c,0.2\n")
    (tmp_path / "e_upd.csv").write_text("a,b,0.9\nx,y,0.5\n")
    (tmp_path / "e_del.csv").write_text("a,c,0\n")

    def cfg(path, mode):
        return GraphConfig(
            space="s",
            sources=[
                SourceSpec(
                    path=str(path),
                    edges=[
                        EdgeSpec(
                            "rel",
                            src=NodeIDSpec(type="STRING", index=0),
                            dst=NodeIDSpec(type="STRING", index=1),
                            props=[PropSpec("w", "DOUBLE", 2)],
                            mode=mode,
                        )
                    ],
                )
            ],
        )

    out = tmp_path / "out"
    Pipeline(cfg(tmp_path / "e_base.csv", Mode.INSERT), spark).run(out)
    r2 = Pipeline(cfg(tmp_path / "e_upd.csv", Mode.UPDATE), spark).run(out)
    assert r2.elements[0].rejected == 1  # (x,y) addresses a missing edge
    Pipeline(cfg(tmp_path / "e_del.csv", Mode.DELETE), spark).run(out)
    from nebula_importer_spark.plans.merge import TableStore

    store = TableStore(out / "s", spark)
    rows = {(r["src"], r["dst"]): r["w"] for r in store.read("edges/rel").collect()}
    assert rows == {("a", "b"): 0.9}
