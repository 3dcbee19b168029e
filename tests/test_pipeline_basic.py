"""End-to-end golden test mirroring the reference's examples/basic flow:
|-delimited person.csv with comments, nullable birthday (_NULL_), gender
defaultValue, a concat-ID second tag with a filter, and a knows.csv edge
source — asserting the logical (vid, props) / (src, dst, rank, props) tuples
the reference's nGQL statements would carry
(reference basic.string.insert.v3.yaml:34-150)."""

from __future__ import annotations

import datetime
from pathlib import Path

from nebula_importer_spark.config.model import (
    CsvOptions,
    EdgeSpec,
    GraphConfig,
    NodeIDSpec,
    NodeSpec,
    PropSpec,
    SourceSpec,
)
from nebula_importer_spark.plans.pipeline import Pipeline

FIX = Path(__file__).parent / "fixtures"


def _config() -> GraphConfig:
    person_props = [
        PropSpec("firstName", "STRING", 1),
        PropSpec("lastName", "STRING", 2),
        PropSpec("gender", "STRING", 3, nullable=True, default_value="female"),
        PropSpec("birthday", "DATE", 4, nullable=True, null_value="_NULL_"),
        PropSpec("creationDate", "DATETIME", 5),
        PropSpec("locationIP", "STRING", 6),
        PropSpec("browserUsed", "STRING", 7, nullable=True),
    ]
    return GraphConfig(
        space="basic",
        sources=[
            SourceSpec(
                path=str(FIX / "person.csv"),
                csv=CsvOptions(delimiter="|", comment="#"),
                tags=[
                    NodeSpec("Person", NodeIDSpec(type="STRING", index=0), person_props),
                    NodeSpec(
                        "PersonAlias",
                        NodeIDSpec(type="STRING", concat_items=["person_", 0, "_id"]),
                        [PropSpec("firstName", "STRING", 1)],
                        filter='Record[3] == "male"',
                    ),
                ],
            ),
            SourceSpec(
                path=str(FIX / "knows.csv"),
                edges=[
                    EdgeSpec(
                        "KNOWS",
                        src=NodeIDSpec(type="STRING", index=0),
                        dst=NodeIDSpec(type="STRING", index=1),
                        props=[
                            PropSpec(
                                "creationDate",
                                "DATETIME",
                                2,
                                nullable=True,
                                null_value="_NULL_",
                                default_value="2000-01-01T00:00:00",
                            )
                        ],
                        filter='Record[0] != "0"',
                    )
                ],
            ),
        ],
    )


def test_person_vertices_golden(spark):
    p = Pipeline(_config(), spark)
    rows = {r["vid"]: r for r in p.vertices("Person").collect()}
    assert set(rows) == {"101", "102", "103", "104", "105"}
    ada = rows["101"]
    assert ada["firstName"] == "Ada"
    assert ada["birthday"] == datetime.date(1815, 12, 10)
    assert ada["creationDate"] == datetime.datetime(2010, 2, 14, 15, 32, 10)
    # empty gender → nullable → defaultValue female
    assert rows["103"]["gender"] == "female"
    # _NULL_ birthday → real null
    assert rows["104"]["birthday"] is None
    # empty browserUsed → null (default nullValue "")
    assert rows["105"]["browserUsed"] is None


def test_concat_id_tag_with_filter(spark):
    p = Pipeline(_config(), spark)
    rows = {r["vid"]: r["firstName"] for r in p.vertices("PersonAlias").collect()}
    # only male rows pass the filter (102 Alan, 104 Kurt)
    assert rows == {"person_102_id": "Alan", "person_104_id": "Kurt"}


def test_knows_edges_golden(spark):
    p = Pipeline(_config(), spark)
    rows = {(r["src"], r["dst"]): r for r in p.edges("KNOWS").collect()}
    # row with src "0" filtered out
    assert set(rows) == {("101", "102"), ("101", "103"), ("102", "104"), ("104", "105")}
    assert all(r["rank"] == 0 for r in rows.values())
    # _NULL_ creationDate → default substituted then cast
    assert rows[("102", "104")]["creationDate"] == datetime.datetime(2000, 1, 1, 0, 0, 0)


def test_run_materializes_and_metrics(spark, tmp_path):
    p = Pipeline(_config(), spark)
    res = p.run(tmp_path)
    assert not res.is_failed()
    by_name = {(e.name, e.kind): e for e in res.elements}
    assert by_name[("Person", "tag")].written == 5
    assert by_name[("PersonAlias", "tag")].written == 2
    assert by_name[("PersonAlias", "tag")].filtered == 3
    assert by_name[("KNOWS", "edge")].written == 4
    assert by_name[("KNOWS", "edge")].filtered == 1
    stored = spark.read.parquet(str(tmp_path / "basic" / "tags" / "Person" / "v=1"))
    assert stored.count() == 5
    assert "vid" in stored.columns and "_seq" not in stored.columns


def test_run_resume_skips_completed(spark, tmp_path):
    p = Pipeline(_config(), spark)
    p.run(tmp_path)
    p2 = Pipeline(_config(), spark)
    res2 = p2.run(tmp_path, resume=True)
    assert res2.elements == []  # every stage already committed


def test_resume_does_not_duplicate_csv_rejects(spark, tmp_path):
    """The per-source rejects write is a resumable stage: a resumed run must
    report the prior reject count without appending the rows again."""
    bad = tmp_path / "bad.csv"
    bad.write_text('x1,Ok\n"broken,row\n')
    cfg = GraphConfig(
        space="s",
        sources=[
            SourceSpec(
                path=str(bad),
                tags=[
                    NodeSpec(
                        "t",
                        NodeIDSpec(type="STRING", index=0),
                        [PropSpec("v", "STRING", 1)],
                    )
                ],
            )
        ],
    )
    out = tmp_path / "out"
    r1 = Pipeline(cfg, spark).run(out)
    assert r1.csv_rejects == 1
    r2 = Pipeline(cfg, spark).run(out, resume=True)
    assert r2.csv_rejects == 1  # reported from the manifest, not re-counted
    stored = spark.read.parquet(str(out / "s" / "_rejects" / "csv"))
    assert stored.count() == 1  # no duplicate append


def test_failing_before_hook_aborts_run(spark, tmp_path):
    """W6 parity: a hook statement that fails must abort the import
    (reference pkg/manager/manager.go:285-336), not silently vanish."""
    import pytest

    from nebula_importer_spark.config.model import HookSpec
    from nebula_importer_spark.plans.pipeline import HookError

    cfg = _config()
    cfg.before_hooks = [HookSpec(statements=["SELEC BROKEN SYNTAX"])]
    with pytest.raises(HookError):
        Pipeline(cfg, spark).run(tmp_path)
    # nothing was committed before the hook failed
    assert not (tmp_path / "basic" / "tags").exists()


def test_hook_wait_sleeps_after_statements(spark, tmp_path):
    import time as _time

    from nebula_importer_spark.config.model import HookSpec

    cfg = _config()
    cfg.before_hooks = [HookSpec(statements=["SELECT 1"], wait_sec=0.3)]
    t0 = _time.time()
    res = Pipeline(cfg, spark).run(tmp_path)
    assert _time.time() - t0 >= 0.3
    assert not res.is_failed()


def test_csv_scan_plan_has_no_exchange(spark):
    """Scale guard: the header-skip must not shuffle the scan (the old
    row_number-over-input_file_name window hash-partitioned 100 TB by
    filename — one multi-GB CSV file became ONE reducer task). The mapped
    projection over a staged CSV scan must plan with zero Exchanges."""
    import contextlib
    import io

    p = Pipeline(_config(), spark)
    df = p.vertices("Person")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    assert "Exchange" not in buf.getvalue()
