"""The reference's OWN example configs, loaded straight from the read-only
reference checkout (never copied): every YAML must parse into a valid
GraphConfig, and the flagship basic string-insert example must run end-to-end
against the reference's own CSVs with the element counts its semantics imply
(reference examples/basic/basic.string.insert.v3.yaml + person.csv/knows.csv).
"""

from __future__ import annotations

import glob
from pathlib import Path

import pytest

from nebula_importer_spark.config import load_config
from nebula_importer_spark.plans.pipeline import Pipeline

EXAMPLES = Path("/root/reference/examples")

pytestmark = pytest.mark.skipif(
    not EXAMPLES.exists(), reason="reference checkout not present"
)


def test_every_reference_example_yaml_parses():
    files = sorted(glob.glob(str(EXAMPLES / "**" / "*.yaml"), recursive=True))
    assert len(files) >= 13
    by_name = {}
    for f in files:
        cfg = load_config(f)  # raises on any unparseable/invalid config
        by_name[Path(f).name] = cfg
    # spot checks: the v3 surface really landed, not just "didn't crash"
    ldbc = by_name["ldbc-snb.v3.yaml"]
    assert len(ldbc.sources) == 31
    basic = by_name["basic.string.insert.v3.yaml"]
    assert basic.space == "basic_string_examples"
    assert basic.reader_concurrency == 50
    assert basic.importer_concurrency == 512
    assert basic.log is not None and basic.log.files
    assert basic.before_hooks and basic.before_hooks[0].wait_sec == 10.0
    assert basic.sources[1].batch == 256  # per-source batch override
    s3 = by_name["s3.v3.yaml"]
    assert any(s.s3 is not None for s in s3.sources)


def test_reference_insert_example_runs_end_to_end(spark, tmp_path):
    cfg = load_config(str(EXAMPLES / "basic" / "basic.string.insert.v3.yaml"))
    cfg.log = None  # logs/ would land under the read-only reference dir
    for h in (*cfg.before_hooks, *cfg.after_hooks):
        h.wait_sec = 0  # settle waits are covered by test_pipeline_basic
    res = Pipeline(cfg, spark, staging_dir=str(tmp_path / "stage")).run(
        tmp_path / "out"
    )
    assert not res.is_failed()
    got = {
        (e.kind, e.name, i): (e.total, e.filtered, e.written, e.rejected)
        for i, e in enumerate(res.elements)
    }
    # person.csv: 13 data rows (comments skipped); the alias tag's filter
    # keeps the two male rows named in the expr (Mahinda, Michael)
    assert got[("tag", "Person", 0)] == (13, 0, 13, 0)
    assert got[("tag", "Person", 1)] == (13, 11, 2, 0)
    # knows.csv: 9 edges, both the plain and the concat-id variant
    assert got[("edge", "KNOWS", 2)] == (9, 0, 9, 0)
    assert got[("edge", "KNOWS", 3)] == (9, 0, 9, 0)

    from nebula_importer_spark.plans.merge import TableStore

    store = TableStore(tmp_path / "out" / cfg.space, spark)
    alias_vids = {
        r["vid"]
        for r in store.read("tags/Person").collect()
        if r["vid"].startswith("person_")
    }
    assert alias_vids == {"person_933_id", "person_17592186045684_id"}


def test_ldbc_snb_config_runs_on_synthesized_fixtures(spark, tmp_path):
    """The reference's largest example (31 sources, 68 tag/edge elements in
    LDBC-SNB shape) ships configs only — its data is a download. The
    fixture synthesizer derives each source's column count and strictest
    per-column value type from the config itself and the whole import runs
    end-to-end: every id/prop picker compiles, every cast succeeds, zero
    rejects."""
    import sys

    sys.path.insert(0, str(Path(__file__).parent.parent / "tools"))
    from gen_fixtures import generate_fixtures

    cfg = load_config(str(EXAMPLES / "ldbc-snb" / "ldbc-snb.v3.yaml"))
    cfg.log = None
    for h in (*cfg.before_hooks, *cfg.after_hooks):
        h.wait_sec = 0
    n = 6
    written = generate_fixtures(cfg, tmp_path / "fx", n_rows=n)
    assert len(written) == 31
    res = Pipeline(cfg, spark, staging_dir=str(tmp_path / "stage")).run(
        tmp_path / "out"
    )
    assert not res.is_failed()
    assert len(res.elements) == 31
    assert res.total_written == 31 * n
    assert res.total_rejected == 0


def _run_example(spark, which, out, staging):
    cfg = load_config(str(EXAMPLES / "basic" / f"basic.string.{which}.v3.yaml"))
    cfg.log = None
    for h in (*cfg.before_hooks, *cfg.after_hooks):
        h.wait_sec = 0
    return cfg, Pipeline(cfg, spark, staging_dir=str(staging)).run(out)


def test_reference_update_delete_sequence(spark, tmp_path):
    """insert → update → delete with the reference's own example configs.
    The update names a SINGLE prop (browserUsed): matched rows must keep
    their other columns (UPDATE ... SET semantics), which is exactly the
    narrower-than-table incoming schema the whole-row merge used to crash
    on. The delete's alias-keyed rows mostly address missing vertices —
    a no-op, as the reference treats DELETE on absent keys."""
    from nebula_importer_spark.plans.merge import TableStore

    out = tmp_path / "out"
    _run_example(spark, "insert", out, tmp_path / "s1")
    _, res_u = _run_example(spark, "update", out, tmp_path / "s2")
    assert not res_u.is_failed()
    store = TableStore(out / "basic_string_examples", spark)
    rows = {r["vid"]: r for r in store.read("tags/Person").collect()}
    # Reference quirk reproduced faithfully: the insert example's first
    # Person tag declares browserUsed WITHOUT an index → Go zero value 0 →
    # the prop picks Record[0] (the id). The update example DOES give
    # index 7, so updated rows get the real browser string; Mahinda (933)
    # is excluded by the update filter and keeps the quirky value.
    assert rows["933"]["firstName"] == "Mahinda"
    assert rows["933"]["browserUsed"] == "933"
    assert rows["1129"]["browserUsed"] == "Internet Explorer"
    assert rows["1129"]["firstName"] == "Carmen"  # non-updated col retained

    _, res_d = _run_example(spark, "delete", out, tmp_path / "s3")
    assert not res_d.is_failed()
    left = store.read("tags/Person")
    # female-filtered deletes address person_<id>_id alias keys; only male
    # aliases were ever inserted, so all 15 vertices survive
    assert left.count() == 15
    # edge deletes: concat-id edges with src != 933 removed (6 of 9)
    assert store.read("edges/KNOWS").count() == 12
