"""Bucketed incremental TableStore: a merge commit must rewrite ONLY the
key-hash buckets the incoming batch touches (the Iceberg MERGE INTO
file-pruning analog) — N incremental loads into a big table must not cost N
full-table rewrites."""

from __future__ import annotations

from nebula_importer_spark.config.model import Mode
from nebula_importer_spark.plans.merge import BUCKET_COL, TableStore


def _bucket_dirs(store, table, version):
    return sorted(
        p.name for p in (store.root / table / f"v={version}").glob(f"{BUCKET_COL}=*")
    )


def test_incremental_insert_rewrites_only_touched_buckets(spark, tmp_path):
    store = TableStore(tmp_path / "s", spark, n_buckets=8)
    base = spark.createDataFrame(
        [(f"k{i}", f"v{i}") for i in range(64)], "vid string, val string"
    )
    v1, _ = store.merge_commit(base, "tags/t", Mode.INSERT, ["vid"])
    assert v1 == 1
    n_base_buckets = len(_bucket_dirs(store, "tags/t", 1))
    assert n_base_buckets == 8  # 64 keys cover all 8 buckets

    delta = spark.createDataFrame([("k3", "v3b")], "vid string, val string")
    v2, _ = store.merge_commit(delta, "tags/t", Mode.INSERT, ["vid"])
    assert v2 == 2
    # the new snapshot materializes ONLY the single touched bucket
    assert len(_bucket_dirs(store, "tags/t", 2)) == 1

    got = {r["vid"]: r["val"] for r in store.read("tags/t").collect()}
    assert len(got) == 64 and got["k3"] == "v3b" and got["k5"] == "v5"
    # time travel reconstructs the pre-upsert state from the bucket map
    old = {r["vid"]: r["val"] for r in store.read("tags/t", version=1).collect()}
    assert old["k3"] == "v3" and len(old) == 64
    assert store.versions("tags/t") == [1, 2]


def test_incremental_update_and_delete(spark, tmp_path):
    store = TableStore(tmp_path / "s", spark, n_buckets=8)
    base = spark.createDataFrame(
        [(f"k{i}", f"v{i}") for i in range(32)], "vid string, val string"
    )
    store.merge_commit(base, "tags/t", Mode.INSERT, ["vid"])

    upd = spark.createDataFrame(
        [("k1", "u1"), ("nope", "x")], "vid string, val string"
    )
    v2, unmatched = store.merge_commit(upd, "tags/t", Mode.UPDATE, ["vid"])
    assert unmatched == 1  # missing key dropped and counted (reference UPDATE)
    got = {r["vid"]: r["val"] for r in store.read("tags/t").collect()}
    assert got["k1"] == "u1" and "nope" not in got and len(got) == 32

    dele = spark.createDataFrame([("k2", None)], "vid string, val string")
    store.merge_commit(dele, "tags/t", Mode.DELETE, ["vid"])
    got = {r["vid"]: r["val"] for r in store.read("tags/t").collect()}
    assert "k2" not in got and len(got) == 31


def test_update_missing_table_counts_all_unmatched(spark, tmp_path):
    store = TableStore(tmp_path / "s", spark, n_buckets=4)
    upd = spark.createDataFrame([("a", "1"), ("b", "2")], "vid string, val string")
    v, unmatched = store.merge_commit(upd, "tags/none", Mode.UPDATE, ["vid"])
    assert v == 0 and unmatched == 2
    assert store.read("tags/none") is None
