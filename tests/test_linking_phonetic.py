import pytest

from nebula_importer_spark.operators.linking import (
    phonetic_block_pairs,
    soundex_key,
)


def _py_soundex(name):
    """Independent reference of the pinned simplified variant."""
    import re

    up = re.sub(r"[^A-Za-z]", "", name or "").upper()
    if not up:
        return None
    m = "01230120022455012623010202"
    coded = "".join(m[ord(ch) - 65] for ch in up)
    for d in "123456":
        coded = re.sub(d + "{2,}", d, coded)
    digits = coded[1:].replace("0", "")
    return up[0] + (digits + "000")[:3]


def test_soundex_key_reference_parity(spark):
    names = [
        "Robert", "Rupert", "Ashcraft", "Tymczak", "Pfister", "Honeyman",
        "o'brien", "Washington", "Lee", "Gutierrez", "Jackson", "", None,
        "42", "A", "Euler", "Gauss", "Hilbert", "Knuth", "Lloyd",
        "VanDeusen", "McDonald", "O O O", "zzz  zzz",
    ]
    df = spark.createDataFrame(
        [(i, n) for i, n in enumerate(names)], "id long, name string"
    )
    got = {
        r.id: r.sk
        for r in df.select("id", soundex_key("name").alias("sk")).collect()
    }
    for i, n in enumerate(names):
        assert got[i] == _py_soundex(n), n
    # sound-alikes collide, the point of the key
    assert _py_soundex("Robert") == _py_soundex("Rupert") == "R163"
    assert _py_soundex("Smith") == _py_soundex("Smyth")


def test_phonetic_block_pairs_and_guard(spark):
    rows = [(1, "Robert"), (2, "Rupert"), (3, "Smith"), (4, "Smyth"),
            (5, "Knuth"), (6, None)]
    # a mega block: 40 ids sharing one name -> dropped under the cap
    rows += [(100 + i, "Common") for i in range(40)]
    df = spark.createDataFrame(rows, "id long, name string")
    got = {
        (r.id_a, r.id_b): r.skey
        for r in phonetic_block_pairs(df, max_block_size=10).collect()
    }
    assert got == {(1, 2): "R163", (3, 4): "S530"}
    with pytest.raises(ValueError, match="max_block_size"):
        phonetic_block_pairs(df, max_block_size=1)
    with pytest.raises(ValueError, match="not in input"):
        phonetic_block_pairs(df, name_col="zz")


def test_fuse_records_majority_and_ties(spark):
    from nebula_importer_spark.operators.linking import fuse_records

    rows = [
        ("c1", 1, "Alice", "NYC"),
        ("c1", 2, "Alice", "NY"),
        ("c1", 3, "Alyce", "NYC"),
        ("c2", 4, None, "LA"),
        ("c2", 5, None, None),
        # c3: 1-1 tie on name -> smallest value wins
        ("c3", 6, "Bob", "SF"),
        ("c3", 7, "Ann", "SF"),
    ]
    df = spark.createDataFrame(
        rows, "canonical_id string, doc_id long, name string, city string"
    )
    got = {
        r.canonical_id: (r.n_members, r.fused_name, r.fused_city)
        for r in fuse_records(df, fields=["name", "city"]).collect()
    }
    assert got["c1"] == (3, "Alice", "NYC")
    assert got["c2"] == (2, None, "LA")  # all-NULL field fuses to NULL
    assert got["c3"] == (2, "Ann", "SF")  # tie -> value-ascending


def test_fuse_records_validation(spark):
    import pytest

    from nebula_importer_spark.operators.linking import fuse_records

    df = spark.createDataFrame(
        [("c", 1, "x")], "canonical_id string, doc_id long, name string"
    )
    with pytest.raises(ValueError, match="non-empty"):
        fuse_records(df, fields=[])
    with pytest.raises(ValueError, match="not in input"):
        fuse_records(df, fields=["zz"])
