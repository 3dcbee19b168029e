"""compression_signals — zlib-ratio quality signal (pytest model parity;
no SQL oracle exists for a compressor, the documented exception class)."""

from __future__ import annotations

import zlib

import pytest


def test_model_parity_and_ordering(spark):
    from nebula_importer_spark.operators.text import compression_signals

    import hashlib

    prose = (
        "the cat sat on the mat and looked out at the quiet garden "
        "where a dog ran after the ball before the rain came down "
    ) * 18
    noise = "".join(
        hashlib.sha256(str(i).encode()).hexdigest() for i in range(32)
    )
    rows = [
        (1, prose),
        (2, "spam " * 400),
        (3, noise),
        (4, ""),
        (5, None),
        (6, "a" * 5000),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_bytes, r.n_compressed, r.compression_ppm)
        for r in compression_signals(df).collect()
    }
    for i, t in rows:
        b = (t or "").encode()
        nb, nc = len(b), (len(zlib.compress(b, 6)) if b else 0)
        ppm = (nc * 10**6) // nb if nb else 0
        assert got[i] == (nb, nc, ppm), i
    # ordering: pure repetition ≪ prose < hex noise; empty is 0
    assert got[6][2] < got[2][2] < got[1][2] < got[3][2]
    assert got[4] == (0, 0, 0) and got[5] == (0, 0, 0)


def test_validation(spark):
    from nebula_importer_spark.operators.text import compression_signals

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="level"):
        compression_signals(df, level=0)
    with pytest.raises(ValueError, match="not in input"):
        compression_signals(df, text_col="zz")
