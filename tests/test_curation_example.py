"""The examples/curation pipeline composes the curation operators
end-to-end: each stage must be monotone non-increasing in rows (except
packing, which re-keys), stages must actually bind on the sf0.001
corpus, and outputs must land with a manifest."""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from examples.curation.pipeline import curate  # noqa: E402


def test_curation_end_to_end(spark, tmp_path):
    counts = curate(
        spark,
        "/root/testdata/sf0.001",
        str(tmp_path / "out"),
        token_budget=2_000,
        pack_budget=256,
    )
    assert counts["input"] > 0
    chain = [
        "input", "after_quality", "after_exact_dedup",
        "after_near_dedup", "after_decontam", "after_budget",
    ]
    for a, b in zip(chain, chain[1:]):
        assert counts[b] <= counts[a], (a, b, counts)
    assert counts["after_budget"] < counts["input"]  # something bound
    assert counts["packs"] >= 1
    assert counts["packed_docs"] == counts["after_budget"]

    out = tmp_path / "out"
    manifest = json.loads((out / "_manifest.json").read_text())
    assert manifest == counts
    packed = spark.read.parquet(str(out / "packed"))
    for c in ("shard", "pack_id", "offset_tokens"):
        assert c in packed.columns
    # every pack respects the budget
    over = (
        packed.groupBy("shard", "pack_id")
        .sum("n_tokens")
        .filter(f"`sum(n_tokens)` > 256")
    )
    assert over.count() == 0
