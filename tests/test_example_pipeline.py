"""Integration smoke for the end-to-end curation example: every stage
of examples/curate_training_data.py runs over real testdata and the
stage invariants hold (monotone filtering, split co-location, pack
bounds)."""

from __future__ import annotations

import pytest
import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)

from pyspark.sql import functions as F


@pytest.mark.slow
def test_curation_example_end_to_end(spark, sf_dir):
    from examples.curate_training_data import curate

    stages = curate(spark, sf_dir, max_tokens=64)
    counts = {k: v.count() for k, v in stages.items() if k != "profile"}
    # monotone filtering through the pruning stages
    assert counts["raw"] == counts["normalized"]
    assert counts["quality"] <= counts["normalized"]
    assert counts["ppl_filtered"] <= counts["quality"]
    assert counts["exact_dedup"] <= counts["ppl_filtered"]
    assert counts["near_dedup"] <= counts["exact_dedup"]
    assert counts["decontaminated"] <= counts["near_dedup"]
    assert counts["rebalanced"] <= counts["decontaminated"]
    assert counts["split"] == counts["rebalanced"]
    assert counts["quality"] > 0 and counts["packed"] > 0
    # BPE accounting covers exactly the train split, with subwords
    # for every non-empty doc
    n_train = stages["split"].where(F.col("split") == "train").count()
    assert counts["bpe_tokens"] == n_train
    assert (
        stages["bpe_tokens"].where(F.col("n_subwords") <= 0).count() == 0
    )

    # split never separates identical texts
    per_group = (
        stages["split"]
        .groupBy("text")
        .agg(F.countDistinct("split").alias("k"))
        .agg(F.max("k"))
        .first()[0]
    )
    assert per_group == 1

    # every pack fits the budget unless it is a single oversize doc
    packs = (
        stages["packed"]
        .groupBy("bucket", "pack_seq")
        .agg(F.sum("n_tokens").alias("t"), F.count(F.lit(1)).alias("m"))
        .collect()
    )
    assert packs
    for r in packs:
        assert r["t"] <= 64 or r["m"] == 1

    # sharding keeps every packed row, dense positions per shard
    sh = stages["sharded"]
    assert sh.count() == counts["packed"]
    dense = (
        sh.groupBy("shard")
        .agg(F.count(F.lit(1)).alias("n"), F.max("pos").alias("mx"))
        .where(F.col("n") != F.col("mx"))
        .count()
    )
    assert dense == 0

    # profile reports one row per deliverable column
    prof = {r["column"]: r for r in stages["profile"].collect()}
    assert set(prof) == {"doc_id", "chunk_idx", "chunk_text", "chunk_tokens"}
    assert all(r["n_rows"] == counts["chunks"] for r in prof.values())
    assert prof["chunk_tokens"]["n_null"] == 0
