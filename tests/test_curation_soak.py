"""E2E composed continuous-ingest curation pipeline (round-10 verdict
item 6): kafka-stub topic → KAFKA_TOPIC stream → continuous SQL filter
→ windowed view with retention → per-cycle incremental batch step
(quality gate → exact dedup → standing-index near-dup rejection →
index append → curated sink) → janitor passes (vacuum / stream
compaction / index compaction). Each piece has its own tests; this
proves the COMPOSITION — the reference's actual operating mode
(hstream/src/HStream/Server/Handler/Common.hs:411-499)."""

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "tools"),
)


def test_composed_pipeline_three_cycles(spark):
    from curation_soak import soak

    result = soak(spark, "/root/testdata/sf0.001", cycles=3, per_cycle=60)
    s = result["summary"]
    cycles = result["cycles"]

    assert s["ok"] is True
    assert len(cycles) == 3
    # every produced record reached the engine through the wire client
    assert all(m["polled"] == m["produced"] for m in cycles)
    # the standing index rejected the resent/mutated docs
    assert s["dup_rejected"] > 0
    # cycle 1+ resends ~25% exact: they must be flagged exact_dup
    assert cycles[1]["exact_dup"] > 0 and cycles[2]["exact_dup"] > 0
    # curated sink holds exactly the accepted rows (no loss, no dup)
    assert s["curated_rows_on_disk"] == s["total_accepted"]
    # accepted ≤ quality-kept ≤ produced, strictly monotone filtering
    for m in cycles:
        assert m["accepted"] <= m["quality_kept"] <= m["produced"]
    # index grows only with accepted uniques: cycle 2's band files ≥
    # cycle 1's (append) — growth bounded by accepted count, not resend
    assert cycles[-1]["index_files"]["bands"] >= cycles[0]["index_files"]["bands"]
