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


def test_composed_pipeline_across_compaction(spark):
    # 5 cycles crosses the cycle-3 stream compaction: the rewritten
    # segments must NOT re-enter the batch step (arrival ledger on
    # (doc_id, _ts) — a compaction re-read keeps its event time, a
    # genuine resend gets a new one)
    from curation_soak import soak

    result = soak(spark, "/root/testdata/sf0.001", cycles=5, per_cycle=40)
    s = result["summary"]
    cycles = result["cycles"]

    assert s["ok"] is True
    assert len(cycles) == 5
    # every produced record reached the engine through the wire client
    assert all(m["polled"] == m["produced"] for m in cycles)
    # and exactly once: cycle 4 (right after compaction) processes only
    # its own records, not the rewritten history
    assert all(m["arrivals"] == m["produced"] for m in cycles)
    assert cycles[4]["exact_dup"] < cycles[4]["produced"]
    # the standing index rejected the resent/mutated docs
    assert s["dup_rejected"] > 0
    # cycle 1+ resends ~25% exact: they must be flagged exact_dup
    assert cycles[1]["exact_dup"] > 0 and cycles[2]["exact_dup"] > 0
    # curated sink holds exactly the accepted rows (no loss, no dup)
    assert s["curated_rows_on_disk"] == s["total_accepted"]
    # accepted ≤ quality-kept ≤ arrivals, strictly monotone filtering
    for m in cycles:
        assert m["accepted"] <= m["quality_kept"] <= m["arrivals"]
    # index grows only with accepted uniques: band files only append
    assert cycles[-1]["index_files"]["bands"] >= cycles[0]["index_files"]["bands"]
