"""Empirical scale sweep (SCALE.md evidence): run catalog entries at
sf0.1 and at the 10x replica sf1 (tools/gen_scale_data.py), record
wall-clock per SF and the measured scaling factor. A plan whose cost is
~linear in input shows factor ~<=10 (plus fixed overheads amortizing);
a hidden quadratic shows ~100.

Round 10: the default sweep is the FULL catalog (the round-5 sweep
covered only the 23 most expensive entries — a super-linear cheap entry
hides from the sf0.1-only bench gate). Pass entry names to subset.

Usage: python tools/scale_sweep.py [out_json] [entry ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# retained for reference: the round-5 most-expensive subset
SWEEP_R5 = [
    "curation_pipeline",
    "dedup_prune",
    "embedding_kmeans",
    "kmeans_fit_fixed",
    "similar_docs_topk",
    "dedup_against_index",
    "dedup_minhash_lsh",
    "dedup_exact_substring",
    "ann_ivf_topk",
    "ann_bruteforce_np",
    "range_join_bands",
    "lang_id",
    "multimodal_curation",
    "tpch_q7ish",
    "event_funnel",
    "pack_sequences",
    "bpe_train",
    "bpe_subword_tokenize",
    "dedup_prune_priority",
    "similar_docs_topk_warm",
    "dedup_against_index_warm",
    "lm_bigram_cross_entropy",
    "lm_trigram_cross_entropy",
]


def main() -> None:
    from hstream_spark import get_spark
    from hstream_spark.queries import REGISTRY

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sf_small = os.environ.get("SCALE_SMALL", "/root/testdata/sf0.1")
    sf_big = os.environ.get("SCALE_BIG", os.path.join(repo, ".scale", "sf1"))
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        repo, ".scale", "sweep.json"
    )
    sweep = sys.argv[2:] or sorted(REGISTRY)
    spark = get_spark("scale-sweep")
    spark.range(1).count()
    results: dict[str, dict] = {}
    for name in sweep:
        q = REGISTRY[name]
        row: dict = {}
        for label, sf in (("sf0.1", sf_small), ("sf1", sf_big)):
            best = float("inf")
            try:
                for _ in range(2):
                    t = time.perf_counter()
                    q.builder(spark, sf).write.mode("overwrite").format(
                        "noop"
                    ).save()
                    best = min(best, time.perf_counter() - t)
                row[label] = round(best, 3)
            except Exception as exc:  # noqa: BLE001 — record, keep sweeping
                row[label] = f"ERROR: {type(exc).__name__}: {exc}"[:200]
            spark.catalog.clearCache()
        if isinstance(row.get("sf0.1"), float) and isinstance(
            row.get("sf1"), float
        ):
            row["factor"] = round(row["sf1"] / max(row["sf0.1"], 1e-9), 2)
        results[name] = row
        print(json.dumps({name: row}), flush=True)
    with open(out_path, "w") as fh:
        json.dump(results, fh, indent=1)
    print("wrote", out_path)
    spark.stop()


if __name__ == "__main__":
    main()
