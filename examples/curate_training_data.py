"""End-to-end training-data curation pipeline — every stage is a
first-class operator from this repo, composed the way a production
corpus run would chain them at 100 TB:

  raw documents
    → normalize_text            (control/zero-width strip, ws collapse)
    → quality_classifier        (logistic keep/drop, calibrated prob)
    → perplexity_bands          (CCNet: drop the per-language tail band)
    → exact dedup               (md5 content hash, keep lowest id;
                                 a web corpus runs url_dedup first)
    → minhash near-dup prune    (banded LSH candidates → components)
    → decontaminate             (distinct n-gram overlap vs eval set)
    → temperature_sample        (rebalance the language mix, T=0.7)
    → group_train_test_split    (leakage-safe: content-hash groups)
    → chunk_documents           (context windows, stride)
    → pack_sequences            (greedy ≤L-token training sequences)
    → deterministic_shuffle     (seeded shard + epoch order)
    → profile_table             (the pre-commit schema/quality report)

Run: python examples/curate_training_data.py [sf_dir]
Prints per-stage row counts and the final profile. Used by
tests/test_example_pipeline.py as an integration smoke at sf0.001.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def curate(spark, sf_dir: str, max_tokens: int = 64) -> dict[str, DataFrame]:
    """Run the full pipeline; returns every intermediate stage keyed by
    name (the test asserts monotone filtering and final invariants)."""
    from hstream_spark.operators import dedup as D
    from hstream_spark.operators import sampling as SMP
    from hstream_spark.operators import text as TX
    from hstream_spark.sources.tables import load_table, spread

    out: dict[str, DataFrame] = {}
    docs = spread(load_table(spark, sf_dir, "documents"))
    out["raw"] = docs

    # 1. normalize text (idempotent on clean corpora)
    docs = docs.withColumn("text", TX.normalize_text(F.col("text")))
    out["normalized"] = docs

    # 2. quality filter — materialize the scored frame before
    #    filtering so the logistic feature tree evaluates once in a
    #    projection (a filter over the computed boolean inlines the
    #    whole tree into FilterExec, which lacks subexpression
    #    elimination). localCheckpoint over persist: blocks free on GC,
    #    so a session running the pipeline repeatedly stays bounded
    scored = TX.quality_classifier(docs).select("doc_id", "keep").localCheckpoint()
    keep = scored.where(F.col("keep")).select("doc_id")
    docs = docs.join(keep, "doc_id")
    out["quality"] = docs

    # 2b. CCNet perplexity banding: drop each language's tail band
    #     (rare-token soup the logistic features under-penalize)
    lm_keep = (
        TX.perplexity_bands(docs, bands=3, keep_bands=(1, 2))
        .where(F.col("keep"))
        .select("doc_id")
    )
    docs = docs.join(lm_keep, "doc_id")
    out["ppl_filtered"] = docs

    # 3. exact dedup: keep the lowest id per content hash
    firsts = (
        docs.groupBy(F.md5(F.col("text")).alias("__h"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    docs = docs.join(firsts, "doc_id")
    out["exact_dedup"] = docs

    # 4. near-dup prune: MinHash-LSH candidates → verified pairs →
    #    connected components → keep each cluster's canonical member
    pairs = D.minhash_near_duplicates(docs, threshold=0.5)
    docs = D.prune_duplicates(docs, pairs, left_col="doc_a", right_col="doc_b")
    out["near_dedup"] = docs

    # 5. decontamination vs a held-out eval set (first 20 ids here)
    eval_set = out["raw"].where(F.col("doc_id") < 20)
    contam = (
        TX.decontaminate(docs, eval_set, n=5)
        .where(F.col("contamination_frac") > 0.5)
        .select("doc_id")
    )
    docs = docs.join(contam, "doc_id", "left_anti")
    out["decontaminated"] = docs

    # 6. temperature-rebalance the language mix
    docs = SMP.temperature_sample(docs, "doc_id", "lang", temperature=0.7)
    out["rebalanced"] = docs

    # 7. leakage-safe split on the content hash
    docs = SMP.group_train_test_split(docs, F.md5(F.col("text")), 0.1)
    out["split"] = docs

    # 7b. train the tokenizer on the curated train split and account
    #     subword tokens (one corpus word-count shuffle; merge rounds
    #     run on the vocabulary frame — model-sized driver traffic)
    train = docs.where(F.col("split") == "train")
    merges = TX.bpe_train(train, merges=10)
    out["bpe_tokens"] = TX.bpe_tokenize(train, merges)

    # 8. chunk the train split into context windows
    chunks = TX.chunk_documents(train, max_tokens=max_tokens)
    out["chunks"] = chunks

    # 9. pack chunks into training sequences
    packed = TX.pack_sequences(
        chunks.select(
            F.concat(
                F.col("doc_id") * 1000, F.col("chunk_idx")
            ).cast("long").alias("doc_id"),
            F.col("chunk_tokens").alias("n_tokens"),
        ),
        max_tokens=max_tokens,
        n_buckets=4,
    )
    out["packed"] = packed

    # 9b. deterministic epoch order: shard + in-shard position derive
    #     from a seeded hash, so every engine/run reproduces the order
    #     and "epoch2" is one cheap re-run with a new seed
    out["sharded"] = SMP.deterministic_shuffle(
        packed, key_col="doc_id", n_shards=4, seed="epoch1"
    )

    # 10. profile the deliverable
    from hstream_spark.operators.relational import profile_table

    out["profile"] = profile_table(
        chunks.select("doc_id", "chunk_idx", "chunk_text", "chunk_tokens")
    )
    return out


def main() -> None:
    from hstream_spark import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("curate-example")
    stages = curate(spark, sf_dir)
    for name, df in stages.items():
        if name == "profile":
            continue
        print(f"{name:>15}: {df.count()} rows")
    print("\nfinal profile:")
    stages["profile"].show(truncate=False)
    spark.stop()


if __name__ == "__main__":
    main()
