"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (TPC-H Q1-style pricing
summary) at sf0.001; ``queries()``/``oracle_sql()`` expose the full
oracle-gated catalog from ``hstream_spark.queries`` — one entry per
implemented operator from SURVEY.md §2 plus the data-pipeline
extensions (dedup, similarity search, text analysis, multimodal).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hstream_spark.queries import REGISTRY  # noqa: E402

# Names already driver-sampled in CORRECTNESS_r01/r02.  The driver draws 50
# entries per round from the front of the enumeration, so list the
# never-yet-sampled catalog entries first to converge the driver-proven set
# toward the full catalog (oracles themselves are unchanged).
_ALREADY_SAMPLED = frozenset(
    {
        "affiliate_computed", "agg_basic", "ann_bruteforce_np", "ann_cosine_topk",
        "ann_ivf_topk", "ann_lsh_topk", "between_ops", "boilerplate_signals",
        "cap_per_group", "cast_ops", "cdc_apply_latest", "cross_join_within",
        "datetime_ops", "dedup_components", "dedup_embedding_cosine",
        "dedup_embedding_lsh", "dedup_exact", "dedup_minhash_lsh", "dedup_simhash",
        "distinct_op", "doc_fingerprint", "having_filter", "hop_agg",
        "hypertable_rollup", "interval_join_inner", "interval_join_left",
        "interval_join_using", "join_outer_full", "json_ops", "lang_id",
        "lm_cross_entropy", "multimodal_features", "ngram_jaccard_pairs",
        "null_semantics", "quality_score", "range_join_bands", "salted_join",
        "scalar_array", "scalar_math", "scalar_string", "select_where_project",
        "session_agg", "simhash_signature", "stream_table_join", "token_stats",
        "top_orders_per_customer", "topk_agg", "topkdistinct_agg", "tpch_q1",
        "tpch_q3", "tpch_q5ish", "tpch_q6", "tumble_agg", "union_op", "vocab_top",
        "window_bounds",
    }
)


# Entries added in round 3 (never in any driver sample yet). The 50-row
# sample can't fit every unsampled entry, so rank: (1) pre-round-3
# entries the driver has never sampled (VERDICT r2 item 2 — converge the
# driver-proven set), (2) round-3 additions, (3) already-green rows.
_ROUND3_NEW = frozenset(
    {
        "bm25_search", "dedup_exact_substring", "url_normalize",
        "source_quality_stats", "temperature_sample", "group_train_test_split",
        "pq_encode", "ann_pq_topk", "chunk_documents", "pack_sequences",
        "quality_classifier", "dedup_passage_removal", "containment_pairs", "normalize_text", "pii_redact", "url_dedup", "profile_table", "event_funnel", "cohort_retention",
    }
)


def _driver_order() -> list[str]:
    # embedding_quantize (the one red r2 row — oracle dtype, now cast) is
    # deliberately absent from _ALREADY_SAMPLED so the fix gets re-verified.
    names = list(REGISTRY)
    fresh_old = [
        n for n in names if n not in _ALREADY_SAMPLED and n not in _ROUND3_NEW
    ]
    fresh_new = [n for n in names if n in _ROUND3_NEW]
    seen = [n for n in names if n in _ALREADY_SAMPLED]
    return fresh_old + fresh_new + seen


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return REGISTRY["tpch_q1"].builder(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def _wrap(builder):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            spark.conf.set("spark.sql.session.timeZone", "UTC")
            return builder(spark, sf_dir)

        return run

    return {name: _wrap(REGISTRY[name].builder) for name in _driver_order()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent per query (omitted entries get
    the driver's weaker rows-only check)."""
    return {
        name: REGISTRY[name].oracle
        for name in _driver_order()
        if REGISTRY[name].oracle is not None
    }
