"""Benchmark harness — driver contract.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query executes its full physical plan via a noop sink (no driver
collect) — measuring scan + shuffle + agg/join work, not result
transfer.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "tpch_q1",
    "tpch_q3",
    "tpch_q5ish",
    "tpch_q6",
    "agg_basic",
    "tumble_agg",
    "hop_agg",
    "session_agg",
    "interval_join_inner",
    "stream_table_join",
    "asof_join_events",
    "salted_join",
    "top_orders_per_customer",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_minhash_lsh_capped",
    "dedup_simhash",
    "ngram_jaccard_pairs",
    "dedup_embedding_lsh",
    "dedup_embedding_lsh_capped",
    "ann_cosine_topk",
    "ann_bruteforce_np",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "lang_id",
    "quality_score",
    "doc_fingerprint",
    "token_stats",
    "tpch_q10ish",
    "tpch_q14ish",
    "tpch_q18ish",
    "tpch_q19ish",
    "sliding_agg",
    "repetition_signals",
    "decontaminate",
    "tpch_q4ish",
    "tpch_q7ish",
    "tpch_q13ish",
    "tpch_q16ish",
    "tpch_q17ish",
    "tpch_q21ish",
    "tpch_q22ish",
    "rollup_agg",
    "cube_agg",
    "agg_stats",
    "percentile_exact",
    "sketch_distinct_users",
    "event_sessionize",
    "deterministic_sample",
    "stratified_sample",
    "embedding_kmeans",
    "kmeans_fit_fixed",
    "linear_probe_fit_fixed",
    "linear_probe_score",
    "logistic_probe_fit",
    "extended_json_scan",
    "kmeans_assign",
    "dedup_prune",
    "dedup_prune_priority",
    "tpch_q12ish",
    "tpch_q15ish",
    "tpch_q9ish",
    "tpch_q2ish",
    "tpch_q8ish",
    "tpch_q11ish",
    "tpch_q20ish",
    "boilerplate_signals",
    "embedding_quantize",
    "cap_per_group",
    "hypertable_rollup",
    "range_join_bands",
    "curation_pipeline",
    "vocab_top",
    "lm_cross_entropy",
    "lm_bigram_cross_entropy",
    "lm_trigram_cross_entropy",
    "bm25_search",
    "dedup_exact_substring",
    "source_quality_stats",
    "temperature_sample",
    "pq_encode",
    "ann_pq_topk",
    "ann_sq_topk",
    "ann_sq_topk_warm",
    "chunk_documents",
    "pack_sequences",
    "bpe_train",
    "bpe_subword_tokenize",
    "quality_classifier",
    "gopher_quality_filters",
    "gopher_repetition_filters",
    "fineweb_quality_filters",
    "c4_quality_filters",
    "line_dedup",
    "line_dedup_against_index",
    "dedup_passage_removal",
    "containment_pairs",
    "normalize_text",
    "pii_redact",
    "url_dedup",
    "profile_table",
    "event_funnel",
    "cohort_retention",
    "semantic_dedup",
    "dedup_against_index",
    "dedup_against_index_warm",
    "corpus_shuffle",
    "perplexity_bands",
    "token_budget_sample",
    "similar_docs_topk",
    "similar_docs_topk_warm",
    "multimodal_curation",
    # round 6: the formerly un-benched catalog tail — mostly cheap
    # scalar/relational/SQL-frontend oracle entries — so the 2x
    # envelope binds catalog-wide (n_queries == catalog size)
    "select_where_project",
    "affiliate_computed",
    "scalar_math",
    "scalar_string",
    "scalar_array",
    "scalar_trig",
    "null_semantics",
    "cast_ops",
    "between_ops",
    "json_ops",
    "datetime_ops",
    "type_predicates",
    "topk_agg",
    "topkdistinct_agg",
    "agg_count_distinct",
    "having_filter",
    "distinct_op",
    "union_op",
    "window_bounds",
    "interval_join_left",
    "interval_join_using",
    "cross_join_within",
    "join_outer_full",
    "simhash_signature",
    "dedup_embedding_cosine",
    "dedup_components",
    "url_normalize",
    "multimodal_features",
    "multimodal_frame_sample",
    "multimodal_resize",
    "cdc_apply_latest",
    "sql_frontend_agg",
    "sql_frontend_scalar",
    "sql_frontend_tumble",
    "sql_frontend_interval_join",
    "sql_frontend_sliding",
    "sql_frontend_having",
    "sql_frontend_hop",
    "sql_frontend_session",
    "sql_frontend_join_using",
    "sql_frontend_natural_join",
    "sql_frontend_json_cast",
    "sql_frontend_subquery",
    "sql_frontend_from_list",
    "lsh_bucket_stats",
    "lsh_recall_eval",
    "pii_detect",
    "time_type_ops",
    "sketch_quantiles",
    "train_test_split",
    "group_train_test_split",
    # round 11
    "dedup_simhash_capped",
    "dsir_select",
]

# Drift yardsticks: three stable-plan queries timed at the START and END
# of every bench run. The box this repo benches on drifts 1.3-5x between
# sessions (BASELINE.md round 2-4 notes); the emitted `drift` factor —
# measured yardstick wall / the calibration below — lets cross-round
# ratios normalize mechanically instead of by hand.
# Calibration history: round-5 pinned {tpch_q1: 1.136, tpch_q6: 0.336,
# agg_basic: 0.292} (min of 4 quiet runs, 2026-08-14 morning); the
# round-5 bench session then ran ~21% fast (drift 0.794). Round-6
# re-derivation on the same date's quiet box read drift 1.061 against
# those constants — i.e. they were accurate again — and re-pinned to
# the round-6 in-bench start/end averages below so drift reads 1.0 on
# this box; divide by 1.061 to convert round-5-era drift values.
YARDSTICKS = ("tpch_q1", "tpch_q6", "agg_basic")
YARDSTICK_CAL = {"tpch_q1": 1.206, "tpch_q6": 0.299, "agg_basic": 0.327}

# Auto-calibration (round 7): hand-re-pinning the constants above every
# round chased the box instead of measuring it — round 5 read drift
# 0.794 and round 6 read 1.115 against pins that were each "fresh".
# Every bench run now appends its start/end yardstick times to
# yardstick_history.jsonl, and calibration is derived as the per-query
# MEDIAN over the last HISTORY_WINDOW runs (start and end samples both
# count, so loaded-run outliers are damped from both directions).  The
# pinned constants remain the cold-start fallback until the history
# holds MIN_HISTORY runs.
HISTORY_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "yardstick_history.jsonl"
)
HISTORY_WINDOW = 9
MIN_HISTORY = 3
# A run whose own drift read past this is a contended sweep; its
# yardstick samples describe the contention, not the box, and must not
# drag the calibration medians (the round-10 driver run, drift 1.378
# with burst steal, polluted the window it was appended to).
HISTORY_MAX_DRIFT = 2.0


def _proc_stat() -> tuple[int, int, int, int] | None:
    """(total, idle, iowait, steal) jiffies from the aggregate cpu line,
    or None off-Linux. One 4 KB read — cheap enough to bracket every
    bench entry. Steal is the signal the start/end yardsticks provably
    cannot see (round-10: 6%+ burst steal mid-sweep while the idle-box
    probes read 0.02%)."""
    try:
        with open("/proc/stat") as fh:
            parts = fh.readline().split()
        vals = [int(x) for x in parts[1:]]
        # user nice system idle iowait irq softirq steal ...
        total = sum(vals[:8])
        steal = vals[7] if len(vals) > 7 else 0
        return total, vals[3], vals[4], steal
    except (OSError, ValueError, IndexError):
        return None


def _env_delta(before, after) -> dict:
    """Steal/iowait/busy percentages over a bracketed interval."""
    if not before or not after:
        return {}
    dt = after[0] - before[0]
    if dt <= 0:
        return {}
    idle = after[1] - before[1]
    iowait = after[2] - before[2]
    steal = after[3] - before[3]
    return {
        "steal_pct": round(100.0 * steal / dt, 2),
        "iowait_pct": round(100.0 * iowait / dt, 2),
        "busy_pct": round(100.0 * (dt - idle - iowait) / dt, 1),
    }


def load_calibration(
    sf: str = "0.1", path: str | None = None
) -> tuple[dict[str, float], str]:
    """Median-of-history calibration; (values, source) where source is
    ``history(n=..)`` or ``pinned``. Records are keyed by scale factor
    — a quick sanity bench at sf0.01 must not drag the sf0.1 medians
    down ~10×. Legacy records without an ``sf`` field were all recorded
    at the default sf0.1. Records that carry their run's measured drift
    are EXCLUDED above HISTORY_MAX_DRIFT: one contended sweep must not
    drag the next round's medians (legacy records without the field
    stay in — damped by the median as before)."""
    import statistics

    try:
        with open(path or HISTORY_PATH) as fh:
            runs = [json.loads(line) for line in fh if line.strip()]
    except (OSError, ValueError):
        runs = []
    runs = [r for r in runs if str(r.get("sf", "0.1")) == str(sf)]
    runs = [
        r for r in runs
        if not (
            isinstance(r.get("drift"), (int, float))
            and r["drift"] > HISTORY_MAX_DRIFT
        )
    ]
    runs = runs[-HISTORY_WINDOW:]

    def _samples(rs, n):
        out = []
        for r in rs:
            for side in ("start", "end"):
                v = r.get(side, {}).get(n)
                if isinstance(v, (int, float)) and v > 0:
                    out.append(float(v))
        return out

    # Two-pass robust estimate: records that PREDATE the drift field
    # (pre-round-11) can still be contended sweeps; a record whose own
    # median sample sits > HISTORY_MAX_DRIFT x the window median on any
    # yardstick describes contention, not the box — drop it and
    # recompute. (Post-round-11 records self-describe via `drift`.)
    first = {}
    for n in YARDSTICKS:
        s = _samples(runs, n)
        if s:
            first[n] = statistics.median(s)

    def _outlier(r) -> bool:
        for n in YARDSTICKS:
            vals = [r.get(side, {}).get(n) for side in ("start", "end")]
            vals = [v for v in vals if isinstance(v, (int, float)) and v > 0]
            if vals and n in first and first[n] > 0:
                if statistics.median(vals) > HISTORY_MAX_DRIFT * first[n]:
                    return True
        return False

    cleaned = [r for r in runs if not _outlier(r)]
    if len(cleaned) >= MIN_HISTORY:
        runs = cleaned
    if len(runs) < MIN_HISTORY:
        return dict(YARDSTICK_CAL), "pinned"
    cal = {}
    for n in YARDSTICKS:
        samples = _samples(runs, n)
        if len(samples) < MIN_HISTORY:
            return dict(YARDSTICK_CAL), "pinned"
        cal[n] = round(statistics.median(samples), 3)
    return cal, f"history(n={len(runs)})"


def append_history(
    yard_start: dict, yard_end: dict, sf: str = "0.1",
    drift: float | None = None,
) -> None:
    try:
        rec = {"t": round(time.time()), "sf": str(sf),
               "start": yard_start, "end": yard_end}
        if drift is not None:
            # self-describing: lets load_calibration drop contended runs
            rec["drift"] = drift
        with open(HISTORY_PATH, "a") as fh:
            fh.write(json.dumps(rec) + "\n")
    except OSError:
        pass


def _load_pins_doc(repo_dir: str | None = None) -> dict:
    repo_dir = repo_dir or os.path.dirname(os.path.abspath(__file__))
    try:
        with open(os.path.join(repo_dir, "BASELINE_PINS.json")) as fh:
            doc = json.load(fh)
        return doc if isinstance(doc, dict) else {}
    except (OSError, ValueError):
        return {}


def load_pins(repo_dir: str | None = None) -> dict:
    """Per-entry sf0.1 pins from BASELINE_PINS.json (tools/gen_pins.py);
    {} when the file is absent or malformed so bench never hard-fails
    on it."""
    pins = _load_pins_doc(repo_dir).get("pins", {})
    return pins if isinstance(pins, dict) else {}


def load_yardstick_round1_pins(repo_dir: str | None = None) -> dict:
    """ROUND-1 yardstick pins — the calibration-creep denominators.
    These must never move with later re-pin rows (gen_pins records the
    FIRST occurrence); falls back to the current pins for older
    BASELINE_PINS.json files without the section."""
    doc = _load_pins_doc(repo_dir)
    r1 = doc.get("yardstick_round1_pins")
    if isinstance(r1, dict) and r1:
        return r1
    return load_pins(repo_dir)


def compute_over_envelope(
    timings: dict[str, float],
    pins: dict[str, dict],
    query_env: dict[str, dict],
    factor: float = 2.0,
) -> dict[str, dict]:
    """Entries slower than ``factor`` x their pin, with their own
    contention evidence attached so the record adjudicates itself."""
    out: dict[str, dict] = {}
    for name, sec in timings.items():
        pin = pins.get(name, {}).get("sec")
        if pin and sec / pin > factor:
            out[name] = {
                "sec": sec,
                "pin": pin,
                "ratio": round(sec / pin, 2),
                **query_env.get(name, {}),
            }
    return out


def compute_cal_creep(
    cal: dict[str, float], pins: dict[str, dict], yardsticks=None
) -> dict[str, float]:
    """Rolling-median calibration vs each yardstick's round-1 pin: the
    median tracker absorbs slow catalog-wide drift (drift factor stays
    ~1.0 while everything ratchets), so this ratio is the creep alarm
    (threshold ~1.5x)."""
    return {
        y: round(cal[y] / pins[y]["sec"], 3)
        for y in (yardsticks or YARDSTICKS)
        if y in cal and pins.get(y, {}).get("sec")
    }


def bench_streaming(spark, sf_dir: str) -> dict:
    """Streaming throughput — the reference's only published benchmark
    genre (hstream-diffflow/bench/throughout-{map,join,reduce}.hs:
    replay records through one operator, report records per interval).
    Here: the sf events table replays through the engine's file-backed
    streams in 64-file micro-batches and drives (a) a stateless
    map/filter continuous query, (b) a tumbling-window aggregate view
    (update mode), and (c) a stream-stream interval join. Reported per
    harness: input records/s and mean per-trigger latency."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from hstream_spark.sources.tables import load_table
    from hstream_spark.streaming.runtime import HStreamEngine

    root = tempfile.mkdtemp(prefix="hstream_bench_stream_")
    # events span ~46 days; a large grace keeps replayed history out of
    # the late-row filter (production tails live data instead).
    # streaming_shuffle_partitions=4: stateful triggers pay a state-
    # store open/commit per shuffle partition, so local micro-batch
    # latency halves vs inheriting the batch 32 and improves again
    # 8→4 (round-5 sweep: join steady-state 1.6→1.3 s; RocksDB was
    # ALSO tried and loses locally — its native open/commit overhead
    # dominates at toy state sizes; a cluster with GBs of state wants
    # RocksDB and its own partition count). minBatchesToRetain=2
    # trims checkpoint retention I/O from every commit (default
    # retains 100 batches of state/offset files): join steady-state
    # 1.2→0.98 s at ~10k rows/trigger. Configs recorded in BASELINE.md.
    old_retain = spark.conf.get("spark.sql.streaming.minBatchesToRetain", None)
    spark.conf.set("spark.sql.streaming.minBatchesToRetain", "2")
    eng = HStreamEngine(spark, root, grace="3650 days",
                        streaming_shuffle_partitions=4)
    out: dict[str, dict] = {}
    try:
        eng.execute(
            "CREATE STREAM bev (event_id INTEGER, user_id INTEGER, "
            "event_type STRING, value FLOAT);"
        )
        ev = load_table(spark, sf_dir, "events").select(
            "event_id", "user_id", "event_type", "value", F.col("ts").alias("_ts")
        )
        # 256 files → 4 micro-batches at the engine's 64-file trigger
        ev.repartition(256).write.mode("append").parquet(eng.streams["bev"].path)

        def run(name: str, sql: str) -> None:
            start = time.perf_counter()
            eng.execute(sql)
            qname = next(reversed(eng.queries))
            handle = eng.queries[qname].handle
            handle.processAllAvailable()
            wall = time.perf_counter() - start
            progress = [p for p in handle.recentProgress if p["numInputRows"]]
            rows = sum(p["numInputRows"] for p in progress)
            trig_ms = [p["durationMs"]["triggerExecution"] for p in progress]
            out[name] = {
                "input_rows": rows,
                "wall_sec": round(wall, 3),
                "records_per_sec": round(rows / wall),
                "triggers": len(trig_ms),
                "trigger_ms_avg": round(sum(trig_ms) / max(len(trig_ms), 1)),
                # steady-state: the first data trigger pays one-time
                # codegen/JIT of the new plan — a long-running stream
                # never sees it again
                "trigger_ms_steady": round(
                    sum(trig_ms[1:]) / max(len(trig_ms) - 1, 1)
                ) if len(trig_ms) > 1 else round(sum(trig_ms)),
            }

        run(
            "map",
            "CREATE STREAM b_map AS SELECT event_id, user_id, value * 2 AS v2 "
            "FROM bev WHERE event_type = 'view';",
        )
        run(
            "reduce",
            "CREATE VIEW b_red AS SELECT user_id, COUNT(*) AS n, SUM(value) AS s "
            "FROM TUMBLE(bev, INTERVAL 1 HOUR) GROUP BY user_id;",
        )
        # two derived substreams joined on user_id within ±10 minutes —
        # the throughout-join shape (both sides replay concurrently)
        eng.execute(
            "CREATE STREAM b_views AS SELECT event_id AS vid, user_id AS vuid "
            "FROM bev WHERE event_type = 'view';"
        )
        eng.execute(
            "CREATE STREAM b_clicks AS SELECT event_id AS cid, user_id AS cuid "
            "FROM bev WHERE event_type = 'click';"
        )
        for q in eng.queries.values():
            if q.handle is not None:
                q.handle.processAllAvailable()
        run(
            "join",
            "CREATE STREAM b_joined AS SELECT vid, cid, vuid FROM b_views "
            "JOIN b_clicks ON b_views.vuid = b_clicks.cuid "
            "WITHIN (INTERVAL 10 MINUTE);",
        )
    finally:
        eng.shutdown()
        shutil.rmtree(root, ignore_errors=True)
        if old_retain is None:
            spark.conf.unset("spark.sql.streaming.minBatchesToRetain")
        else:
            spark.conf.set(
                "spark.sql.streaming.minBatchesToRetain", old_retain
            )
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from hstream_spark import get_spark
    from hstream_spark.queries import REGISTRY, reset_hypertable_layout

    spark = get_spark("hstream_spark-bench")
    spark.range(1).count()

    # Steady-state timing: execute each plan twice and report the second
    # run. The first execution pays one-time JIT compilation of the
    # plan's generated code (AQE's runtime re-plan means the compiled
    # shapes are SF-specific, so a small-SF warm-up doesn't cover them);
    # the second run measures the actual scan/shuffle/agg work — the
    # number that scales with data volume on a long-lived cluster.
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}

    def run_yardsticks() -> dict[str, float]:
        out = {}
        for yname in YARDSTICKS:
            yq = REGISTRY[yname]
            best = float("inf")
            for _ in range(2):
                start = time.perf_counter()
                yq.builder(spark, sf_dir).write.mode("overwrite").format(
                    "noop"
                ).save()
                best = min(best, time.perf_counter() - start)
            out[yname] = round(best, 3)
        return out

    # Per-query contention visibility (round-10 verdict item 1): the
    # start/end yardsticks bound a ~4-minute sweep, so a mid-run steal
    # burst is invisible and un-attributable. Two complementary probes:
    #  (a) every bench entry is bracketed by /proc/stat reads — its own
    #      steal/iowait/busy percentages land in query_env[name];
    #  (b) every PROBE_EVERY entries one micro-yardstick (agg_basic,
    #      the cheapest stable plan, warm after run_yardsticks) samples
    #      box speed into drift_timeline — each entry's local_drift is
    #      the max of its bracketing probes.
    # An entry is flagged `contended` when steal ≥ 1% of its window or
    # local_drift ≥ 1.5 — so a slow number carries its own adjudication.
    run_sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or "0.1"
    cal, cal_source = load_calibration(run_sf)
    PROBE_EVERY = 8
    probe_q = REGISTRY["agg_basic"]
    drift_timeline: list[dict] = []
    query_env: dict[str, dict] = {}
    probe_idx_before: dict[str, int] = {}

    def run_probe(after_n: int) -> None:
        start = time.perf_counter()
        probe_q.builder(spark, sf_dir).write.mode("overwrite").format(
            "noop"
        ).save()
        sec = time.perf_counter() - start
        drift_timeline.append(
            {
                "after_n_queries": after_n,
                "agg_basic": round(sec, 3),
                "ratio": round(sec / cal["agg_basic"], 3),
            }
        )

    yard_start = run_yardsticks()
    run_probe(0)
    for qi, name in enumerate(HEADLINE):
        q = REGISTRY[name]
        probe_idx_before[name] = len(drift_timeline) - 1
        env_before = _proc_stat()
        if name == "hypertable_rollup":
            # deterministic cold/warm split: cold pays the chunked
            # layout write + first full rollup (layout reset per run),
            # warm is a maintenance run with no new chunks
            cold = float("inf")
            for _ in range(max(1, runs)):
                reset_hypertable_layout(sf_dir)
                start = time.perf_counter()
                q.builder(spark, sf_dir).write.mode("overwrite").format("noop").save()
                cold = min(cold, time.perf_counter() - start)
            warm = float("inf")
            for _ in range(max(1, runs)):
                start = time.perf_counter()
                q.builder(spark, sf_dir).write.mode("overwrite").format("noop").save()
                warm = min(warm, time.perf_counter() - start)
            timings["hypertable_rollup_cold"] = round(cold, 3)
            timings["hypertable_rollup_warm"] = round(warm, 3)
        else:
            best = float("inf")
            try:
                for _ in range(max(1, runs)):
                    start = time.perf_counter()
                    q.builder(spark, sf_dir).write.mode("overwrite").format(
                        "noop"
                    ).save()
                    best = min(best, time.perf_counter() - start)
                timings[name] = round(best, 3)
            except Exception as exc:  # noqa: BLE001 — one bad query must
                # not void the whole bench record; surface it in the JSON
                errors[name] = f"{type(exc).__name__}: {exc}"[:300]
        env = _env_delta(env_before, _proc_stat())
        if env:
            query_env[name] = env
        # drop any operator-internal persists so queries don't inherit
        # block-manager pressure from earlier ones
        spark.catalog.clearCache()
        if (qi + 1) % PROBE_EVERY == 0:
            run_probe(qi + 1)
    run_probe(len(HEADLINE))

    # per-entry local drift = worst bracketing probe; contended = hard
    # evidence (steal) or local slowdown during the entry's window
    contended: dict[str, dict] = {}
    for name in HEADLINE:
        i = probe_idx_before.get(name)
        if i is None:
            continue
        after = min(i + 1, len(drift_timeline) - 1)
        local = max(drift_timeline[i]["ratio"], drift_timeline[after]["ratio"])
        env = query_env.get(name, {})
        steal = env.get("steal_pct", 0.0)
        if name in query_env:
            query_env[name]["local_drift"] = round(local, 3)
        if steal >= 1.0 or local >= 1.5:
            contended[name] = {
                "steal_pct": steal,
                "local_drift": round(local, 3),
            }

    yard_end = run_yardsticks()
    ratios = sorted(
        ((yard_start[n] + yard_end[n]) / 2) / cal[n]
        for n in YARDSTICKS
    )
    drift_factor = round(ratios[len(ratios) // 2], 3)  # median
    append_history(yard_start, yard_end, run_sf, drift=drift_factor)
    drift = {
        "factor": drift_factor,
        "start": yard_start,
        "end": yard_end,
        "calibration": cal,
        "calibration_source": cal_source,
        "timeline": drift_timeline,
    }

    # Envelope enforcement (round-11 verdict task 4): every timed entry
    # is compared against its BASELINE_PINS.json pin (generated from
    # BASELINE.md by tools/gen_pins.py); ratio > 2x lands in
    # `over_envelope` with the entry's own contention evidence attached,
    # so a slow record adjudicates itself the way `contended` does.
    # Calibration creep (task 5): the rolling-median yardstick
    # calibration is also compared against each yardstick's ROUND-1 pin
    # — a slow catalog-wide regression would ratchet the medians and
    # read as drift ~1.0, so the creep ratio makes it visible (alert
    # threshold 1.5x).
    over_envelope: dict[str, dict] = {}
    cal_creep: dict[str, float] = {}
    if float(run_sf) == 0.1:  # pins are sf0.1 records
        over_envelope = compute_over_envelope(timings, load_pins(), query_env)
        cal_creep = compute_cal_creep(cal, load_yardstick_round1_pins())

    stream_env_before = _proc_stat()
    try:
        streaming = bench_streaming(spark, sf_dir)
    except Exception as exc:  # noqa: BLE001 — keep the batch record intact
        streaming = {"error": f"{type(exc).__name__}: {exc}"[:300]}
    stream_env = _env_delta(stream_env_before, _proc_stat())
    if stream_env and isinstance(streaming, dict):
        streaming["env"] = stream_env

    total = round(sum(timings.values()), 3)
    sf = run_sf  # single derivation — keeps the calibration key and
    # the recorded sf from ever desynchronizing
    detail = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "errors": errors,
        "streaming": streaming,
        "drift": drift,
        "query_env": query_env,
        "contended": contended,
        "over_envelope": over_envelope,
        "calibration_vs_round1_pin": cal_creep,
        "sf": float(sf),
    }
    # Full per-query record: printed FIRST and mirrored to a sidecar
    # file. The driver captures only a ~2 KB stdout tail, so the LAST
    # line must be compact or the captured tail starts mid-line and the
    # bench gate can't parse it (BENCH_r03 `parsed: null`).
    print(json.dumps(detail))
    repo_dir = os.path.dirname(os.path.abspath(__file__))
    try:
        with open(os.path.join(repo_dir, "BENCH_DETAIL.json"), "w") as fh:
            json.dump(detail, fh, indent=1)
    except OSError:
        pass
    # versioned per-round copy (BENCH_DETAIL_r{n}.json): round n inferred
    # as max(existing BENCH_r*.json)+1 — the driver writes BENCH_r{n}
    # AFTER running bench, so during round n the highest committed record
    # is r{n-1}. Local iteration runs overwrite it; the driver's run is
    # last and wins. Committed per round so per-query regression
    # attribution survives (round-9 verdict item 4).
    try:
        import re as _re

        rounds = [int(m.group(1)) for f in os.listdir(repo_dir)
                  if (m := _re.fullmatch(r"BENCH_r(\d+)\.json", f))]
        n = (max(rounds) + 1) if rounds else 1
        with open(os.path.join(repo_dir, f"BENCH_DETAIL_r{n:02d}.json"),
                  "w") as fh:
            json.dump(detail, fh, indent=1)
    except OSError:
        pass
    summary = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "sf": float(sf),
        "n_queries": len(timings),
        "n_errors": len(errors),
        "drift": drift["factor"],
        "n_contended": len(contended),
        "n_over_envelope": len(over_envelope),
        "calibration_vs_round1_pin": cal_creep,
        "streaming": {
            f"{k}_records_per_sec": v.get("records_per_sec")
            for k, v in streaming.items()
            if isinstance(v, dict) and "records_per_sec" in v
        },
        "detail": "BENCH_DETAIL.json",
    }
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
