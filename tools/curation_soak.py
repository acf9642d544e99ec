#!/usr/bin/env python
"""End-to-end continuous-ingest curation soak (round-10 verdict item 6).

Every stage below exists and is unit/integration-tested in isolation;
this harness runs them COMPOSED, the reference's actual operating mode
(a long-lived server ingesting, filtering, and materializing
continuously — hstream/src/HStream/Server/Handler/Common.hs:411-499),
for enough cycles to cross every maintenance boundary:

  kafka-stub topic
    → CREATE STREAM raw WITH (KAFKA_TOPIC=.., DURATION=..)   [wire ingest]
    → CREATE STREAM clean AS SELECT .. WHERE ..              [continuous filter]
    → CREATE VIEW ingest_stats .. TUMBLE .. WITH (DURATION=) [windowed view + retention]
    → per-cycle incremental batch step over ONLY the new clean files:
        quality_score gate → within-batch exact dedup →
        dedup_with_index (standing MinHash index) →
        append_to_dedup_index + curated parquet sink
    → janitor passes: vacuum (stream DURATION) every cycle,
      stream compaction every 4 cycles, index compaction at cycle 8,
      view fold (retention) at the engine's delta cadence

Producers resend ~25% of the previous cycle's docs verbatim (exact
dups) and mutate ~10% (near dups), so the standing index must reject
them; state plateaus are the evidence that a year of this loop stays
bounded.

Usage: python tools/curation_soak.py [cycles] [docs_per_cycle] [out_json]
Defaults: 12 cycles x 400 docs from $SPARK_GRAFT_SF_DIR (sf0.1),
out .scale/curation_soak.json. Prints one summary JSON line last.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def parquet_files(path: str) -> set:
    try:
        return {f for f in os.listdir(path) if f.endswith(".parquet")}
    except OSError:
        return set()


def soak(spark, sf_dir: str, cycles: int, per_cycle: int) -> dict:
    """Run the composed pipeline for ``cycles`` ingest cycles; returns
    {"summary": .., "cycles": [per-cycle metrics]}. Separated from
    main() so tests/test_curation_soak.py drives the same code path at
    sf0.001 scale."""
    from pyspark.sql import functions as F

    from hstream_spark.operators import dedup as D
    from hstream_spark.operators import text as TX
    from hstream_spark.sources.kafka_stub import KafkaStubBroker
    from hstream_spark.sources.kafka_wire import KafkaClient
    from hstream_spark.sources.tables import load_table
    from hstream_spark.streaming.runtime import HStreamEngine

    corpus = [
        (r["doc_id"], r["text"], r["source"])
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", "text", "source")
        .collect()
    ]
    if cycles * per_cycle > len(corpus):
        per_cycle = len(corpus) // cycles
        print(f"capping per_cycle to {per_cycle} ({len(corpus)} docs)")

    root = tempfile.mkdtemp(prefix="hstream_soak_")
    idx_path = os.path.join(root, "dedup_index")
    sink_path = os.path.join(root, "curated")
    # simulated event time advances 60 s per cycle so stream DURATION
    # (wall-mtime based) and view DURATION (event-time based) both age
    t0 = time.time() - cycles * 60 - 120

    metrics: list[dict] = []
    summary: dict = {"cycles": cycles, "per_cycle": per_cycle, "sf_dir": sf_dir}
    broker = KafkaStubBroker()  # serving starts on construction
    producer = None
    eng = None
    try:
        broker.create_topic("docs", partitions=2)
        producer = KafkaClient(broker.bootstrap)
        # streaming state partitions low for micro-batch latency (the
        # bench_streaming lesson); stream backlog retention 150 s of
        # wall time ≈ the mid-soak point, so vacuum provably drops files
        eng = HStreamEngine(spark, os.path.join(root, "engine"),
                            grace="3650 days",
                            streaming_shuffle_partitions=4)
        eng.execute(
            "CREATE STREAM raw (doc_id INTEGER, text STRING, source STRING) "
            "WITH (\"kafka_topic\" = 'docs', "
            f"\"kafka_bootstrap_servers\" = '{broker.bootstrap}', "
            "\"kafka_poll_interval_ms\" = 0, "  # manual poll: deterministic
            # backlog retention short enough that vacuum provably drops
            # aged files INSIDE the recorded run (~11 s/cycle x 12)
            "DURATION = INTERVAL 60 SECOND);"
        )
        tailer = eng.connectors["__kafka_raw"].handle
        # continuous structural filter: junk-length pages never reach
        # the batch step (the streaming half of the quality gate)
        eng.execute(
            "CREATE STREAM clean AS SELECT doc_id, text, source FROM raw "
            "WHERE STRLEN(text) > 40;"  # dialect name (SQL-v1.cf)
        )
        # windowed ingest-rate view with retention: closed windows
        # beyond 3 min of event time fold away (bounded view state)
        eng.execute(
            "CREATE VIEW ingest_stats AS SELECT source, COUNT(*) AS n "
            "FROM TUMBLE(raw, INTERVAL 30 SECOND) GROUP BY source "
            "WITH (DURATION = INTERVAL 3 MINUTE);"
        )
        clean_path = eng.streams["clean"].path
        seen_files: set = set()
        # Arrival ledger keyed on (doc_id, _ts): stream COMPACTION
        # rewrites small parts into new segment files, so a file-set
        # diff re-reads history — but a compaction re-read carries the
        # SAME event time while a genuine resend carries a new one, so
        # the ledger anti-join filters exactly the re-reads (the same
        # exactly-once discipline a checkpointed streaming consumer
        # gets from Spark; this batch step is a hand-rolled consumer,
        # so it pays for its own)
        ledger_path = os.path.join(root, "arrival_ledger")
        curated_total = 0
        index_built = False

        for c in range(cycles):
            wall0 = time.perf_counter()
            fresh = corpus[c * per_cycle:(c + 1) * per_cycle]
            batch = list(fresh)
            if c > 0:
                prev = corpus[(c - 1) * per_cycle: c * per_cycle]
                batch += prev[::4]  # exact resends (~25%)
                batch += [  # near-dup mutations (~10%), new ids
                    (10_000_000 + d, t + " soaknoise" + str(c), s)
                    for d, t, s in prev[::10]
                ]
            ts_ms = int((t0 + c * 60) * 1000)
            recs = [
                (None, json.dumps(
                    {"doc_id": d, "text": t, "source": s}
                ).encode(), ts_ms)
                for d, t, s in batch
            ]
            for i in range(0, len(recs), 200):
                producer.produce("docs", recs[i:i + 200],
                                 partition=(i // 200) % 2)
            polled = tailer.poll()
            for q in eng.queries.values():
                if q.handle is not None:
                    q.handle.processAllAvailable()

            # incremental batch step: ONLY the files this cycle added
            now_files = parquet_files(clean_path)
            new_files = sorted(now_files - seen_files)
            seen_files = now_files
            m = {"cycle": c, "produced": len(batch), "polled": polled,
                 "new_clean_files": len(new_files)}
            if new_files:
                arrivals = spark.read.parquet(
                    *[os.path.join(clean_path, f) for f in new_files]
                ).select("doc_id", "text", "source", "_ts")
                if os.path.isdir(ledger_path):
                    led = spark.read.parquet(ledger_path)
                    arrivals = arrivals.join(led, ["doc_id", "_ts"], "left_anti")
                arrivals = arrivals.localCheckpoint()
                arrivals.select("doc_id", "_ts").write.mode("append").parquet(
                    ledger_path
                )
                m["arrivals"] = arrivals.count()
                arrivals = arrivals.drop("_ts")
                kept = arrivals.where(
                    TX.quality_score(F.col("text")) >= 0.4
                )
                # within-batch exact dedup (lowest id per content hash)
                firsts = (
                    kept.groupBy(F.md5(F.col("text")).alias("__h"))
                    .agg(F.min("doc_id").alias("doc_id"))
                    .select("doc_id")
                )
                kept = kept.join(firsts, "doc_id").localCheckpoint()
                m["quality_kept"] = kept.count()
                if not index_built:
                    D.build_dedup_index(kept, idx_path)
                    index_built = True
                    accepted = kept
                    m["exact_dup"] = m["near_dup"] = 0
                else:
                    flags = D.dedup_with_index(
                        spark, kept, idx_path, threshold=0.5
                    ).localCheckpoint()
                    m["exact_dup"] = flags.where("exact_dup").count()
                    m["near_dup"] = flags.where(
                        "near_dup AND NOT exact_dup").count()
                    accepted = kept.join(
                        flags.where("NOT exact_dup AND NOT near_dup")
                        .select("doc_id"),
                        "doc_id",
                    ).localCheckpoint()
                    D.append_to_dedup_index(accepted, idx_path)
                n_acc = accepted.count()
                accepted.write.mode("append").parquet(sink_path)
                curated_total += n_acc
                m["accepted"] = n_acc
            # janitor: retention every cycle, compaction on cadence
            m["vacuumed"] = eng.vacuum()
            if c % 4 == 3:
                comp = eng.compact(skip_active=True)
                m["stream_compact"] = {
                    k: v for k, v in comp.items() if isinstance(v, dict)
                }
            if c == 8:
                before = D.index_file_counts(idx_path)
                D.compact_dedup_index(spark, idx_path)
                m["index_compact"] = {
                    "before": before, "after": D.index_file_counts(idx_path)
                }
            m["index_files"] = D.index_file_counts(idx_path) if index_built else {}
            m["bytes"] = {
                "raw": dir_bytes(eng.streams["raw"].path),
                "clean": dir_bytes(clean_path),
                "view_state": dir_bytes(eng.views["ingest_stats"].state_dir),
                "index": dir_bytes(idx_path),
                "curated": dir_bytes(sink_path),
            }
            m["curated_total"] = curated_total
            m["wall_sec"] = round(time.perf_counter() - wall0, 2)
            m["rows_per_sec"] = round(len(batch) / m["wall_sec"])
            metrics.append(m)
            print(json.dumps(m))
            spark.catalog.clearCache()

        # post-soak evidence
        dup_rejected = sum(m.get("exact_dup", 0) + m.get("near_dup", 0)
                           for m in metrics)
        raw_sizes = [m["bytes"]["raw"] for m in metrics]
        view_sizes = [m["bytes"]["view_state"] for m in metrics]
        summary.update(
            total_produced=sum(m["produced"] for m in metrics),
            total_accepted=curated_total,
            dup_rejected=dup_rejected,
            rows_per_sec_median=sorted(
                m["rows_per_sec"] for m in metrics
            )[len(metrics) // 2],
            raw_bytes_first_half_max=max(raw_sizes[: cycles // 2]),
            raw_bytes_final=raw_sizes[-1],
            view_state_bytes_max=max(view_sizes),
            view_state_bytes_final=view_sizes[-1],
            index_files_final=metrics[-1]["index_files"],
            curated_rows_on_disk=spark.read.parquet(sink_path).count(),
        )
        # invariants a healthy composed pipeline must satisfy
        assert summary["curated_rows_on_disk"] == curated_total
        assert dup_rejected > 0, "resent dups must be rejected by the index"
        # plateau invariants (round-12, verdict task 7): once the run
        # crosses the retention horizon and the index compaction
        # (cycle 8), state and trigger time must be BOUNDED — the
        # "a year of this loop stays flat" claim, asserted.
        walls = [m["wall_sec"] for m in metrics]
        summary["wall_sec_first_half_median"] = sorted(
            walls[: cycles // 2])[len(walls[: cycles // 2]) // 2]
        summary["wall_sec_second_half_median"] = sorted(
            walls[cycles // 2:])[len(walls[cycles // 2:]) // 2]
        total_wall = sum(walls)
        summary["total_wall_sec"] = round(total_wall, 1)
        summary["vacuumed_files_total"] = sum(
            m.get("vacuumed", 0) for m in metrics)
        raw_duration_s = 60  # the CREATE STREAM raw DURATION above
        if cycles >= 9:
            # retention evidence: once the run outlives the stream
            # DURATION, vacuum must have dropped aged segment files
            if total_wall >= 1.2 * raw_duration_s:
                assert summary["vacuumed_files_total"] > 0, (
                    "run outlived the stream DURATION but vacuum "
                    "dropped nothing — retention is not holding")
            # raw backlog plateau: only meaningful once the run is long
            # enough that the retention window has turned over a few
            # times past the first half (otherwise the backlog is still
            # in its initial fill and the comparison measures wall
            # speed, not retention)
            if total_wall >= 3 * raw_duration_s:
                assert summary["raw_bytes_final"] <= 1.5 * summary[
                    "raw_bytes_first_half_max"], (
                    "raw stream backlog grew past its first-half "
                    "plateau — vacuum/retention is not holding")
            # windowed view state: DURATION fold keeps closed windows
            # retiring; final state sits at/below the observed max
            assert summary["view_state_bytes_final"] <= summary[
                "view_state_bytes_max"]
            # trigger-time plateau: per-cycle work is constant, the
            # standing index grows — cost per cycle must stay bounded
            # (2.5x allows box noise, not growth trends)
            assert summary["wall_sec_second_half_median"] <= 2.5 * max(
                summary["wall_sec_first_half_median"], 0.1), (
                "per-cycle wall time is trending up — standing-index "
                "or state growth is leaking into the trigger path")
        summary["ok"] = True
    finally:
        if eng is not None:
            eng.shutdown()
        if producer is not None:
            producer.close()
        broker.close()
        shutil.rmtree(root, ignore_errors=True)
    return {"summary": summary, "cycles": metrics}


def main() -> int:
    from hstream_spark import get_spark

    cycles = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    per_cycle = int(sys.argv[2]) if len(sys.argv) > 2 else 400
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_path = sys.argv[3] if len(sys.argv) > 3 else os.path.join(
        repo, ".scale", "curation_soak.json"
    )
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("curation-soak")
    spark.range(1).count()
    try:
        result = soak(spark, sf_dir, cycles, per_cycle)
    finally:
        spark.stop()
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps(result["summary"]))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
