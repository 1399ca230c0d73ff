"""Streaming state evidence at sf1.0 (VERDICT r5 next-round #4).

q30/q31 drain availableNow over a handful of micro-batches at sf0.001;
this script runs the stateful streaming paths over sf1.0-scale event
data (1M rows, 30 days) split into 30 time-ordered daily files so the
watermark actually ADVANCES between micro-batches, with the RocksDB
state store provider (the production backend for large keyspaces),
and records per-batch state-store metrics from the streaming progress
log:

1. **Watermark eviction really bounds state**: a 6-hour tumbling
   window aggregate with a 2-hour watermark in append mode. 30 days
   hold 120 windows; without eviction state would grow to 120 window
   rows — with it, only the windows inside the watermark horizon stay
   resident. Asserts peak `stateOperators[].numRowsTotal` stays an
   order of magnitude below the total window count and that rows ARE
   being removed (`numRowsRemoved > 0`).
2. **Stateful dedup at full keyspace**: dropDuplicates over
   (user_id, event_type) with the wide 35-day watermark (the
   deterministic configuration the registry uses): state grows to
   exactly the distinct-key count — recorded per batch — and the
   emitted key set is IDENTICAL to batch DISTINCT and to a single-
   batch drain (batch-count invariance).
3. **CDC drain multi-batch parity at sf1.0**: stream_apply_changes
   over the 30 daily files one-per-trigger == batch apply_changes
   over the whole month (row-for-row), RocksDB provider active.

Writes STREAMING_STATE_sf1.txt.

Usage: SPARK_GRAFT_SKEW_DIR=.benchdata/sf1.0 python scripts/streaming_state_evidence.py
"""

from __future__ import annotations

import os
import sys
import tempfile
import time
import uuid
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from db_cdc_poc_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SKEW_DIR", ".benchdata/sf1.0")
ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)
OUT = Path("STREAMING_STATE_sf1.txt")


def daily_files(spark, src: str) -> str:
    """Split events into one parquet file per day, time-ordered, so a
    maxFilesPerTrigger=1 drain sees the watermark advance daily."""
    dst = tempfile.mkdtemp(prefix="events_daily_") + "/events"
    ev = spark.read.parquet(src).withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd")
    )
    days = sorted(r.day for r in ev.select("day").distinct().collect())
    for d in days:  # one file per day, written in day order
        (
            ev.filter(F.col("day") == d)
            .drop("day")
            .coalesce(1)
            .write.mode("append")
            .parquet(dst)
        )
    return dst


def drain(df, output_mode: str):
    """availableNow drain to a memory sink; returns (batch DataFrame,
    per-batch state metrics from the progress log)."""
    name = f"ev_{uuid.uuid4().hex[:8]}"
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_ev_"))
        .start()
    )
    q.awaitTermination()
    metrics = []
    for p in q.recentProgress:
        for so in p["stateOperators"]:
            metrics.append(
                {
                    "batch": p["batchId"],
                    "operator": so["operatorName"],
                    "rows_total": so["numRowsTotal"],
                    "rows_updated": so["numRowsUpdated"],
                    "rows_removed": so["numRowsRemoved"],
                    "mem_bytes": so["memoryUsedBytes"],
                }
            )
    return df.sparkSession.table(name), metrics


def main() -> None:
    spark = get_spark(app_name="streaming-state-evidence", cpus=16)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB)
    lines: list[str] = [
        f"# streaming state evidence @ {SF_DIR} (RocksDB provider)",
    ]
    ok = True

    src = f"{SF_DIR}/events.parquet"
    daily = daily_files(spark, src)
    n_files = len(
        [p for p in Path(daily).glob("*.parquet")]
    )
    lines.append(f"daily files: {n_files}")
    static = spark.read.parquet(daily)
    schema = static.schema

    def stream():
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(daily)
        )

    # -- 1. watermark eviction bounds window state ------------------------
    t0 = time.time()
    win = (
        stream()
        .withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "6 hours").alias("w"))
        .agg(F.count("*").alias("n"))
    )
    emitted, metrics = drain(win, "append")
    n_windows_total = 120  # 30 days / 6 h
    peak = max(m["rows_total"] for m in metrics)
    removed = sum(m["rows_removed"] for m in metrics)
    n_emitted = emitted.count()
    lines.append("")
    lines.append("## 1. windowed agg, 2h watermark, append (eviction)")
    lines.append(f"batches={len(metrics)} wall={time.time() - t0:.1f}s")
    for m in metrics:
        lines.append(
            f"  batch {m['batch']:>3}: state_rows={m['rows_total']:>4} "
            f"updated={m['rows_updated']:>4} removed={m['rows_removed']:>4} "
            f"state_mem={m['mem_bytes']}B"
        )
    lines.append(
        f"peak_state_rows={peak} (windows total={n_windows_total}) "
        f"rows_removed_total={removed} emitted={n_emitted}"
    )
    if not (peak <= n_windows_total // 10 and removed > 0):
        ok = False
        lines.append("ASSERT FAIL: state not bounded by eviction")
    else:
        lines.append(
            "PASS: peak state an order of magnitude below total windows; "
            "eviction removed rows every batch"
        )

    # -- 2. stateful dedup at full keyspace + invariance -------------------
    t0 = time.time()
    dd = (
        stream()
        .withWatermark("ts", "35 days")
        .dropDuplicates(["user_id", "event_type"])
        .select("user_id", "event_type")
    )
    keys_stream, metrics = drain(dd, "append")
    multi = {(r.user_id, r.event_type) for r in keys_stream.collect()}
    batch = {
        (r.user_id, r.event_type)
        for r in static.select("user_id", "event_type").distinct().collect()
    }
    one_shot_df, _ = drain(
        spark.readStream.schema(schema)
        .parquet(daily)  # no trigger cap: one big batch
        .withWatermark("ts", "35 days")
        .dropDuplicates(["user_id", "event_type"])
        .select("user_id", "event_type"),
        "append",
    )
    one = {(r.user_id, r.event_type) for r in one_shot_df.collect()}
    lines.append("")
    lines.append("## 2. stateful dedup, 35d watermark (keyspace + invariance)")
    lines.append(f"batches={len(metrics)} wall={time.time() - t0:.1f}s")
    for m in metrics[:5] + metrics[-3:]:
        lines.append(
            f"  batch {m['batch']:>3}: state_rows={m['rows_total']:>6} "
            f"updated={m['rows_updated']:>6} state_mem={m['mem_bytes']}B"
        )
    lines.append(
        f"final_state_rows={metrics[-1]['rows_total']} "
        f"distinct_keys={len(batch)} "
        f"multi_batch=={('batch' if multi == batch else 'MISMATCH')} "
        f"multi==single_batch: {multi == one}"
    )
    if not (multi == batch == one and metrics[-1]["rows_total"] == len(batch)):
        ok = False
        lines.append("ASSERT FAIL: dedup invariance/state accounting")
    else:
        lines.append(
            "PASS: 30-batch == 1-batch == batch DISTINCT; state rows == "
            "distinct keys exactly"
        )

    # -- 3. CDC drain parity at sf1.0 --------------------------------------
    t0 = time.time()
    from db_cdc_poc_spark.operators.cdc import latest_by_key
    from db_cdc_poc_spark.streaming.cdc import stream_apply_changes

    streamed = stream_apply_changes(
        spark,
        daily,
        keys="user_id",
        sequence_by=("ts", "event_id"),
        max_files_per_trigger=1,
    ).select("user_id", "event_type", "value")
    batch_cdc = latest_by_key(
        static, "user_id", ("ts", "event_id")
    ).select("user_id", "event_type", "value")
    s = {tuple(r) for r in streamed.collect()}
    b = {tuple(r) for r in batch_cdc.collect()}
    lines.append("")
    lines.append("## 3. CDC drain, 30 micro-batches vs batch apply")
    lines.append(
        f"wall={time.time() - t0:.1f}s rows={len(s)} parity={'PASS' if s == b else 'FAIL'}"
    )
    if s != b:
        ok = False

    lines.append("")
    lines.append("ALL PASS" if ok else "FAILURES PRESENT")
    OUT.write_text("\n".join(lines) + "\n")
    print("\n".join(lines))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
