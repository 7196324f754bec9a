"""Multi-batch streaming amortization measurement (VERDICT r5 #3).

BENCH_NOTES' q100/q149 decomposition argues that the per-row state-store
cost a bounded single-batch run pays up front "amortizes per-batch on an
unbounded stream". This experiment MEASURES that claim instead of arguing
it: the 400x events table is split into N time-contiguous parquet files
(an arriving stream), each workload runs with ``maxFilesPerTrigger=1`` so
every file is one micro-batch, and per-batch trigger durations plus
state-store row counts are read from the StreamingQuery progress log.

The claim is TRUE for a workload iff, as batches progress:
  - marginal per-batch wall stays flat (does not grow with total history);
  - for the watermarked join (q100), state rows plateau/fall once the
    watermark starts evicting — bounded state on an unbounded stream;
  - for the running aggregate (q149/q164), state rows grow with DISTINCT
    KEYS (by design — it is a running per-user aggregate) while per-batch
    wall tracks batch size, not state size.

Usage:
    python tools/exp_stream_amortize.py [factor=400] [n_batches=8]

Writes BENCH_STREAM_AMORTIZE.json at the repo root and prints a summary
table. Results are cited from the q100/q149 docstrings
(streaming/queries.py) and the BENCH_NOTES streaming section.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from pyspark.sql import DataFrame, functions as F

from wikipediaetl_spark.session import get_spark

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build_split(scaled_dir: str, out: str, n_batches: int) -> None:
    """Time-order the scaled events table and slice it into ``n_batches``
    contiguous files, written oldest-first with increasing mtimes so the
    file stream source replays them in event-time order (a live stream)."""
    marker = os.path.join(out, ".split_marker")
    want = f"v1:{n_batches}:{scaled_dir}"
    if os.path.exists(marker) and open(marker).read() == want:
        return
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    n = con.execute(
        f"SELECT count(*) FROM read_parquet('{scaled_dir}/events.parquet')"
    ).fetchone()[0]
    per = (n + n_batches - 1) // n_batches
    for i in range(n_batches):
        con.execute(
            f"""COPY (
              SELECT * FROM read_parquet('{scaled_dir}/events.parquet')
              ORDER BY ts, event_id LIMIT {per} OFFSET {i * per}
            ) TO '{out}/batch_{i:02d}.parquet' (FORMAT PARQUET)"""
        )
        time.sleep(1.1)  # distinct mtimes: the source replays oldest-first
    with open(marker, "w") as f:
        f.write(want)


def _split_stream(spark, split_dir: str) -> DataFrame:
    schema = spark.read.parquet(split_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(split_dir)
    )
    dt = dict(stream.dtypes).get("ts")
    if dt == "bigint":
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif dt == "timestamp_ntz":
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return stream


def q100_flow(spark, split_dir: str) -> DataFrame:
    """The q100 dataflow (streaming/queries.py:296) over the split source."""
    purchases = (
        _split_stream(spark, split_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    clicks = (
        _split_stream(spark, split_dir)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "1 hour")
    )
    return purchases.join(
        clicks,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 30 MINUTES"))
        & (F.col("c_ts") <= F.col("p_ts")),
    ).select("purchase_id", "click_id", "user_id")


def q147_flow(spark, split_dir: str) -> DataFrame:
    """The q147 dataflow (stream-static enrich, streaming/queries.py) over
    the split source: broadcast-join each arriving batch to the customer
    dim, running per-segment aggregate (complete mode, 5-key state)."""
    from wikipediaetl_spark.sources import load_table

    base = split_dir.replace("_stream", "")  # the scaled dir holds the dims
    cust = load_table(spark, base, "customer").select("c_custkey", "c_mktsegment")
    ev = _split_stream(spark, split_dir)
    joined = ev.join(F.broadcast(cust), ev["user_id"] == cust["c_custkey"])
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
    )


def q149_flow(spark, split_dir: str) -> DataFrame:
    from wikipediaetl_spark.streaming.stateful import running_user_stats_exact

    return running_user_stats_exact(_split_stream(spark, split_dir))


def q149_sharded_flow(spark, split_dir: str) -> DataFrame:
    """The catalog q149 form (micro-sharded state, r6)."""
    from wikipediaetl_spark.streaming.stateful import running_user_stats_exact_sharded

    return running_user_stats_exact_sharded(_split_stream(spark, split_dir))


def q164_flow(spark, split_dir: str) -> DataFrame:
    ev = _split_stream(spark, split_dir)
    return ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")).alias(
            "total_cents"
        ),
        F.max("value").alias("max_value"),
    )


def run_incremental(spark, flow, split_dir: str, mode: str, parts: int) -> dict:
    """Run the flow one file per trigger; harvest per-batch progress."""
    import uuid

    name = "amort_" + uuid.uuid4().hex[:10]
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(parts))
    try:
        t0 = time.perf_counter()
        q = (
            flow(spark, split_dir)
            .writeStream.outputMode(mode)
            .format("memory")
            .queryName(name)
            .start()
        )
        try:
            q.processAllAvailable()
            total = time.perf_counter() - t0
            prog = list(q.recentProgress)
        finally:
            q.stop()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    batches = []
    for p in prog:
        if p.get("numInputRows", 0) == 0 and not p.get("stateOperators"):
            continue  # trailing no-data trigger
        state = p.get("stateOperators") or [{}]
        batches.append(
            {
                "batch_id": p["batchId"],
                "trigger_ms": p.get("durationMs", {}).get("triggerExecution"),
                "input_rows": p.get("numInputRows"),
                "state_rows_total": sum(s.get("numRowsTotal", 0) for s in state),
                "state_rows_removed": sum(s.get("numRowsRemoved", 0) for s in state),
            }
        )
    return {"total_s": round(total, 2), "batches": batches}


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    scaled = os.path.join(REPO, ".benchdata", f"scaled{factor}x")
    split = os.path.join(REPO, ".benchdata", f"scaled{factor}x_stream")
    assert os.path.exists(os.path.join(scaled, "events.parquet")), (
        f"build {scaled} first via tools/bench_scale.py {factor}"
    )
    build_split(scaled, split, n_batches)

    spark = get_spark(
        "exp_stream_amortize",
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(32 * 1024 * 1024),
            "spark.ui.showConsoleProgress": "false",
            "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"),
        },
    )
    from wikipediaetl_spark.streaming.queries import _state_partitions

    parts = _state_partitions(scaled)
    out = {"factor": factor, "n_batches": n_batches, "state_partitions": parts}
    prior_path = os.path.join(REPO, "BENCH_STREAM_AMORTIZE.json")
    if os.path.exists(prior_path):  # merge: selective reruns keep other rows
        prior = json.load(open(prior_path))
        if prior.get("factor") == factor and prior.get("n_batches") == n_batches:
            out.update({k: v for k, v in prior.items() if k.startswith("q")})
    only = os.environ.get("SPARK_GRAFT_AMORTIZE_ONLY")
    workloads = [
        ("q100_join", q100_flow, "append"),
        ("q147_enrich", q147_flow, "complete"),
        ("q149_python_state_perkey", q149_flow, "update"),
        ("q149_python_state_sharded", q149_sharded_flow, "update"),
        ("q164_native_state", q164_flow, "update"),
    ]
    if only:
        workloads = [w for w in workloads if w[0] in set(only.split(","))]
    for name, flow, mode in workloads:
        res = run_incremental(spark, flow, split, mode, parts)
        out[name] = res
        walls = [b["trigger_ms"] for b in res["batches"] if b["trigger_ms"]]
        print(f"\n{name}: total {res['total_s']} s over {len(res['batches'])} batches")
        for b in res["batches"]:
            print(
                f"  batch {b['batch_id']}: {b['trigger_ms']} ms, "
                f"in={b['input_rows']}, state={b['state_rows_total']} "
                f"(-{b['state_rows_removed']})"
            )
        if len(walls) > 2:
            head, tail = walls[1], walls[-1]
            out[name]["marginal_trend"] = round(tail / head, 2) if head else None

    with open(os.path.join(REPO, "BENCH_STREAM_AMORTIZE.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("\nwrote BENCH_STREAM_AMORTIZE.json")


if __name__ == "__main__":
    main()
