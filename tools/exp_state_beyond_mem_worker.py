"""Subprocess worker for the beyond-memory state-store demo (one provider
per JVM — driver heap must be pinned BEFORE the JVM starts, and an
OutOfMemoryError in local mode can take the whole JVM down, so each
provider gets its own process; the parent is exp_state_beyond_mem.py).

Runs a keyed streaming aggregation whose state GROWS monotonically (every
input row is a brand-new key carrying a ~200-byte payload held in the agg
buffer) under a deliberately small driver heap, and reports per-batch state
rows + state memory until either all batches complete or the store dies.

Prints exactly one JSON line on stdout (prefix BEYONDMEM:) so the parent
can parse it out of Spark's log noise.
"""

from __future__ import annotations

import json
import sys
import time


def main() -> None:
    provider, heap, rows_per_batch, n_batches, shuffle_parts = (
        sys.argv[1],
        sys.argv[2],
        int(sys.argv[3]),
        int(sys.argv[4]),
        int(sys.argv[5]),
    )
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[8]")
        .appName(f"beyondmem_{provider.rsplit('.', 1)[-1]}")
        .config("spark.driver.memory", heap)
        .config("spark.sql.shuffle.partitions", str(shuffle_parts))
        .config("spark.sql.streaming.stateStore.providerClass", provider)
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    src = (
        spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", rows_per_batch)
        .option("numPartitions", shuffle_parts)
        .load()
    )
    # every row is a NEW key; the max() buffer pins ~200 B of payload per key
    agg = (
        src.select(
            F.col("value").alias("k"),
            F.concat(F.lpad(F.col("value"), 200, "x")).alias("payload"),
        )
        .groupBy("k")
        .agg(F.max("payload").alias("p"))
    )
    q = (
        agg.writeStream.format("noop")
        .outputMode("update")
        .option("checkpointLocation", f"/tmp/beyondmem_ckpt_{provider.rsplit('.', 1)[-1]}_{rows_per_batch}")
        .trigger(processingTime="0 seconds")
        .start()
    )
    batches: list[dict] = []
    t0 = time.time()
    outcome, err = "completed", None
    try:
        while True:
            time.sleep(0.5)
            if q.exception() is not None:
                outcome, err = "died", str(q.exception())[:400]
                break
            seen = {p["batchId"] for b in batches for p in [b]}
            for p in q.recentProgress:
                if p["batchId"] not in seen and p.get("stateOperators"):
                    so = p["stateOperators"][0]
                    batches.append(
                        {
                            "batchId": p["batchId"],
                            "numRowsTotal": so.get("numRowsTotal"),
                            "stateMemoryBytes": so.get("memoryUsedBytes"),
                            "batch_s": p.get("batchDuration", 0) / 1000.0,
                        }
                    )
            if len({b["batchId"] for b in batches}) >= n_batches:
                break
            if time.time() - t0 > 900:
                outcome, err = "timeout", None
                break
        if outcome == "completed":
            q.stop()
    except BaseException as e:  # noqa: BLE001 — JVM death surfaces many ways
        outcome, err = "died", str(e)[:400]
    batches.sort(key=lambda b: b["batchId"])
    print(
        "BEYONDMEM:"
        + json.dumps(
            {
                "provider": provider.rsplit(".", 1)[-1],
                "heap": heap,
                "outcome": outcome,
                "error": err,
                "batches_completed": len(batches),
                "last_state_rows": batches[-1]["numRowsTotal"] if batches else 0,
                "last_state_mem_mb": round(
                    (batches[-1]["stateMemoryBytes"] or 0) / 1e6, 1
                )
                if batches
                else 0,
                "wall_s": round(time.time() - t0, 1),
                "batches": batches,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
