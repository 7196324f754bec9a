"""RocksDB state-store A/B for the q100 stream-stream join (VERDICT r7 #3's
untried alternative).

Same session, alternating provider per run (HDFS-backed default vs
RocksDBStateStoreProvider — in-box in Spark 4), fresh checkpoint + query
name per run, engine durationMs breakdowns recorded. The question: does
RocksDB move batch-0 or the steady-state floor for a ~2M-row-per-batch
keyed state at local[32]?  (At 100 TB the answer is known to flip: RocksDB
exists for state that exceeds executor heap; this measures the small-state
regime the one-shot bench sits in.)

Usage: python tools/exp_rocksdb_state.py [factor=400] [n_batches=8]
Writes BENCH_ROCKSDB_STATE.json.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from wikipediaetl_spark.session import get_spark

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)
HDFS = "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    scaled = os.path.join(REPO, ".benchdata", f"scaled{factor}x")
    split = os.path.join(REPO, ".benchdata", f"scaled{factor}x_stream")
    from tools.exp_batch0 import run_once
    from tools.exp_stream_amortize import build_split

    build_split(scaled, split, n_batches)
    spark = get_spark(
        "exp_rocksdb",
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(32 * 1024 * 1024),
            "spark.ui.showConsoleProgress": "false",
            "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"),
        },
    )
    from wikipediaetl_spark.streaming.queries import _state_partitions

    parts = _state_partitions(scaled)
    key = "spark.sql.streaming.stateStore.providerClass"
    runs = {}
    # interleave so JVM warmup is shared: hdfs, rocks, hdfs, rocks
    for i, provider in enumerate([HDFS, ROCKSDB, HDFS, ROCKSDB]):
        spark.conf.set(key, provider)
        label = ("hdfs" if provider == HDFS else "rocksdb") + f"_run{i // 2}"
        runs[label] = run_once(spark, split, parts)
        print(label, json.dumps({k: runs[label][k]
                                 for k in ("total_s", "batch0_ms",
                                           "steady_mean_ms")}))
    out = {"factor": factor, "n_batches": n_batches,
           "state_partitions": parts, "runs": runs}
    with open(os.path.join(REPO, "BENCH_ROCKSDB_STATE.json"), "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print("wrote BENCH_ROCKSDB_STATE.json")


if __name__ == "__main__":
    main()
