"""Streaming batch-0 decomposition (VERDICT r6 #3).

BENCH_STREAM_AMORTIZE showed q100's batch-0 at 7.48 s vs 2.8-3.0 s
steady-state per 10M-row batch at 400x. This experiment decomposes that
gap by separating the two candidate causes:

  (a) ONE-TIME-PER-JVM cost: whole-stage codegen compilation + JIT warmup
      of the join/state-store code paths. Test: run the SAME flow twice in
      one session with fresh checkpoints/query names — if run 2's batch-0
      collapses toward steady-state, the gap is JVM warmup, which on a real
      cluster amortizes over the executor lifetime (hours-days), not per
      query.
  (b) PER-QUERY cost: state-store instance creation, offset-log/WAL
      bootstrap, first-shuffle setup. Whatever batch-0 overhead REMAINS on
      the warmed second run is this irreducible per-query floor.

Also records the engine's own durationMs phase breakdown (queryPlanning /
getBatch / addBatch / walCommit / commitOffsets) for batch-0 vs the steady
mean of each run, so the residual is attributed, not guessed.

Usage:  python tools/exp_batch0.py [factor=400] [n_batches=8]
Writes BENCH_STREAM_BATCH0.json; conclusions are pinned in
streaming/queries.py's q100 docstring.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from wikipediaetl_spark.session import get_spark

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_once(spark, split_dir: str, parts: int) -> dict:
    """One full incremental run of the q100 flow; per-batch phase timings."""
    import time
    import uuid

    from tools.exp_stream_amortize import q100_flow

    name = "b0_" + uuid.uuid4().hex[:10]
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(parts))
    try:
        t0 = time.perf_counter()
        q = (
            q100_flow(spark, split_dir)
            .writeStream.outputMode("append")
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
        if p.get("numInputRows", 0) == 0:
            continue
        d = p.get("durationMs", {})
        batches.append(
            {
                "batch_id": p["batchId"],
                "trigger_ms": d.get("triggerExecution"),
                "query_planning_ms": d.get("queryPlanning"),
                "get_batch_ms": d.get("getBatch"),
                "add_batch_ms": d.get("addBatch"),
                "wal_commit_ms": d.get("walCommit"),
                "commit_offsets_ms": d.get("commitOffsets"),
                "input_rows": p.get("numInputRows"),
            }
        )
    steady = [b["trigger_ms"] for b in batches[1:]]
    return {
        "total_s": round(total, 2),
        "batch0_ms": batches[0]["trigger_ms"] if batches else None,
        "steady_mean_ms": round(sum(steady) / len(steady), 1) if steady else None,
        "batches": batches,
    }


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    scaled = os.path.join(REPO, ".benchdata", f"scaled{factor}x")
    split = os.path.join(REPO, ".benchdata", f"scaled{factor}x_stream")
    from tools.exp_stream_amortize import build_split

    assert os.path.exists(os.path.join(scaled, "events.parquet")), (
        f"build {scaled} first via tools/bench_scale.py {factor}"
    )
    build_split(scaled, split, n_batches)
    spark = get_spark(
        "exp_batch0",
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(32 * 1024 * 1024),
            "spark.ui.showConsoleProgress": "false",
            "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"),
        },
    )
    from wikipediaetl_spark.streaming.queries import _state_partitions

    parts = _state_partitions(scaled)
    runs = [run_once(spark, split, parts) for _ in range(3)]
    out = {
        "factor": factor,
        "n_batches": n_batches,
        "state_partitions": parts,
        "runs": runs,
        "conclusion": {
            "cold_batch0_ms": runs[0]["batch0_ms"],
            "warm_batch0_ms": [r["batch0_ms"] for r in runs[1:]],
            "steady_mean_ms": [r["steady_mean_ms"] for r in runs],
        },
    }
    path = os.path.join(REPO, "BENCH_STREAM_BATCH0.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["conclusion"], indent=1))
    for i, r in enumerate(runs):
        print(f"run {i}: batch0={r['batch0_ms']}ms steady={r['steady_mean_ms']}ms")
        b0 = r["batches"][0] if r["batches"] else {}
        print("  batch0 phases:", {k: v for k, v in b0.items() if k.endswith("_ms")})


if __name__ == "__main__":
    main()
