"""Beyond-memory state-store regime demo (VERDICT r8 residual gap #3).

BENCH_ROCKSDB_STATE.json pinned RocksDB as measured-NEGATIVE for state that
fits the heap; the regime RocksDB exists for — keyed state LARGER than
executor memory — stayed undemonstrated because the main bench session runs
with a 24 GB driver. This experiment pins the other side: a keyed streaming
aggregation whose state grows ~monotonically past the heap (every row a new
key with a ~200 B agg-buffer payload), run under a deliberately small heap
in ISOLATED subprocesses (an OOM in local mode can kill the JVM):

- HDFSBackedStateStoreProvider keeps every store's loaded map versions
  ON-HEAP → expected to die with java.lang.OutOfMemoryError once state
  outgrows the heap;
- RocksDBStateStoreProvider keeps state in NATIVE memory + local SST files
  → expected to complete every batch under the same heap.

Writes BENCH_STATE_BEYOND_MEM.json. Usage:
  python tools/exp_state_beyond_mem.py [heap=1200m] [rows_per_batch=400000] [n_batches=12]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)
HDFS = "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"


def run_worker(provider: str, heap: str, rpb: int, n_batches: int) -> dict:
    short = provider.rsplit(".", 1)[-1]
    shutil.rmtree(f"/tmp/beyondmem_ckpt_{short}_{rpb}", ignore_errors=True)
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tools", "exp_state_beyond_mem_worker.py"),
            provider,
            heap,
            str(rpb),
            str(n_batches),
            "8",
        ],
        capture_output=True,
        text=True,
        timeout=1800,
        cwd=REPO,
    )
    logs = (proc.stderr or "") + (proc.stdout or "")
    oom_lines = [
        ln.strip()
        for ln in logs.splitlines()
        if "OutOfMemoryError" in ln or "GC overhead" in ln
    ]
    for line in proc.stdout.splitlines():
        if line.startswith("BEYONDMEM:"):
            res = json.loads(line[len("BEYONDMEM:") :])
            if oom_lines:
                res["oom_evidence"] = oom_lines[:3]
            return res
    # JVM died before the worker could report — harvest the cause
    tail = (proc.stderr or proc.stdout)[-1200:]
    oom = "OutOfMemoryError" in proc.stderr or "OutOfMemoryError" in proc.stdout
    return {
        "provider": short,
        "heap": heap,
        "outcome": "jvm_killed_oom" if oom else "jvm_killed",
        "error": tail[-400:],
        "batches_completed": None,
        "stderr_tail": tail,
    }


def main() -> None:
    heap = sys.argv[1] if len(sys.argv) > 1 else "1200m"
    rpb = int(sys.argv[2]) if len(sys.argv) > 2 else 400_000
    n_batches = int(sys.argv[3]) if len(sys.argv) > 3 else 12
    out = {
        "heap": heap,
        "rows_per_batch": rpb,
        "n_batches": n_batches,
        "payload_bytes_per_key": 200,
        "runs": {},
    }
    for provider in (HDFS, ROCKSDB):
        res = run_worker(provider, heap, rpb, n_batches)
        out["runs"][res["provider"]] = res
        print(
            res["provider"],
            res["outcome"],
            "batches:",
            res.get("batches_completed"),
            "last_rows:",
            res.get("last_state_rows"),
            "state_mb:",
            res.get("last_state_mem_mb"),
        )
    with open(os.path.join(REPO, "BENCH_STATE_BEYOND_MEM.json"), "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print("wrote BENCH_STATE_BEYOND_MEM.json")


if __name__ == "__main__":
    main()
