"""Idle-machine headline bench → citable artifact (VERDICT r4 #2).

Runs the standard bench.py (best-of-3 round-robin at sf0.1) but records
the machine-state evidence the claim needs: 1-minute load average before
and after, and a refusal to stamp the artifact when the box was visibly
loaded at start (>2.0) — the r4 lesson was that a 15.76 s run recorded
only as a log line is not a citable number, and a 17.1 s artifact from a
loaded box is not an idle number.

Usage: python tools/bench_idle.py [out=BENCH_IDLE.json]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "BENCH_IDLE.json")
    load_before = os.getloadavg()[0]
    if load_before > 2.0:
        print(f"machine not idle (load {load_before:.2f}) — refusing to stamp an idle artifact")
        return 1
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True,
        text=True,
        cwd=REPO,
    )
    line = [l for l in r.stdout.splitlines() if l.startswith("{")][-1]
    payload = json.loads(line)
    reps = os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")
    payload["methodology"] = (
        f"best-of-{reps} round-robin per query (bench.py), sf0.1, "
        "local[32]; load averages recorded to evidence the idle claim"
    )
    payload["load_1m_before"] = round(load_before, 2)
    payload["load_1m_after"] = round(os.getloadavg()[0], 2)
    with open(out, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
    print(json.dumps(payload))
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    main()
