"""Sweep-staleness guard (VERDICT r5 #9).

Rounds 4 and 5 each caught a stale selfcheck artifact by hand (queries
added after the sweep ran were silently absent from it). This makes the
check structural: the NEWEST pair of selfcheck artifacts
(``SELFCHECK_r{N}_typed.json`` / ``SELFCHECK_r{N}_sf01.json``) must cover
exactly the current catalog's query set with zero failures, or validation
fails. Run standalone or via ``tools/validate_all.sh``; unit-tested in
``tests/test_catalog.py``.
"""

from __future__ import annotations

import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def latest_sweeps(repo: str = REPO) -> list[str]:
    """Paths of the newest round's selfcheck artifacts (both SFs)."""
    rounds: dict[int, list[str]] = {}
    for name in os.listdir(repo):
        m = re.match(r"SELFCHECK_r(\d+)_(typed|sf01)\.json$", name)
        if m:
            rounds.setdefault(int(m.group(1)), []).append(os.path.join(repo, name))
    if not rounds:
        return []
    return sorted(rounds[max(rounds)])


def check_parity(catalog_keys: set[str], repo: str = REPO) -> list[str]:
    """Return a list of human-readable parity violations (empty = green)."""
    problems: list[str] = []
    sweeps = latest_sweeps(repo)
    if len(sweeps) < 2:
        problems.append(
            f"expected a typed+sf01 selfcheck pair for the newest round, found {sweeps}"
        )
    for path in sweeps:
        d = json.load(open(path))
        swept = set(d.get("queries", {}))
        missing = sorted(catalog_keys - swept)
        extra = sorted(swept - catalog_keys)
        if missing:
            problems.append(f"{os.path.basename(path)}: catalog queries not swept: {missing}")
        if extra:
            problems.append(f"{os.path.basename(path)}: swept queries no longer in catalog: {extra}")
        fails = d.get("summary", {}).get("fail")
        if fails:
            problems.append(f"{os.path.basename(path)}: {fails} failing queries")
    return problems


def main() -> int:
    sys.path.insert(0, REPO)
    import __spark_entry__ as entry

    problems = check_parity(set(entry.queries()))
    for p in problems:
        print(f"SWEEP PARITY: {p}", file=sys.stderr)
    if not problems:
        sweeps = [os.path.basename(s) for s in latest_sweeps()]
        print(f"sweep parity OK: {sweeps} cover all {len(entry.queries())} catalog queries")
    return 1 if problems else 0


if __name__ == "__main__":
    raise SystemExit(main())
