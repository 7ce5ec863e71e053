"""Audit BENCH_DETAIL.json for plan-unchanged regressions (round-12
verdict #7): the plan-fingerprint auto-invalidation only catches plan
CHANGES — a Python-side regression that leaves the physical plan intact
(slower driver loop, heavier memo key) hides behind the stored minimum
forever. The raw per-repeat arrays make it detectable: flag any query
whose RECENT raw repeats all sit more than ``factor`` x above its stored
minimum for at least ``window`` trailing repeats (>= two sweeps at the
default SPARK_GRAFT_BENCH_REPEATS=2).

Host noise (BASELINE.md: 2-15x bursts) produces wide spreads with an
occasional fast repeat; a true regression produces a FLOOR above the
record — hence the test is on min(recent), not mean.

Usage: python tools/audit_regressions.py [detail.json] [factor] [window]
Exit status 1 when anything is flagged (usable in a closing sweep).
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def audit(detail: dict, factor: float = 2.0, window: int = 4) -> list[dict]:
    queries = detail.get("queries") or {}
    repeats = detail.get("repeats") or {}
    flagged = []
    for name, rec_min in sorted(queries.items()):
        raw = repeats.get(name) or []
        if len(raw) < window or rec_min <= 0:
            continue
        recent = raw[-window:]
        floor = min(recent)
        if floor > factor * rec_min:
            flagged.append(
                {
                    "name": name,
                    "stored_min": rec_min,
                    "recent_floor": floor,
                    "ratio": round(floor / rec_min, 2),
                    "recent": recent,
                }
            )
    return flagged


def main() -> None:
    path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "BENCH_DETAIL.json"
    )
    factor = float(sys.argv[2]) if len(sys.argv) > 2 else 2.0
    window = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    with open(path) as fh:
        detail = json.load(fh)
    flagged = audit(detail, factor, window)
    for row in flagged:
        print(json.dumps(row))
    print(
        json.dumps(
            {
                "audited": len(detail.get("queries") or {}),
                "flagged": len(flagged),
                "factor": factor,
                "window": window,
            }
        )
    )
    sys.exit(1 if flagged else 0)


if __name__ == "__main__":
    main()
