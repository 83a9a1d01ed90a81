"""Regenerate ROTATION.json — the machine-readable window-rotation ledger.

The driver's correctness harness records only the FIRST 50 entries of
``queries()`` each round (``CORRECTNESS_r{N}.json``), so driver evidence
rotates across rounds.  VERDICT r4 item 9 asked for the rotation plan —
which previously lived only in a Python comment — to be machine-readable:
this script maps every declared query to its newest driver-recorded green
round (rows+schema+hash all true, err null) plus its current window
position, so a judge can grep instead of reconstructing the union by hand.

Run from the repo root at round end (after the driver writes
``CORRECTNESS_r{N}.json``)::

    PYTHONPATH=/root/repo python tools/rotation_ledger.py
"""
from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def driver_green_rounds() -> dict[str, list[int]]:
    """query -> sorted rounds with a fully-green driver record."""
    greens: dict[str, list[int]] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r[0-9]*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:  # skip CORRECTNESS_full_r*.json self-runs
            continue
        rnd = int(m.group(1))
        with open(path) as f:
            rows = json.load(f)
        for name, rec in rows.items():
            if (
                rec.get("rows_match")
                and rec.get("schema_match")
                and rec.get("hash_match")
                and rec.get("err") is None
            ):
                greens.setdefault(name, []).append(rnd)
    return {k: sorted(v) for k, v in greens.items()}


def main() -> None:
    sys.path.insert(0, REPO)
    import __spark_entry__ as entry

    names = list(entry.queries())
    oracles = set(entry.oracle_sql())
    greens = driver_green_rounds()

    ledger = {}
    for pos, name in enumerate(names):
        rounds = greens.get(name, [])
        ledger[name] = {
            "window_position": pos if pos < 50 else None,
            "in_current_window": pos < 50,
            "oracle_backed": name in oracles,
            "driver_green_rounds": rounds,
            "newest_driver_green_round": rounds[-1] if rounds else None,
        }

    never = [n for n, r in ledger.items() if r["newest_driver_green_round"] is None]
    summary = {
        "declared_queries": len(names),
        "oracle_backed": len(oracles),
        "rows_only_by_design": len(names) - len(oracles),
        "with_driver_green": len(names) - len(never),
        "never_driver_green": sorted(never),
    }
    out = {"summary": summary, "queries": ledger}
    dest = os.path.join(REPO, "ROTATION.json")
    with open(dest, "w") as f:
        json.dump(out, f, indent=1, sort_keys=False)
        f.write("\n")
    print(f"wrote {dest}: {summary}")


if __name__ == "__main__":
    main()
