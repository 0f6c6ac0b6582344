#!/usr/bin/env python3
"""Validate the probe→gate mapping (r16 verdict #6): every row in a
scale-probe JSON must carry a `gates` list whose entries are real
`SparkEntry.queries` keys, so the three evidence files (SCALE_PROBE_*,
CORRECTNESS_*, BENCH_*) join mechanically — probe rows by `gates`,
bench's bare names by the gate's `qNNN` prefix. Usage:

    python3 tools/check_probe_gates.py [scale_probe.json]

Exit 1 on: a row without gates, an unknown gate name, a query-named
probe whose gates differ from itself, a polluted artifact banner
(r19 verdict #2: the committed evidence file must itself certify it
ran idle — a loaded sweep can't be papered over by a round-row
claim), or a row with warm_ratio > 5 and no `note` field (r19
verdict #5: outlier-must-be-documented is a gate, not narrative —
the notes live in ScaleProbe.noteOf and ship inside the row JSON).
The contract keys are parsed from the Scala sources exactly like
tools/gen_api_md.py does."""
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.path.join(ROOT, "src/main/scala/graft")


def contract_names():
    names = set()
    for fn in ["SparkEntry.scala", "queries/AnalyticQueries.scala",
               "queries/PipelineQueries.scala"]:
        src = open(os.path.join(SRC, fn)).read()
        names |= set(re.findall(r'"(q\d+_[a-z0-9_]+)"\s*->\s*\(q\d+ _\)', src))
        names |= set(re.findall(r'"(q\d+_[a-z0-9_]+)"\s*->\s*\(q\d+\s', src))
    return names


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        ROOT, "scale_probe.json")
    doc = json.load(open(path))
    queries = doc["queries"]
    known = contract_names()
    bad = []
    if doc.get("polluted"):
        bad.append(
            f"artifact banner is polluted (preload {doc.get('preload')}, "
            f"band {doc.get('load_band')}) — re-run the sweep idle; a "
            "loaded sweep is not round evidence")
    for name, row in queries.items():
        gates = row.get("gates")
        if not gates:
            bad.append(f"{name}: no gates field")
            continue
        for g in gates:
            if g not in known:
                bad.append(f"{name}: gate '{g}' is not a SparkEntry query")
        if name.startswith("q") and gates != [name]:
            bad.append(f"{name}: query probe must gate itself, got {gates}")
        if row.get("warm_ratio", 0) > 5 and not row.get("note"):
            bad.append(
                f"{name}: warm_ratio {row['warm_ratio']} > 5 with no note "
                "— document the outlier in ScaleProbe.noteOf")
    if bad:
        print(f"FAIL {path}: {len(bad)} mapping problems")
        for b in bad:
            print(f"  {b}")
        sys.exit(1)
    print(f"OK {path}: {len(queries)} probe rows, all gates resolve "
          f"against {len(known)} contract queries")


if __name__ == "__main__":
    main()
