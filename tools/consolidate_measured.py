#!/usr/bin/env python
"""Consolidate per-bench profiler-counter JSONs into PERF_MEASURED.md.

``tools/profile_counters.py --json_out`` writes one JSON per campaign
invocation; measurement campaigns run each bench in its OWN process (a
full-chip bench must not inherit the previous one's live buffers), so a
session produces many files. This merges them — newest result per bench
wins — and writes the combined measured-vs-analytic report.

Usage:
    python tools/consolidate_measured.py /tmp/counters*.json --out PERF_MEASURED.md
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools.profile_counters import write_markdown  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("jsons", nargs="+")
    ap.add_argument("--out", default="PERF_MEASURED.md")
    args = ap.parse_args()

    by_bench: dict[str, dict] = {}
    for path in sorted(args.jsons, key=os.path.getmtime):
        with open(path) as f:
            for row in json.load(f):
                if "analytic" in row:
                    prev = by_bench.get(row["bench"])
                    # newest wins, but never downgrade: a row with measured
                    # counters beats a measured-null one ("measured" is null
                    # when the trace produced no counters), and a row carrying
                    # the by_category audit beats one without it
                    def rank(r):
                        m = r.get("measured") or {}
                        return (bool(m), bool(m.get("by_category")))

                    if prev and rank(prev) > rank(row):
                        continue
                    by_bench[row["bench"]] = row
    results = list(by_bench.values())
    write_markdown(results, args.out)
    print(f"wrote {args.out} ({len(results)} benches)")


if __name__ == "__main__":
    main()
