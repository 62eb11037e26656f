#!/usr/bin/env python3
"""Render the sealed BENCH_LAST.json into the driver's parsed bench shape.

The driver's per-round BENCH_rNN.json has carried `"parsed": null` with
the numbers embedded in a raw log-tail string since r15 (VERDICT r17
hygiene item #8): its log scraper loses the one-line Bench JSON when sbt
wraps/truncates it. The repo-owned seal artifact (BENCH_LAST.json,
written directly to disk by graft.Bench, never through a log) always has
the full payload — this emitter projects it onto the driver's expected
parsed shape so round-over-round comparisons never need log scraping:

    {"metric": ..., "value": N, "unit": "sec", "queries": {name: sec}, "sf": ...}

Usage: python3 tools/bench_parsed.py [BENCH_LAST.json [BENCH_PARSED.json]]
"""
import json
import sys


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else "BENCH_LAST.json"
    dst = sys.argv[2] if len(sys.argv) > 2 else "BENCH_PARSED.json"
    full = json.load(open(src))
    parsed = {k: full[k] for k in ("metric", "value", "unit", "queries", "sf")
              if k in full}
    # provenance + idle-gate context a reader of the parsed shape wants
    for k in ("ts", "ext_cores", "load_ok", "passes", "agg"):
        if k in full:
            parsed[k] = full[k]
    with open(dst, "w") as f:
        json.dump(parsed, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {dst} ({len(parsed.get('queries', {}))} queries, "
          f"total {parsed.get('value')}s)")


if __name__ == "__main__":
    main()
