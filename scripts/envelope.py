#!/usr/bin/env python3
"""Per-query bench envelope gate (BASELINE.md, binding from r9).

Compares a bench dump (default BENCH_LAST.json) against
BASELINE_QUERIES.json: a query REGRESSES iff its settled-box median
exceeds max(2 x baseline, baseline + 0.5 s). New queries (absent from
the baseline) are reported for enrollment at their first settled-box
median. A dump taken under host contention (per-query min/max spread
>= 5x on cheap queries) should be re-read via its per-query MIN before
calling a regression -- pass --mins to do that.

Usage: python3 scripts/envelope.py [BENCH_dump.json] [--mins]
Exit code 1 iff any query regresses.
"""
import json
import sys


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--mins"]
    use_mins = "--mins" in sys.argv
    dump_path = args[0] if args else "BENCH_LAST.json"
    base = json.load(open("BASELINE_QUERIES.json"))["median_sec"]
    dump = json.load(open(dump_path))
    cur = dump.get("queries_min" if use_mins else "queries", {})

    regressed, new = [], []
    for name, sec in sorted(cur.items()):
        if name not in base:
            new.append((name, sec))
            continue
        limit = max(2 * base[name], base[name] + 0.5)
        if sec > limit:
            regressed.append((name, sec, base[name], limit))
    for name, sec, b, lim in regressed:
        print(f"REGRESS {name}: {sec:.3f}s > limit {lim:.3f}s (baseline {b:.3f}s)")
    for name, sec in new:
        print(f"NEW     {name}: {sec:.3f}s (enroll at first settled-box median)")
    missing = sorted(set(base) - set(cur))
    for name in missing:
        print(f"MISSING {name}: in baseline but not in dump")
    print(f"== {len(regressed)} regressed / {len(new)} new / "
          f"{len(missing)} missing / {len(cur)} measured ==")
    return 1 if regressed else 0


if __name__ == "__main__":
    sys.exit(main())
