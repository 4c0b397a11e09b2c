#!/usr/bin/env python3
"""Per-query bench envelope gate (BASELINE.md, binding from r9).

Compares a bench dump (default BENCH_LAST.json) against
BASELINE_QUERIES.json: a query REGRESSES iff its settled-box median
exceeds max(2 x baseline, baseline + 0.5 s). New queries (absent from
the baseline) are reported for enrollment at their first settled-box
median.

Contended-dump adjudication is MECHANICAL (judge r10 item #3): a dump
carrying the host-load fingerprint (>= LOAD_MIN_HITS CHEAP queries --
baseline median <= CHEAP_SEC, so naturally-high-variance heavy queries
cannot trip it -- whose own max/min spread >= LOAD_SPREAD) is
auto-adjudicated; a median flag is downgraded when either arbiter
clears it:
  1. the dump's `queries_recheck` / `queries_recheck_median`
     (graft.Bench's end-of-run isolated re-read of every flagged
     query) reads inside the limit -- the recheck MIN clears only a
     contended dump (min under load ~ median settled); a settled dump
     requires the recheck MEDIAN inside the limit, so a marginal real
     regression can't be cleared by one lucky fast run, or
  2. the dump is contended (or --mins was passed) and the query's own
     per-run MIN reads inside the limit (BASELINE.md).
A recheck that itself FAILED (Bench's -1.0 sentinel) never clears --
it is reported and the flag stands. Only a flag that survives every
applicable arbiter is a REGRESS.

Usage: python3 scripts/envelope.py [BENCH_dump.json] [--mins]
Exit code 1 iff any query regresses.
"""
import json
import sys

LOAD_SPREAD = 5.0   # per-query max/min ratio that marks a loaded run
LOAD_MIN_HITS = 3   # this many CHEAP spread hits => the DUMP is contended
CHEAP_SEC = 1.0     # only queries this cheap at baseline count as hits


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--mins"]
    force_mins = "--mins" in sys.argv
    dump_path = args[0] if args else "BENCH_LAST.json"
    base = json.load(open("BASELINE_QUERIES.json"))["median_sec"]
    dump = json.load(open(dump_path))
    cur = dump.get("queries", {})
    mins = dump.get("queries_min", {})
    maxs = dump.get("queries_max", {})
    recheck = dump.get("queries_recheck", {})
    recheck_med = dump.get("queries_recheck_median", {})

    # Contention fingerprint counts only CHEAP queries: a heavy query
    # (iterative graph, staged I/O) has legitimate run-to-run spread
    # even on a settled box; a sub-second scan spreading 5x is load.
    # Cheapness comes from the baseline; un-enrolled queries are
    # INELIGIBLE (Bench only rechecks enrolled names, so there is no
    # settled number to judge cheapness by). "Unknown-but-eligible"
    # (the first r12-ADVICE cut) made every un-enrolled query count
    # unconditionally -- a heavy new query whose first run pays
    # one-time staging (corpus_build_run's corpus write) has a
    # structural >=5x spread and would flip a settled dump to
    # CONTENDED, enabling min-clearing for real regressions.
    # Exclusion costs little: the fingerprint has 240+ enrolled
    # candidates; enrollment happens within a round.
    def cheap(n):
        return n in base and base[n] <= CHEAP_SEC
    spread_hits = [n for n in cur
                   if cheap(n)
                   and n in mins and n in maxs and mins[n] > 0
                   and maxs[n] / mins[n] >= LOAD_SPREAD]
    contended = len(spread_hits) >= LOAD_MIN_HITS
    if contended:
        print(f"LOAD    dump carries the contention fingerprint "
              f"({len(spread_hits)} cheap queries with max/min >= "
              f"{LOAD_SPREAD:g}x, e.g. {spread_hits[0]}) "
              f"-- min cross-check enabled")
    use_mins = force_mins or contended

    regressed, cleared, new = [], [], []
    for name, sec in sorted(cur.items()):
        if name not in base:
            new.append((name, sec))
            continue
        limit = max(2 * base[name], base[name] + 0.5)
        if sec <= limit:
            continue
        # A -1.0 recheck means the isolated re-run FAILED: that must
        # surface as a regression, never auto-clear as LOAD-OK.
        re_min = recheck.get(name)
        re_med = recheck_med.get(name, re_min)  # old dumps: min only
        if re_min is not None and re_min < 0:
            regressed.append((name, sec, base[name], limit))
            print(f"RECHECK-FAIL {name}: isolated re-run failed "
                  f"(sentinel {re_min}) -- flag stands")
        elif re_med is not None and 0 <= re_med <= limit:
            cleared.append((name, sec, limit,
                            f"recheck median {re_med:.3f}s"))
        elif use_mins and re_min is not None and 0 <= re_min <= limit:
            cleared.append((name, sec, limit,
                            f"recheck min {re_min:.3f}s (contended dump)"))
        elif use_mins and name in mins and mins[name] <= limit:
            cleared.append((name, sec, limit, f"min {mins[name]:.3f}s"))
        else:
            regressed.append((name, sec, base[name], limit))
    for name, sec, lim, how in cleared:
        print(f"LOAD-OK {name}: median {sec:.3f}s > limit {lim:.3f}s "
              f"but {how} inside it")
    for name, sec, b, lim in regressed:
        print(f"REGRESS {name}: {sec:.3f}s > limit {lim:.3f}s (baseline {b:.3f}s)")
    for name, sec in new:
        print(f"NEW     {name}: {sec:.3f}s (enroll at first settled-box median)")
    missing = sorted(set(base) - set(cur))
    for name in missing:
        print(f"MISSING {name}: in baseline but not in dump")
    print(f"== {len(regressed)} regressed / {len(cleared)} load-cleared / "
          f"{len(new)} new / {len(missing)} missing / {len(cur)} measured ==")
    return 1 if regressed else 0


if __name__ == "__main__":
    sys.exit(main())
