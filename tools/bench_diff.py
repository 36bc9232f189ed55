#!/usr/bin/env python3
"""Compare two Bench JSON files (headline or full-inventory) and flag
regressions: any query slower than FACTOR x its old time (default 2.0,
the same threshold the round verdicts use), plus new/removed queries.

Usage: python3 tools/bench_diff.py OLD.json NEW.json [factor] [--allow q1,q2]
Exit code 1 if any regression is found — usable as a gate.

--allow marks queries whose slowdown is a DELIBERATE, documented trade
(e.g. switching a query to a scale-safe plan that does more work at toy
scale): they are still printed, but do not fail the gate. An allowed
name that did NOT regress is an error — stale allowlists hide real
regressions.
"""
import json
import sys


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--allow")]
    allow = set()
    for a in sys.argv[1:]:
        if a.startswith("--allow="):
            allow = set(a.split("=", 1)[1].split(","))
        elif a == "--allow":
            print("use --allow=q1,q2")
            return 2
    if len(args) < 2:
        print(__doc__)
        return 2
    def queries(path):
        d = json.load(open(path))
        if "parsed" in d:  # driver wrapper (BENCH_rN.json)
            d = d["parsed"]
        if "bench" in d:  # anchor wrapper (BENCH_ANCHOR.json)
            d = d["bench"]
        return d["queries"]

    old = queries(args[0])
    new = queries(args[1])
    factor = float(args[2]) if len(args) > 2 else 2.0

    regressions = []
    allowed = []
    for name in sorted(set(old) & set(new)):
        o, n = old[name], new[name]
        if n < 0 and o >= 0:
            regressions.append((name, o, n, "BROKE"))  # never allowable
        elif o > 0 and n > o * factor:
            (allowed if name in allow else regressions).append(
                (name, o, n, f"{n / o:.1f}x"))
    stale = sorted(allow - {name for name, *_ in allowed})

    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))
    tot_o = sum(v for v in old.values() if v >= 0)
    tot_n = sum(v for v in new.values() if v >= 0)
    print(f"total: {tot_o:.1f}s -> {tot_n:.1f}s "
          f"({len(old)} -> {len(new)} queries)")
    if added:
        print(f"added ({len(added)}): {', '.join(added)}")
    if removed:
        print(f"removed ({len(removed)}): {', '.join(removed)}")
    if allowed:
        print(f"\nallowed regressions (deliberate, > {factor}x):")
        for name, o, n, tag in allowed:
            print(f"  {name:40s} {o:6.2f}s -> {n:6.2f}s  {tag}")
    if regressions:
        print(f"\nREGRESSIONS (> {factor}x):")
        for name, o, n, tag in regressions:
            print(f"  {name:40s} {o:6.2f}s -> {n:6.2f}s  {tag}")
    else:
        print(f"no regression > {factor}x")
    # stale allows fail the gate too, but only after all reporting so a run
    # with both a stale entry and real regressions still shows the regressions
    if stale:
        print(f"STALE --allow entries (did not regress): {', '.join(stale)}")
    return 1 if (regressions or stale) else 0


if __name__ == "__main__":
    sys.exit(main())
