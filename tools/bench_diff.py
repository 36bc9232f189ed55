#!/usr/bin/env python3
"""Compare two Bench JSON files (headline or full-inventory) and flag
regressions: any query slower than FACTOR x its old time (default 2.0,
the same threshold the round verdicts use), plus new/removed queries.

Usage: python3 tools/bench_diff.py OLD.json NEW.json [factor]
Exit code 1 if any regression is found — usable as a gate.
"""
import json
import sys


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    def queries(path):
        d = json.load(open(path))
        if "parsed" in d:  # driver wrapper (BENCH_rN.json)
            d = d["parsed"]
        return d["queries"]

    old = queries(sys.argv[1])
    new = queries(sys.argv[2])
    factor = float(sys.argv[3]) if len(sys.argv) > 3 else 2.0

    regressions = []
    for name in sorted(set(old) & set(new)):
        o, n = old[name], new[name]
        if n < 0 and o >= 0:
            regressions.append((name, o, n, "BROKE"))
        elif o > 0 and n > o * factor:
            regressions.append((name, o, n, f"{n / o:.1f}x"))

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
    if regressions:
        print(f"\nREGRESSIONS (> {factor}x):")
        for name, o, n, tag in regressions:
            print(f"  {name:40s} {o:6.2f}s -> {n:6.2f}s  {tag}")
        return 1
    print(f"no regression > {factor}x")
    return 0


if __name__ == "__main__":
    sys.exit(main())
