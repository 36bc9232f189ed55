#!/usr/bin/env python3
"""Assemble SWEEP_256X.json for the round-20 cost-tier extension.

Merges three evidence sources into one artifact, keeping per-row
provenance explicit (the r19 TOP12 rows were verified on the r19 binary;
no operator code changed since — the r20 diff touches Verify/Bench/
StageProbe/gate plumbing only, which the notes record for the reviewer):

  1. SWEEP_256X_TOP12.json           — the 12 costliest rows (r19)
  2. a par_compare line dir           — this round's next-cost-tier rows
  3. optional interval line files     — the sampled-fingerprint rows

Usage:
  tools/merge_sweep256.py <lineDir> <outJson> <dataDir> <codeSha> <notes> \
      [extraLineFile ...]
"""
import glob
import json
import os
import re
import sys


def parse_line(line):
    # "PASS q (N rows)" from check_oracle_one; "PASS q (N rows; staged
    # oracle)" from staged_oracle (PASS* = values equal, order differs —
    # order is not part of the staged contract, still a pass)
    m = re.match(r"PASS\*? (\S+) \((\d+) rows(; [^)]*)?\)", line)
    if m:
        row = {"status": "PASS", "rows": int(m.group(2))}
        if m.group(3):
            row["mode"] = m.group(3)[2:].replace("staged oracle",
                                                 "staged-oracle")
        return m.group(1), row
    m = re.match(r"PASS (\S+)", line)
    if m:
        return m.group(1), {"status": "PASS", "rows": None}
    m = re.match(r"(FAIL|SKIP) (\S+?):? (.*)", line)
    if m:
        status = "SKIPPED" if m.group(1) == "SKIP" else "FAIL"
        return m.group(2), {"status": status, "rows": None,
                            "detail": m.group(3).strip()}
    return None, None


def main():
    if len(sys.argv) < 6:
        sys.exit(__doc__)
    line_dir, out_json, data_dir, sha, notes = sys.argv[1:6]
    extra = sys.argv[6:]

    queries = {}
    top12 = json.load(open("SWEEP_256X_TOP12.json"))
    for q, row in top12["queries"].items():
        row = dict(row)
        row["provenance"] = f"SWEEP_256X_TOP12.json (r19, {top12['code_sha']})"
        queries[q] = row

    files = sorted(glob.glob(os.path.join(line_dir, "*.line"))) + extra
    for f in files:
        for line in open(f):
            line = line.strip()
            if not line:
                continue
            q, row = parse_line(line)
            if q is None:
                sys.exit(f"unparseable status line in {f}: {line!r}")
            queries[q] = row  # this round's rows override any top12 dup

    n_pass = sum(1 for r in queries.values() if r["status"] == "PASS")
    n_fail = sum(1 for r in queries.values() if r["status"] == "FAIL")
    n_skip = sum(1 for r in queries.values() if r["status"] == "SKIPPED")
    art = {
        "metric": "scale_oracle_sweep",
        "data_dir": data_dir,
        "copies": 256,
        "base_sf": top12["base_sf"],
        "code_sha": sha,
        "n_pass": n_pass,
        "n_fail": n_fail,
        "n_skipped": n_skip,
        "n_queries": len(queries),
        "queries": {q: queries[q] for q in sorted(queries)},
        "notes": notes,
    }
    with open(out_json, "w") as fh:
        json.dump(art, fh, indent=1)
        fh.write("\n")
    print(f"{out_json}: {n_pass} pass, {n_fail} fail, {n_skip} skipped "
          f"over {len(queries)}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
