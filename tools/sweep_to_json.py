#!/usr/bin/env python3
"""Convert a tools/check_oracle.py per-query log into a committed sweep
artifact (SWEEP_<label>.json): per-query status + row counts + summary +
provenance. Keeps the scale-sweep evidence in the repo instead of /tmp
(the round-13 lesson: a run that isn't committed didn't happen).

Usage: python3 tools/sweep_to_json.py <oracle_log> <out_json> \
           <data_dir> <copies> <git_sha> [notes] [--expect oracle_sql.json]

--expect <oracle_sql.json>: assert every query in the committed oracle
surface has a status in the artifact; exits nonzero (after writing the
artifact, for inspection) naming any query with no recorded status — the
r13/r16 "run-then-record" lapse class dies here, not in reviewer memory.
"""
import json
import re
import sys


def main():
    argv = list(sys.argv[1:])
    expect = None
    if "--expect" in argv:
        i = argv.index("--expect")
        # validate the operand exists: `--expect` as the LAST argument must
        # be a usage error, not an IndexError; and since positionals are
        # consumed by slice below, a notes value literally equal to
        # "--expect" would otherwise be misparsed as the flag
        if i + 1 >= len(argv):
            sys.exit("usage: sweep_to_json.py <oracle_log> <out_json> "
                     "<data_dir> <copies> <git_sha> [notes] "
                     "[--expect oracle_sql.json] — --expect needs a path")
        expect = argv[i + 1]
        del argv[i:i + 2]
    if len(argv) < 5:
        sys.exit("usage: sweep_to_json.py <oracle_log> <out_json> "
                 "<data_dir> <copies> <git_sha> [notes] "
                 "[--expect oracle_sql.json]")
    log, out, data_dir, copies, sha = argv[:5]
    notes = argv[5] if len(argv) > 5 else None
    queries = {}
    n_pass = n_fail = None
    with open(log) as f:
        for line in f:
            line = line.rstrip("\n")
            # EVAL-BOUND <name>: <detail> — the ORACLE EVALUATOR (not the
            # engine, not the comparison) exceeded the sandbox's resource
            # budget; recorded as its own status, distinct from a
            # correctness FAIL, with the evidence in the detail text
            eb = re.match(r"EVAL-BOUND (\S+?): (.*)", line)
            if eb:
                queries[eb.group(1)] = {
                    "status": "EVAL-BOUND", "rows": None,
                    "detail": eb.group(2)[:600]}
                continue
            sk = re.match(r"SKIP (\S+?): (.*)", line)
            if sk:
                # --skip/--after exclusions: recorded with their own status
                # so the committed artifact cannot silently claim full
                # coverage when the comparator only ran a subset
                queries[sk.group(1)] = {
                    "status": "SKIPPED", "rows": None,
                    "detail": sk.group(2)[:200]}
                continue
            m = re.match(r"(PASS\*?|FAIL) (\S+?):? (.*)", line)
            if m:
                status, name, rest = m.groups()
                rows = None
                rm = re.search(r"\((?:rows-only, )?(\d+) rows", rest)
                if rm:
                    rows = int(rm.group(1))
                entry = {"status": status, "rows": rows}
                if "rows-only" in rest:
                    entry["mode"] = "rows-only"
                if "staged oracle" in rest:
                    entry["mode"] = "staged-oracle"
                if status == "FAIL":
                    entry["detail"] = rest[:400]
                queries[name] = entry
                continue
            sm = re.match(r"(\d+) pass, (\d+) fail(?:, (\d+) skipped)?",
                          line)
            if sm:
                n_pass, n_fail = int(sm.group(1)), int(sm.group(2))
    if n_pass is None:
        sys.exit(f"{log}: no summary line — comparator did not finish")
    # recount from the per-query statuses: staged-oracle PASS/FAIL lines
    # (tools/staged_oracle.py) are appended AFTER the comparator's summary
    # line, and a SKIP later resolved by a staged run must count as its
    # final status, not as skipped
    n_pass = sum(
        1 for q in queries.values() if q["status"] in ("PASS", "PASS*"))
    n_fail = sum(1 for q in queries.values() if q["status"] == "FAIL")
    n_eval_bound = sum(
        1 for q in queries.values() if q["status"] == "EVAL-BOUND")
    n_skipped = sum(
        1 for q in queries.values() if q["status"] == "SKIPPED")
    artifact = {
        "metric": "scale_oracle_sweep",
        "data_dir": data_dir,
        "copies": int(copies),
        "base_sf": "/root/testdata/sf0.1",
        "code_sha": sha,
        "n_pass": n_pass,
        "n_fail": n_fail,
        "n_eval_bound": n_eval_bound,
        "n_skipped": n_skipped,
        "n_queries": len(queries),
        "queries": queries,
    }
    if notes:
        artifact["notes"] = notes
    missing = []
    if expect:
        surface = sorted(json.load(open(expect)))
        missing = [q for q in surface if q not in queries]
        artifact["expected_queries"] = len(surface)
        if missing:
            artifact["missing_status"] = missing
    with open(out, "w") as f:
        json.dump(artifact, f, indent=1)
        f.write("\n")
    print(f"{out}: {n_pass} pass, {n_fail} fail, {n_skipped} skipped, "
          f"{n_eval_bound} eval-bound over {len(queries)} queries")
    if missing:
        # written-then-failed: the artifact exists for inspection but the
        # sweep must not exit 0 while any query has no recorded status
        sys.exit(f"{out}: {len(missing)} queries have NO status: "
                 f"{', '.join(missing[:10])}"
                 f"{' …' if len(missing) > 10 else ''}")


if __name__ == "__main__":
    main()
