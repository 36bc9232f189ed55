#!/usr/bin/env python3
"""Unit checks for the comparator tooling's parsing layers — the pieces
whose failure modes are silent artifact corruption rather than a loud
crash (CTE splitting, comment stripping, sweep-log ingestion). Runs in
<1 s with no Spark/DuckDB work; wired into tools/preflight.sh.
"""
import json
import os
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from staged_oracle import references, split_ctes, strip_comments  # noqa: E402

n_fail = 0


def check(label, cond):
    global n_fail
    if not cond:
        print(f"FAIL selftest: {label}")
        n_fail += 1


# --- strip_comments ---------------------------------------------------
check("line comment removed",
      strip_comments("SELECT a -- c\nFROM t") == "SELECT a \nFROM t")
check("block comment becomes a separator",
      strip_comments("SELECT a/*x*/FROM t") == "SELECT a FROM t")
check("'--' inside a string literal survives",
      strip_comments("SELECT 'a--b' FROM t") == "SELECT 'a--b' FROM t")
check("'/*' inside a quoted identifier survives",
      strip_comments('SELECT "a/*b" FROM t') == 'SELECT "a/*b" FROM t')
check("unterminated block comment swallows the rest",
      strip_comments("SELECT a FROM t /* x").rstrip() == "SELECT a FROM t")

# --- split_ctes -------------------------------------------------------
ctes, final = split_ctes(
    "WITH a AS (SELECT 1 AS x), b AS (SELECT x FROM a) SELECT * FROM b")
check("two CTEs parsed", [c[0] for c in ctes] == ["a", "b"])
check("final select kept", final.strip() == "SELECT * FROM b")

ctes, final = split_ctes("SELECT 1")
check("no WITH chain -> empty list", ctes == [] and final == "SELECT 1")

ctes, _ = split_ctes(
    "WITH RECURSIVE r(id) AS (SELECT 1 UNION SELECT id+1 FROM r "
    "WHERE id < 3) SELECT * FROM r")
check("recursive column list captured",
      ctes[0][0] == "r" and ctes[0][1].strip() == "id")
check("recursion detected via self-reference",
      references(ctes[0][0], ctes[0][2]))

ctes, final = split_ctes(
    "WITH a AS (SELECT ')' AS p, (1+2) AS q FROM t) SELECT p FROM a")
check("paren in string does not end the body",
      "(1+2)" in ctes[0][2] and final.strip() == "SELECT p FROM a")

ctes, final = split_ctes(
    "WITH a AS (SELECT 1), -- b AS (broken\nb AS (SELECT 2) SELECT 3")
check("comment between CTEs cannot inject a phantom CTE",
      [c[0] for c in ctes] == ["a", "b"])

# nested WITH inside a body stays inside that body
ctes, final = split_ctes(
    "WITH a AS (WITH i AS (SELECT 1) SELECT * FROM i) SELECT * FROM a")
check("nested WITH stays in its body",
      len(ctes) == 1 and "WITH i AS" in ctes[0][2])

# --- references -------------------------------------------------------
check("word boundary blocks substring hits",
      not references("a", "SELECT abc FROM tabs"))
check("true reference matches", references("t0", "SELECT * FROM t0 JOIN x"))

# --- sweep_to_json ingestion -----------------------------------------
with tempfile.TemporaryDirectory() as td:
    log = os.path.join(td, "log.txt")
    out = os.path.join(td, "out.json")
    with open(log, "w") as f:
        f.write("PASS q_a (5 rows)\n"
                "FAIL q_b: 3 vs 4 rows, 1 differing; first: x\n"
                "EVAL-BOUND q_c: oracle evaluator exceeded budget\n"
                "SKIP q_d: excluded by --skip/--after\n"
                "\n1 pass, 1 fail, 1 skipped\n"
                "PASS q_d (7 rows; staged oracle)\n")
    r = subprocess.run(
        [sys.executable,
         os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "sweep_to_json.py"),
         log, out, "/tmp/x", "8", "sha"],
        capture_output=True, text=True)
    check("sweep_to_json exits 0", r.returncode == 0)
    d = json.load(open(out))
    check("staged PASS after summary counted",
          d["n_pass"] == 2 and d["n_fail"] == 1)
    check("EVAL-BOUND counted", d["n_eval_bound"] == 1)
    check("resolved SKIP not counted as skipped", d["n_skipped"] == 0)
    check("staged mode recorded",
          d["queries"]["q_d"] == {"status": "PASS", "rows": 7,
                                  "mode": "staged-oracle"})

# --- sweep_to_json --expect coverage gate (r17) -----------------------
with tempfile.TemporaryDirectory() as td:
    log = os.path.join(td, "log.txt")
    out = os.path.join(td, "out.json")
    exp = os.path.join(td, "oracle_sql.json")
    with open(log, "w") as f:
        f.write("PASS q_a (5 rows)\n\n1 pass, 0 fail\n")
    with open(exp, "w") as f:
        json.dump({"q_a": "SELECT 1", "q_missing": "SELECT 2"}, f)
    tool = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "sweep_to_json.py")
    r = subprocess.run(
        [sys.executable, tool, log, out, "/tmp/x", "8", "sha",
         "--expect", exp], capture_output=True, text=True)
    check("--expect: missing status exits nonzero", r.returncode != 0)
    check("--expect: missing query named", "q_missing" in r.stderr + r.stdout)
    d = json.load(open(out))
    check("--expect: artifact still written with missing_status",
          d.get("missing_status") == ["q_missing"])
    # full coverage -> exit 0, no missing_status key
    with open(exp, "w") as f:
        json.dump({"q_a": "SELECT 1"}, f)
    r = subprocess.run(
        [sys.executable, tool, log, out, "/tmp/x", "8", "sha",
         "--expect", exp], capture_output=True, text=True)
    check("--expect: full coverage exits 0", r.returncode == 0)
    check("--expect: no missing_status on full coverage",
          "missing_status" not in json.load(open(out)))

# --- staged_oracle FAIL lines reach STDOUT (r17: a stderr-only exit
# string was recorded as SKIPPED by the tee'd sweep log) ----------------
with tempfile.TemporaryDirectory() as td:
    with open(os.path.join(td, "oracle_sql.json"), "w") as f:
        json.dump({"q_plain": "SELECT 1",
                   "q_shadow": "WITH nation AS (SELECT 1 AS x) "
                               "SELECT * FROM nation"}, f)
    tool = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "staged_oracle.py")
    r = subprocess.run(
        [sys.executable, tool, "/tmp/nonexistent_sf", td, "q_plain"],
        capture_output=True, text=True)
    check("staged: non-WITH oracle rejected nonzero", r.returncode != 0)
    check("staged: FAIL line on stdout", r.stdout.startswith("FAIL q_plain"))
    r = subprocess.run(
        [sys.executable, tool, "/tmp/nonexistent_sf", td, "q_shadow"],
        capture_output=True, text=True)
    check("staged: base-table-shadowing CTE rejected nonzero",
          r.returncode != 0)
    check("staged: shadowing FAIL on stdout names the table",
          r.stdout.startswith("FAIL q_shadow") and "nation" in r.stdout)

if n_fail:
    print(f"\nselftest: {n_fail} FAILED")
    sys.exit(1)
print("selftest: all passed")
