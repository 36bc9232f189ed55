#!/usr/bin/env python3
"""Staged evaluator for monolithic WITH-chain oracles whose one-shot
working set exceeds the sandbox (corpus_retention_funnel at 32x: DuckDB
materializes every CTE of the chain simultaneously and needs >=155 GB;
the ENGINE ran the same funnel in a 48 GB JVM). This runs the SAME
committed oracle SQL — parsed, not re-written, so the staged form cannot
drift from oracle_sql.json — as a sequence of disk-backed CREATE TABLE
statements in CTE order, DROPping each table as soon as no later body
references it. Per-stage peak is then one operator pipeline, the same
bound the engine's own stage-by-stage shuffle execution enjoys.

A recursive CTE (one whose body references its own name) is materialized
by re-wrapping just that body in WITH RECURSIVE over the
already-materialized predecessor tables.

Usage: python3 tools/staged_oracle.py <sfDir> <verifyOutDir> <query> \
           [memory_limit] [threads] [--selfcheck]

--selfcheck additionally runs the monolithic SQL as-is and asserts the
staged result matches it (use at small sf to prove the transformation is
identity before trusting it at replica scale).

Limitation: a CTE whose name collides with a base table/view name is
rejected at parse time (loud FAIL) — the staged form would both misread
legal self-shadowing (inner name = base table) as recursion and collide
with the same-named view on CREATE TABLE.
"""
import atexit
import glob
import json
import os
import re
import shutil
import sys

import duckdb
import pandas as pd

from check_oracle import TABLES, ArrayColumn, rows_of, spill_dir


def fail(msg):
    """Parseable FAIL line on STDOUT (the sweep tees stdout into its
    oracle log; a stderr-only exit string would be recorded as SKIPPED by
    sweep_to_json.py), then a nonzero exit for pipefail propagation."""
    print(msg)
    sys.exit(1)


def strip_comments(sql):
    """Remove '--…EOL' and '/*…*/' spans (quote-aware): comments are
    semantics-free, and stripping them once up front keeps the CTE-header
    regex, the body depth-walker, and references() from ever matching
    text inside a comment — the same hazard class
    Verify.stripTrailingOrderBy guards against engine-side."""
    out = []
    i = 0
    in_s = in_d = False
    while i < len(sql):
        c = sql[i]
        if in_s:
            in_s = c != "'"
            out.append(c)
        elif in_d:
            in_d = c != '"'
            out.append(c)
        elif c == "-" and sql[i:i + 2] == "--":
            nl = sql.find("\n", i + 2)
            i = len(sql) if nl < 0 else nl  # keep the newline as whitespace
            continue
        elif c == "/" and sql[i:i + 2] == "/*":
            close = sql.find("*/", i + 2)
            i = len(sql) if close < 0 else close + 2
            out.append(" ")  # a comment can separate tokens
            continue
        else:
            if c == "'":
                in_s = True
            elif c == '"':
                in_d = True
            out.append(c)
        i += 1
    return "".join(out)


def split_ctes(sql):
    """Parse 'WITH [RECURSIVE] n1[(cols)] AS (b1), n2 AS (b2), ... final'
    into ([(name, cols_or_None, body)], final_select). Depth/quote-aware;
    returns ([], sql) when the SQL has no top-level WITH chain."""
    sql = strip_comments(sql)
    m = re.match(r"\s*WITH\s+(RECURSIVE\s+)?", sql, re.I | re.S)
    if not m:
        return [], sql
    i = m.end()
    ctes = []
    while True:
        h = re.match(r"\s*([A-Za-z_]\w*)\s*(\(([^)]*)\))?\s+AS\s*\(",
                     sql[i:], re.I | re.S)
        if not h:
            break
        name, cols = h.group(1), h.group(3)
        j = i + h.end()  # just past the opening paren of the body
        depth = 1
        in_s = in_d = False
        while j < len(sql) and depth > 0:
            c = sql[j]
            if in_s:
                in_s = c != "'"
            elif in_d:
                in_d = c != '"'
            elif c == "'":
                in_s = True
            elif c == '"':
                in_d = True
            elif c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            j += 1
        body = sql[i + h.end():j - 1]
        ctes.append((name, cols, body))
        k = re.match(r"\s*,", sql[j:])
        if not k:
            return ctes, sql[j:]
        i = j + k.end()
    return ctes, sql[i:]


def references(name, later_sql):
    """Word-boundary scan; false positives only KEEP a table longer
    (safe), a true reference always matches."""
    return re.search(rf"\b{re.escape(name)}\b", later_sql) is not None


def main():
    args = [a for a in sys.argv[1:] if a != "--selfcheck"]
    selfcheck = "--selfcheck" in sys.argv
    sf_dir, out_dir, name = args[0], args[1], args[2]
    mem = args[3] if len(args) > 3 else "48GB"
    threads = int(args[4]) if len(args) > 4 else 16
    spill_dir()  # reap spill dirs orphaned by earlier crashed runs
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    sql = oracle[name]
    ctes, final = split_ctes(sql)
    if not ctes:
        fail(f"FAIL {name}: no top-level WITH chain — use "
                 f"check_oracle_one.py for plain oracles")
    # A CTE named like a base table would (a) make references() misread
    # the legal self-shadowing form (inner name = base table) as
    # recursion and (b) collide with the same-named view on CREATE TABLE.
    # Loud parse-time rejection keeps the "parsed, not rewritten, cannot
    # drift" identity claim honest instead of silently bounding it.
    clash = sorted({c for c, _, _ in ctes} & set(TABLES))
    if clash:
        fail(f"FAIL {name}: CTE name(s) {clash} shadow base table(s) — "
             f"the staged evaluator cannot materialize these; rename the "
             f"CTE in the oracle SQL")

    # disk-backed database: materialized stages page out instead of
    # holding the whole chain's working set in RAM
    db = f"/tmp/staged_{name}.duckdb"

    def rm_db():
        for f in glob.glob(db + "*"):
            try:
                os.remove(f)
            except OSError:
                pass
    rm_db()
    atexit.register(rm_db)  # also on sys.exit(FAIL …) paths

    # One forked child PER STAGE, sharing the disk-backed db file. The
    # 128x sweep's lesson applies one level down: DuckDB 1.0's
    # process-global allocator accumulates across heavy statements in ONE
    # process until a kilobyte-block malloc dies with bad_alloc at ~6 GB
    # RSS (text_rake_phrases: the dp window stage fails after the wd/ws
    # string stages in-process, but the identical statement passes in a
    # fresh process against the same db file). State lives in the db file;
    # each child opens it, runs one statement batch, closes cleanly, and
    # exits — fresh allocator every stage, identical SQL, identical drop
    # schedule (computed in the parent from text alone).
    def connect():
        c = duckdb.connect(db)
        c.execute(f"SET memory_limit='{mem}'")
        c.execute(f"SET threads={threads}")
        c.execute("SET preserve_insertion_order=false")
        spill = f"/tmp/duck_spill/{os.getpid()}"  # per-process: a
        # sibling's DuckDB shutdown sweeps a SHARED temp dir and deletes
        # live spill blocks
        os.makedirs(spill, exist_ok=True)
        c.execute(f"SET temp_directory='{spill}'")
        return c

    def in_child(step):
        """Fork; run step() with a fresh connection; exit status becomes
        the parent's verdict. The parent must hold NO connection while a
        child runs (DuckDB single-writer file locking)."""
        sys.stdout.flush()
        sys.stderr.flush()
        pid = os.fork()
        if pid == 0:
            code = 1
            try:
                con = connect()
                try:
                    code = 0 if step(con) is not False else 1
                finally:
                    con.close()
            except SystemExit as e:
                code = e.code if isinstance(e.code, int) else 1
            except Exception as e:
                print(f"FAIL {name}: staged oracle: "
                      f"{type(e).__name__}: {e}")
            finally:
                sys.stdout.flush()
                sys.stderr.flush()
                os._exit(code)
        _, status = os.waitpid(pid, 0)
        # children exit via os._exit (no atexit), so the PARENT reaps the
        # child's per-pid spill dir — orphan spill from OOM-killed stages
        # otherwise accumulates toward the /tmp ENOSPC ceiling at 128x
        shutil.rmtree(f"/tmp/duck_spill/{pid}", ignore_errors=True)
        if status != 0:
            # Every in-process failure path above prints its own parseable
            # FAIL line before os._exit — but a child KILLED BY A SIGNAL
            # (OOM-kill, segfault: the failure class this fork-per-stage
            # design targets) never reaches them, and with no FAIL line a
            # '| tee' sweep log keeps the query's earlier SKIP line, so
            # the committed SWEEP_*.json records SKIPPED instead of FAIL.
            # Synthesize the line here, same contract as check_oracle.py
            # --fork and par_compare.sh. (sweep_to_json.py keeps the LAST
            # status line per query, so this can only tighten the record.)
            if os.WIFSIGNALED(status):
                print(f"FAIL {name}: staged child killed by signal "
                      f"{os.WTERMSIG(status)} with no output", flush=True)
            elif os.WEXITSTATUS(status) != 1:
                # exit 1 is the printed-FAIL contract; any OTHER nonzero
                # code (interpreter fatal, os._exit from a lib) may have
                # bypassed the print
                print(f"FAIL {name}: staged child exited "
                      f"{os.WEXITSTATUS(status)} with no output",
                      flush=True)
            sys.exit(1)

    def setup(con):
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    in_child(setup)

    live = []
    for idx, (cte, cols, body) in enumerate(ctes):
        if references(cte, body):  # recursive: re-wrap just this body
            decl = f"{cte}({cols})" if cols else cte
            stmt = (f"CREATE TABLE {cte} AS WITH RECURSIVE "
                    f"{decl} AS ({body}) SELECT * FROM {cte}")
        else:
            stmt = f"CREATE TABLE {cte} AS {body}"
        live.append(cte)
        rest = " ".join(b for _, _, b in ctes[idx + 1:]) + " " + final
        drops = [t for t in live if not references(t, rest)]
        live = [t for t in live if t not in drops]
        live_note = "live: " + ",".join(live)

        def stage(con, stmt=stmt, cte=cte, drops=drops,
                  live_note=live_note):
            con.execute(stmt)
            n = con.sql(f"SELECT count(*) FROM {cte}").fetchone()[0]
            for t in drops:
                con.execute(f"DROP TABLE {t}")
            print(f"  stage {cte}: {n} rows ({live_note})",
                  file=sys.stderr)
        in_child(stage)

    def finish(con):
        duck_df = con.sql(final).df()
        if selfcheck:
            try:
                mono = con.sql(sql).df()
            except Exception as e:
                fail(f"FAIL {name}: selfcheck monolithic run: "
                         f"{type(e).__name__}: {e}")
            if rows_of(duck_df)[0] != rows_of(mono)[0]:
                fail(f"FAIL {name}: staged result != monolithic result")
            print(f"selfcheck: staged == monolithic ({len(mono)} rows)",
                  file=sys.stderr)

        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not files:
            fail(f"FAIL {name}: no spark output")
        try:
            spark_df = pd.concat(
                [pd.read_parquet(f) for f in files], ignore_index=True)
            if sorted(spark_df.columns) != sorted(duck_df.columns):
                fail(f"FAIL {name}: columns {sorted(spark_df.columns)} != "
                         f"{sorted(duck_df.columns)}")
            s_sorted, s_given = rows_of(spark_df)
            d_sorted, d_given = rows_of(duck_df)
        except ArrayColumn:
            fail(f"FAIL {name}: array-typed output column — flatten to "
                     f"scalars")
        except SystemExit:
            raise
        except Exception as e:
            fail(f"FAIL {name}: {type(e).__name__}: {e}")
        if s_given == d_given:
            print(f"PASS {name} ({len(s_given)} rows; staged oracle)")
        elif s_sorted == d_sorted:
            print(f"PASS* {name} ({len(s_given)} rows; staged oracle; "
                  f"order differs)")
        else:
            diff = [(a, b) for a, b in zip(s_sorted, d_sorted) if a != b]
            fail(f"FAIL {name}: {len(s_given)} vs {len(d_given)} rows, "
                     f"{len(diff)} differing; first: "
                     f"{diff[0] if diff else (s_sorted[:2], d_sorted[:2])}")
    in_child(finish)


if __name__ == "__main__":
    main()
