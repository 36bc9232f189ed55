#!/usr/bin/env python3
"""Local pre-flight for the driver's DuckDB-oracle gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Mimics the DRIVER's comparator, not a value-equality check (round-1 lesson:
the driver hashes value REPRESENTATIONS, so Decimal('5.50') != 5.5 there
even though Python `==` says equal):

  - Spark side: pandas.read_parquet (pyarrow) — parquet DECIMAL columns stay
    `decimal.Decimal` objects, arrays stay numpy arrays.
  - Oracle side: DuckDB relation `.df()` — DECIMAL becomes float64.
  - Columns sorted by name, rows sorted, values compared by type-sensitive
    repr (after converting numpy scalars to Python natives and datetimes to
    ISO strings — the classes the driver demonstrably normalizes, since all
    date/int queries passed round 1 while every decimal-output query failed).
  - Array-typed values are an explicit FAIL: they crash the driver's pandas
    sort (`TypeError: unhashable type: numpy.ndarray`).
"""
import datetime
import decimal
import glob
import json
import math
import os
import sys

import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


class ArrayColumn(Exception):
    pass


def norm(v):
    """Normalize ONLY what the driver demonstrably normalizes; keep the
    type-sensitivity that failed round 1 (Decimal vs float)."""
    if isinstance(v, (np.ndarray, list, tuple)):
        raise ArrayColumn()
    if isinstance(v, np.generic):
        v = v.item()
    if v is None:
        return "None"
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else repr(v)
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if isinstance(v, (datetime.datetime, datetime.date)):
        return pd.Timestamp(v).isoformat()
    if isinstance(v, decimal.Decimal):
        return repr(v)  # stays Decimal('...') — hash-fails vs float64
    return repr(v)


def rows_of(df):
    cols = sorted(df.columns)
    rows = [tuple(norm(v) for v in row)
            for row in df[cols].itertuples(index=False, name=None)]
    return sorted(rows), rows


def spill_dir():
    """Per-process DuckDB temp_directory under /tmp/duck_spill (per-
    process because a sibling's DuckDB shutdown sweeps a SHARED temp dir,
    deleting live spill blocks). Registers best-effort removal at exit
    AND reaps dirs orphaned by CRASHED earlier children (pid no longer
    alive) — without the reap, every OOM-killed comparator leaves its
    spill on a /tmp already documented to hit ENOSPC at 128x."""
    import atexit
    import shutil
    root = "/tmp/duck_spill"
    mine = f"{root}/{os.getpid()}"
    os.makedirs(mine, exist_ok=True)
    atexit.register(lambda: shutil.rmtree(mine, ignore_errors=True))
    import time
    now = time.time()
    for p in glob.glob(f"{root}/[0-9]*"):
        base = os.path.basename(p)
        if not base.isdigit() or int(base) == os.getpid():
            continue
        # age backstop FIRST: pid liveness alone leaks a dir forever when
        # a crashed comparator's pid is later recycled by an unrelated
        # live process, or when the dir belongs to another uid — either
        # way it creeps toward the documented 128x ENOSPC ceiling. No
        # comparator run (even the staged 256x funnels) lives 6 hours.
        try:
            if now - os.path.getmtime(p) > 6 * 3600:
                shutil.rmtree(p, ignore_errors=True)
                continue
        except OSError:
            pass  # racing another reaper — the liveness check below decides
        try:
            os.kill(int(base), 0)  # raises if the owner is gone
        except ProcessLookupError:
            shutil.rmtree(p, ignore_errors=True)
        except PermissionError:
            pass  # alive under another uid — leave it (age reap above
            # still bounds its lifetime once it goes stale)
    return mine


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    # resume/skip controls for long replica-scale sweeps (a 32x sweep runs
    # for hours; an OOM-killed comparator must not force re-running the
    # queries that already passed):
    #   --skip a,b,c   exclude named queries (run them separately via
    #                  check_oracle_one.py with tuned resource pragmas)
    #   --after NAME   only queries strictly after NAME alphabetically
    skip, after, fork = set(), None, False
    argv = sys.argv[3:]
    while argv:
        if argv[0] == "--skip":
            skip |= set(argv[1].split(","))
            argv = argv[2:]
        elif argv[0] == "--after":
            after = argv[1]
            argv = argv[2:]
        elif argv[0] == "--fork":
            # one PROCESS per query, not just one connection: the 128x
            # sweep proved per-query duckdb.connect() is NOT enough — the
            # duckdb module accumulates process-wide allocation across
            # closed connections, so a mid-sweep query OOMs ("bad
            # allocation" at kilobyte block sizes) and the cascade ends in
            # a segfault, while the SAME query at the SAME cap passes in a
            # fresh process. Fork mode delegates each compare to
            # check_oracle_one.py (identical SQL + comparison rules) and
            # relays its stdout; a child segfault costs that one query.
            fork = True
            argv = argv[1:]
        else:
            sys.exit(f"unknown arg: {argv[0]}")

    def excluded(name):
        return name in skip or (after is not None and name <= after)

    # optional hard memory cap (e.g. DUCKDB_MEMORY_LIMIT=60GB): replica-
    # scale sweeps on a shared box must spill rather than ride DuckDB's
    # default 80%-of-RAM limit into the kernel OOM killer (which took out
    # a 32x sweep at 103 GB RSS). Unset = driver-gate default behavior.
    mem_cap = os.environ.get("DUCKDB_MEMORY_LIMIT")

    def fresh_con():
        """One connection PER QUERY: a single long-lived connection
        accumulates allocation across replica-scale queries — at 128× it
        OOM'd 11 mid-sweep queries that pass in a fresh process under the
        identical cap. Per-query setup is ten CREATE VIEWs, microseconds."""
        c = duckdb.connect()
        if mem_cap:
            c.execute(f"SET memory_limit='{mem_cap}'")
            c.execute(f"SET temp_directory='{spill_dir()}'")
        for t in TABLES:
            c.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
        return c

    con = fresh_con()
    # capability probe: the fingerprint-mode oracles rely on DuckDB's
    # '0x…'::BIGINT hex cast and md5(); assert both once, up front, so an
    # older DuckDB fails HERE with a clear message instead of deep inside
    # a per-query compare far from the cause
    # expected = int(hashlib.md5(b'probe').hexdigest()[:14], 16): the probe
    # must return this EXACT value (explicit if/sys.exit, not assert — a
    # bare assert is stripped under `python -O`)
    probe_expected = 39872981717295194
    try:
        got = con.sql(
            "SELECT ('0x' || substr(md5('probe'), 1, 14))::BIGINT").fetchone()[0]
    except Exception as e:
        sys.exit(f"DuckDB capability probe failed (hex-cast/md5 needed by "
                 f"fingerprint oracles): {type(e).__name__}: {e}")
    if got != probe_expected:
        sys.exit(f"DuckDB capability probe failed: md5/hex-cast returned "
                 f"{got!r}, expected {probe_expected}")
    con.close()
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    skipped = []  # every excluded query, named in the summary: a sweep log
    # that sweep_to_json.py ingests must not silently claim full coverage
    # when --skip/--after carved queries out of this run
    for name in sorted(oracle):
        if excluded(name):
            skipped.append(name)
            continue
        if fork:
            import subprocess
            one = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "check_oracle_one.py")
            r = subprocess.run(
                [sys.executable, one, sf_dir, out_dir, name,
                 mem_cap or "60GB"],
                capture_output=True, text=True)
            out = r.stdout.strip()
            # relay the child's parseable line; a child that died without
            # printing one (segfault, kill) still yields a FAIL line here
            if out:
                print(out, flush=True)
            if r.returncode == 0 and out.startswith(("PASS", "PASS*")):
                n_pass += 1
            else:
                if not out:
                    print(f"FAIL {name}: comparator child exited "
                          f"{r.returncode} with no output"
                          f"{(': ' + r.stderr.strip()[-200:]) if r.stderr.strip() else ''}")
                n_fail += 1
            continue
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            spark_df = pd.concat(
                [pd.read_parquet(f) for f in files], ignore_index=True)
            qcon = fresh_con()
            try:
                duck_df = qcon.sql(oracle[name]).df()
            finally:
                qcon.close()
            s_names = sorted(spark_df.columns)
            d_names = sorted(duck_df.columns)
            if s_names != d_names:
                print(f"FAIL {name}: columns {s_names} != {d_names}")
                n_fail += 1
                continue
            s_sorted, s_given = rows_of(spark_df)
            d_sorted, d_given = rows_of(duck_df)
            if s_given == d_given:
                print(f"PASS {name} ({len(s_given)} rows)")
                n_pass += 1
            elif s_sorted == d_sorted:
                print(f"PASS* {name} ({len(s_given)} rows; order differs)")
                n_pass += 1
            else:
                n_fail += 1
                diff = [(a, b) for a, b in zip(s_sorted, d_sorted) if a != b]
                print(f"FAIL {name}: {len(s_given)} vs {len(d_given)} rows, "
                      f"{len(diff)} differing; first: "
                      f"{diff[0] if diff else (s_sorted[:2], d_sorted[:2])}")
        except ArrayColumn:
            print(f"FAIL {name}: array-typed output column — the driver's "
                  f"pandas comparator crashes on these (flatten to scalars)")
            n_fail += 1
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
    # rows-only queries (no oracle): the driver still loads them into pandas,
    # so the array guard applies here too
    for d in sorted(glob.glob(f"{out_dir}/*/")):
        name = d.rstrip("/").split("/")[-1]
        if name in oracle:
            continue
        if excluded(name):
            skipped.append(name)
            continue
        files = sorted(glob.glob(f"{d}/*.parquet"))
        if not files:
            print(f"FAIL {name}: (rows-only) no output")
            n_fail += 1
            continue
        try:
            df = pd.concat(
                [pd.read_parquet(f) for f in files], ignore_index=True)
            rows_of(df)
            n = len(df)
            status = "PASS" if n > 0 else "FAIL"
            print(f"{status} {name} (rows-only, {n} rows)")
            n_pass += n > 0
            n_fail += n == 0
        except ArrayColumn:
            print(f"FAIL {name}: (rows-only) array-typed output column — "
                  f"flatten to scalars")
            n_fail += 1
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
    if skipped:
        # named, not just counted: the resume workflow is "re-run exactly
        # these via check_oracle_one.py / --skip inversion", and the
        # committed artifact must carry the same list
        for name in skipped:
            print(f"SKIP {name}: excluded by --skip/--after")
        print(f"\n{n_pass} pass, {n_fail} fail, {len(skipped)} skipped")
    else:
        print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
