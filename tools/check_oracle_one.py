#!/usr/bin/env python3
"""Re-run ONE query's DuckDB-oracle compare with tuned DuckDB resource
settings — for oracles whose intermediates exceed the sandbox's free-disk
ceiling under DuckDB's default spill-eager posture (corpus_retention_funnel
at 32x: the gram self-join + recursive-closure chain wants >70 GB of temp
while RAM sits half-idle). Identical SQL, identical comparison rules
(imports check_oracle's norm/rows_of); only engine-resource pragmas differ.

Usage: python3 tools/check_oracle_one.py <sfDir> <verifyOutDir> <query> \
           [memory_limit] [threads]
"""
import glob
import json
import os
import sys

import duckdb
import pandas as pd

from check_oracle import TABLES, ArrayColumn, rows_of, spill_dir


def fail(msg):
    """Parseable FAIL line on STDOUT (sweep logs are '... | tee'; a
    stderr-only sys.exit string never reaches them), then exit 1."""
    print(msg)
    sys.exit(1)


def main():
    sf_dir, out_dir, name = sys.argv[1], sys.argv[2], sys.argv[3]
    mem = sys.argv[4] if len(sys.argv) > 4 else "100GB"
    threads = int(sys.argv[5]) if len(sys.argv) > 5 else 16
    files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
    if not files:
        fail(f"FAIL {name}: no spark output")
    con = duckdb.connect()
    con.execute(f"SET memory_limit='{mem}'")
    con.execute(f"SET threads={threads}")
    con.execute("SET preserve_insertion_order=false")
    # per-process temp dir (concurrent compares sharing one
    # temp_directory corrupt each other), removed at exit + stale dirs
    # of crashed siblings reaped — see check_oracle.spill_dir
    con.execute(f"SET temp_directory='{spill_dir()}'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    # same try/except structure as check_oracle.py's per-query loop: an
    # array-typed column or a DuckDB evaluation error must surface as the
    # parseable "FAIL <name>: ..." line ON STDOUT (fail() above) so a
    # '... | tee log' capture records it, never as a raw traceback
    try:
        spark_df = pd.concat(
            [pd.read_parquet(f) for f in files], ignore_index=True)
        duck_df = con.sql(oracle[name]).df()
        if sorted(spark_df.columns) != sorted(duck_df.columns):
            fail(f"FAIL {name}: columns {sorted(spark_df.columns)} != "
                     f"{sorted(duck_df.columns)}")
        s_sorted, s_given = rows_of(spark_df)
        d_sorted, d_given = rows_of(duck_df)
    except ArrayColumn:
        fail(f"FAIL {name}: array-typed output column — the driver's "
                 f"pandas comparator crashes on these (flatten to scalars)")
    except SystemExit:
        raise
    except Exception as e:
        fail(f"FAIL {name}: {type(e).__name__}: {e}")
    if s_given == d_given:
        print(f"PASS {name} ({len(s_given)} rows)")
    elif s_sorted == d_sorted:
        print(f"PASS* {name} ({len(s_given)} rows; order differs)")
    else:
        diff = [(a, b) for a, b in zip(s_sorted, d_sorted) if a != b]
        fail(f"FAIL {name}: {len(s_given)} vs {len(d_given)} rows, "
                 f"{len(diff)} differing; first: "
                 f"{diff[0] if diff else (s_sorted[:2], d_sorted[:2])}")


if __name__ == "__main__":
    main()
