#!/usr/bin/env python3
"""Local pre-flight for the driver's DuckDB-oracle gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Loads each <verifyOutDir>/<name>/ parquet (Spark result), runs the matching
oracle_sql.json query in DuckDB with views named after the TESTDATA tables,
and compares values with columns sorted by name (rows compared both as-given
and re-sorted, so either driver convention passes).
"""
import sys, json, glob, math

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return float(v)
    return v


def rows_of(rel, cols_sorted):
    df = rel.fetchall()
    names = [d[0] for d in rel.description]
    idx = [names.index(c) for c in cols_sorted]
    return [tuple(norm(r[i]) for i in idx) for r in df]


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            spark_rel = con.sql(
                "SELECT * FROM read_parquet([" +
                ",".join(f"'{f}'" for f in files) + "])")
            spark_names = sorted(d[0] for d in spark_rel.description)
            duck_rel = con.sql(oracle[name])
            duck_names = sorted(d[0] for d in duck_rel.description)
            if spark_names != duck_names:
                print(f"FAIL {name}: columns {spark_names} != {duck_names}")
                n_fail += 1
                continue
            s_rows = rows_of(spark_rel, spark_names)
            d_rows = rows_of(duck_rel, duck_names)
            if s_rows == d_rows:
                print(f"PASS {name} ({len(s_rows)} rows)")
                n_pass += 1
            elif sorted(map(repr, s_rows)) == sorted(map(repr, d_rows)):
                print(f"PASS* {name} ({len(s_rows)} rows; order differs)")
                n_pass += 1
            else:
                n_fail += 1
                diff = [(a, b) for a, b in zip(s_rows, d_rows) if a != b]
                print(f"FAIL {name}: {len(s_rows)} vs {len(d_rows)} rows, "
                      f"{len(diff)} differing; first: "
                      f"{diff[0] if diff else (s_rows[:2], d_rows[:2])}")
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
    # rows-only queries (no oracle): just confirm output exists and has rows
    for d in sorted(glob.glob(f"{out_dir}/*/")):
        name = d.rstrip("/").split("/")[-1]
        if name in oracle:
            continue
        files = glob.glob(f"{d}/*.parquet")
        if not files:
            print(f"FAIL {name}: (rows-only) no output")
            n_fail += 1
            continue
        n = con.sql("SELECT count(*) FROM read_parquet([" +
                    ",".join(f"'{f}'" for f in files) + "])").fetchone()[0]
        status = "PASS" if n > 0 else "FAIL"
        print(f"{status} {name} (rows-only, {n} rows)")
        n_pass += n > 0
        n_fail += n == 0
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
