#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle compare.

Usage: tools/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify),
runs the matching SQL from oracle_sql.json in DuckDB against views over
<sfDir>/*.parquet, and compares: column names (sorted), row counts, and
exact values after sorting columns by name and rows by all columns.
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="mergesort",
                        na_position="first").reset_index(drop=True)
    return df


def main(sf_dir, out_dir):
    con = duckdb.connect()
    import os
    # big-corpus oracle sweeps (sf30+) OOM on the heavy dedup/ANN
    # twins unless DuckDB is allowed to spill: SPARK_GRAFT_DUCKDB_MEM
    # (e.g. "48GB") caps its in-memory working set and
    # SPARK_GRAFT_DUCKDB_TMP points the overflow at disk
    mem = os.environ.get("SPARK_GRAFT_DUCKDB_MEM")
    if mem:
        con.execute(f"SET memory_limit='{mem}'")
    tmp = os.environ.get("SPARK_GRAFT_DUCKDB_TMP")
    if tmp:
        os.makedirs(tmp, exist_ok=True)
        con.execute(f"SET temp_directory='{tmp}'")
        con.execute("SET max_temp_directory_size='60GB'")
        # big-sweep memory lever: insertion-order preservation forces
        # DuckDB to buffer operator output in order even mid-pipeline;
        # result ORDER is irrelevant here (every oracle has an explicit
        # ORDER BY, and norm() re-sorts rows before compare anyway)
        con.execute("SET preserve_insertion_order=false")
    for t in TABLES:
        # driver testdata is one file per table; GenScale rehearsal
        # corpora are Spark-written DIRECTORIES of part files
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    # honor SPARK_GRAFT_ONLY like graft.Verify does, so a selective
    # check against a FULL verify output dir stays selective (before
    # round 11 the filter silently only worked when Verify itself had
    # been limited, because Verify also limits oracle_sql.json)
    only = os.environ.get("SPARK_GRAFT_ONLY")
    if only:
        keep = set(only.split(","))
        oracles = {k: v for k, v in oracles.items() if k in keep}
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
            want = con.execute(sql).df()
            g, w = norm(got), norm(want)
            if list(g.columns) != list(w.columns):
                print(f"FAIL {name}: columns {list(g.columns)} != {list(w.columns)}")
                n_fail += 1
                continue
            if len(g) != len(w):
                print(f"FAIL {name}: rows {len(g)} != {len(w)}")
                n_fail += 1
                continue
            bad = None
            for c in g.columns:
                a, b = g[c], w[c]
                if not a.equals(b.astype(a.dtype) if a.dtype != b.dtype else b):
                    neq = (a != b) & ~(a.isna() & b.isna())
                    if neq.any():
                        i = neq.idxmax()
                        bad = (c, a[i], b[i], int(neq.sum()))
                        break
            if bad:
                c, av, bv, n = bad
                print(f"FAIL {name}: col {c}: {n} diffs, e.g. spark={av!r} duck={bv!r}")
                n_fail += 1
            else:
                print(f"PASS {name} ({len(g)} rows)")
                n_pass += 1
        except Exception as e:
            print(f"ERROR {name}: {e}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
