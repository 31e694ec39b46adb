#!/usr/bin/env python3
"""Staged DuckDB oracle for resource-heavy twins (round-15 verdict
task 4, the q95-slimming lesson generalized): instead of running one
giant WITH-pipeline — where every CTE's working set shares one memory
/ temp budget and the n*k lloyd-replay or dup-census window OOMs /
ENOSPCs the box at sf30 — split the oracle's top-level CTE list and
materialize each CTE to parquet IN ORDER, each stage getting the FULL
budget and its inputs already reduced on disk. The final SELECT then
runs over slim staged views. Value-identical to check.py's one-shot
oracle by construction: the same SQL text runs per stage, and staging
a CTE only pins the boundary DuckDB's MATERIALIZED hint already
declares (results cannot change, only peak resource use).

Usage: tools/staged_check.py <sfDir> <verifyOutDir> <stageDir> <q1> [q2 ...]

Reads oracle_sql.json from <verifyOutDir> (written by graft.Verify),
stages into <stageDir>/<query>/<cte>.parquet, compares the final
result against <verifyOutDir>/<query> exactly like check.py does.
Recursive CTEs (WITH RECURSIVE) are not stageable and are rejected.
"""
import json
import os
import shutil
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="mergesort",
                        na_position="first").reset_index(drop=True)
    return df


def split_ctes(sql):
    """Split `WITH name AS [MATERIALIZED] (body), ... <final SELECT>`
    at top level (paren-depth + string-literal aware). Returns
    ([(name, body)], final_select). For WITH RECURSIVE, only the
    non-recursive PREFIX is split out for staging; the first
    self-referencing CTE and everything after it are folded back into
    the final query under a fresh WITH RECURSIVE — the recursive
    fixpoint itself cannot be a parquet stage, but its INPUTS (the
    expensive candidate-pair CTEs) can be."""
    s = sql.strip()
    assert s[:5].upper() == "WITH ", "oracle must start with WITH"
    recursive = s[:14].upper() == "WITH RECURSIVE"
    if recursive:
        s = s[14:].lstrip()
    else:
        s = s[5:]
    ctes = []
    i = 0
    n = len(s)
    while True:
        j = s.index(" AS", i)
        name = s[i:j].strip()
        k = s.index("(", j)
        depth, in_str, m = 0, False, k
        while m < n:
            c = s[m]
            if in_str:
                if c == "'":
                    in_str = False
            elif c == "'":
                in_str = True
            elif c == "-" and m + 1 < n and s[m + 1] == "-":
                # line comment: apostrophes/parens inside are not code
                while m < n and s[m] != "\n":
                    m += 1
                continue
            elif c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
                if depth == 0:
                    break
            m += 1
        assert depth == 0, f"unbalanced parens in CTE {name}"
        ctes.append((name, s[k + 1:m]))
        pos = m + 1
        while pos < n and s[pos] in " \n\t":
            pos += 1
        if pos < n and s[pos] == ",":
            i = pos + 1
            while s[i] in " \n\t":
                i += 1
        else:
            final = s[pos:]
            if recursive:
                import re
                cut = len(ctes)
                for idx, (nm, body) in enumerate(ctes):
                    # self-reference as a TABLE (FROM/JOIN), not a mere
                    # column alias collision (`... AS h` inside CTE h)
                    if re.search(rf"(FROM|JOIN)\s+{re.escape(nm)}\b",
                                 body, re.IGNORECASE):
                        cut = idx
                        break
                tail = ctes[cut:]
                ctes = ctes[:cut]
                if tail:
                    final = ("WITH RECURSIVE " + ",\n".join(
                        f"{nm} AS ({body})" for nm, body in tail) +
                        "\n" + final)
            return ctes, final


def compare(g, w):
    """check.py's exact compare: (ok, message)."""
    if list(g.columns) != list(w.columns):
        return False, f"columns {list(g.columns)} != {list(w.columns)}"
    if len(g) != len(w):
        return False, f"rows {len(g)} != {len(w)}"
    for c in g.columns:
        a, b = g[c], w[c]
        if not a.equals(b.astype(a.dtype) if a.dtype != b.dtype else b):
            neq = (a != b) & ~(a.isna() & b.isna())
            if neq.any():
                i = neq.idxmax()
                return False, (f"col {c}: {int(neq.sum())} diffs, "
                               f"e.g. spark={a[i]!r} duck={b[i]!r}")
    return True, ""


def main(sf_dir, out_dir, stage_dir, names):
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    n_pass = n_fail = 0
    for name in names:
        qdir = os.path.join(stage_dir, name)
        shutil.rmtree(qdir, ignore_errors=True)
        os.makedirs(qdir, exist_ok=True)
        try:
            ctes, final = split_ctes(oracles[name])
            # fresh ON-DISK database per query: stages become native
            # tables (spilled to the db file), NOT parquet — a parquet
            # boundary coerces types the twin relies on (sum() returns
            # HUGEINT, which parquet degrades to DOUBLE and the LSH
            # signature shifts then fail to bind; observed on q95)
            dbfile = os.path.join(stage_dir, f"{name}.duckdb")
            if os.path.exists(dbfile):
                os.remove(dbfile)
            con = duckdb.connect(dbfile)
            mem = os.environ.get("SPARK_GRAFT_DUCKDB_MEM")
            if mem:
                con.execute(f"SET memory_limit='{mem}'")
            tmp = os.environ.get("SPARK_GRAFT_DUCKDB_TMP")
            if tmp:
                os.makedirs(tmp, exist_ok=True)
                con.execute(f"SET temp_directory='{tmp}'")
                con.execute("SET max_temp_directory_size='60GB'")
            con.execute("SET preserve_insertion_order=false")
            thr = os.environ.get("SPARK_GRAFT_DUCKDB_THREADS")
            if thr:
                con.execute(f"SET threads={int(thr)}")
            for t in TABLES:
                path = f"{sf_dir}/{t}.parquet"
                if os.path.isdir(path):
                    path = f"{path}/*.parquet"
                con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
            import time
            for cte_name, body in ctes:
                t0 = time.time()
                con.execute(f"CREATE TABLE {cte_name} AS {body}")
                sz = os.path.getsize(dbfile) / 1e6
                print(f"  [{name}] staged {cte_name} "
                      f"({time.time() - t0:.0f}s, db={sz:.0f} MB)",
                      flush=True)
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
            want = con.execute(final).df()
            ok, msg = compare(norm(got), norm(want))
            if ok:
                print(f"PASS {name} ({len(got)} rows, staged)", flush=True)
                n_pass += 1
            else:
                print(f"FAIL {name}: {msg}", flush=True)
                n_fail += 1
            con.close()
            # stages can be tens of GB at sf30 — reclaim before the
            # next query so the sweep itself can't ENOSPC the box
            shutil.rmtree(qdir, ignore_errors=True)
            if os.path.exists(dbfile):
                os.remove(dbfile)
        except Exception as e:
            print(f"ERROR {name}: {type(e).__name__}: {e}", flush=True)
            shutil.rmtree(qdir, ignore_errors=True)
            dbf = os.path.join(stage_dir, f"{name}.duckdb")
            if os.path.exists(dbf):
                os.remove(dbf)
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3], sys.argv[4:]))
