#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare (dev tool only; the
engine itself is pure Scala/Spark). Usage:
    python3 tools/check.py <sfDir> <verifyOutDir>
Runs each oracle_sql.json query in DuckDB over views of the sf parquet
tables, loads the corresponding Spark parquet dump, sorts columns by name
(and rows by all columns) on both sides, and compares values exactly.
"""
import sys, json, glob, math
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def cmp_vals(a, b) -> bool:
    if a is None and b is None:
        return True
    try:  # NaT / None / nan in datetime or object columns
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b

def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    import os
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):  # Spark-written table dir (e.g. ScaleUp sf1)
            p = f"{p}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    # Verify writes errors.json from the start of its run; surface any
    # recorded query failures here so a broken query reads as ERR with
    # its message, not as a bare "no spark output".
    try:
        errors = json.load(open(f"{out_dir}/errors.json"))
    except FileNotFoundError:
        errors = {}
    except json.JSONDecodeError as e:
        # a kill mid-rewrite can truncate the file; degrade to a visible
        # marker rather than crashing before any compare output
        errors = {"_errors_json": f"unreadable ({e})"}
    for name, msg in sorted(errors.items()):
        print(f"ERR  {name}: {(str(msg).splitlines() or [''])[0][:120]}")
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            exp = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        got = pd.concat([pd.read_parquet(f) for f in sorted(files)])
        exp, got = norm(exp), norm(got)
        if list(exp.columns) != list(got.columns):
            print(f"FAIL {name}: columns exp={list(exp.columns)} got={list(got.columns)}")
            n_fail += 1
            continue
        if len(exp) != len(got):
            print(f"FAIL {name}: rows exp={len(exp)} got={len(got)}")
            n_fail += 1
            continue
        bad = None
        for c in exp.columns:
            ev, gv = exp[c].tolist(), got[c].tolist()
            for i, (a, b) in enumerate(zip(ev, gv)):
                if not cmp_vals(a, b):
                    bad = (c, i, a, b)
                    break
            if bad:
                break
        if bad:
            c, i, a, b = bad
            print(f"FAIL {name}: col {c} row {i}: oracle={a!r} ({type(a).__name__}) spark={b!r} ({type(b).__name__})")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(exp)} rows, {len(exp.columns)} cols)")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail / {len(errors)} err ==")
    return 1 if (n_fail or errors) else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
