#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (Spark result), runs the
matching oracle SQL from oracle_sql.json in DuckDB over views of the
sfDir parquet tables, and compares sorted rows exactly (the driver
sorts columns by name and hash-compares values).
"""
import json, os, sys, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    return str(v)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    n_pass = n_fail = n_noracle = 0
    for name in names:
        spark_dir = os.path.join(out_dir, name)
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')")
            got_cols = [d[0] for d in got.description]
            got_rows = got.fetchall()
        except Exception as ex:
            print(f"FAIL {name}: cannot read spark result: {ex}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"--   {name}: no oracle ({len(got_rows)} rows)")
            n_noracle += 1
            continue
        try:
            exp = con.execute(oracles[name])
            exp_cols = [d[0] for d in exp.description]
            exp_rows = exp.fetchall()
        except Exception as ex:
            print(f"FAIL {name}: oracle SQL error: {str(ex).splitlines()[0]}")
            n_fail += 1
            continue
        if sorted(got_cols) != sorted(exp_cols):
            print(f"FAIL {name}: schema {sorted(got_cols)} != {sorted(exp_cols)}")
            n_fail += 1
            continue
        # Type-strict: the driver hashes TYPED values, so DuckDB HUGEINT
        # (from sum(BIGINT)) vs Spark int64 mismatches even when str() of
        # the values agrees. The driver DOES accept differing widths
        # within the 64-bit integer family (r1 evidence: TINYINT and
        # BIGINT oracle columns hash-matched INTEGER spark columns), so
        # normalize those; HUGEINT (int128) stays distinct.
        def norm(t):
            t = str(t)
            if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
                     "UTINYINT", "USMALLINT", "UINTEGER"):
                return "INT64"
            if t in ("FLOAT", "DOUBLE"):
                return "FLOAT64"
            return t
        got_types = dict(zip(got_cols, [norm(t) for t in con.sql(
            f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')").types]))
        exp_types = dict(zip(exp_cols, [norm(t) for t in con.sql(oracles[name]).types]))
        type_mismatch = {c: (got_types[c], exp_types[c])
                         for c in got_cols if got_types[c] != exp_types[c]}
        if type_mismatch:
            print(f"FAIL {name}: column types differ: {type_mismatch}")
            n_fail += 1
            continue
        # driver sorts columns by name before hashing values
        gi = [got_cols.index(c) for c in sorted(got_cols)]
        ei = [exp_cols.index(c) for c in sorted(exp_cols)]
        g = sorted(tuple(canon(r[i]) for i in gi) for r in got_rows)
        e = sorted(tuple(canon(r[i]) for i in ei) for r in exp_rows)
        if len(g) != len(e):
            print(f"FAIL {name}: rows {len(g)} != {len(e)}")
            n_fail += 1
            continue
        if g != e:
            bad = next(i for i in range(len(g)) if g[i] != e[i])
            print(f"FAIL {name}: values differ at sorted row {bad}:")
            print(f"     spark:  {g[bad]}")
            print(f"     oracle: {e[bad]}")
            n_fail += 1
            continue
        print(f"PASS {name} ({len(g)} rows)")
        n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noracle} no-oracle")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
