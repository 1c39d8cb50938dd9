#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare.

Usage: python3 tools/oracle_check.py <verify_out_dir> <sf_dir> [query ...]

Loads each <verify_out_dir>/<name>/ parquet (Spark result), runs the paired
SQL from oracle_sql.json in DuckDB over the sf-dir parquet tables, normalizes
both sides (columns sorted by name, doubles rounded to 6 dp, timestamps as
ISO-8601 µs, rows sorted), and diffs.
"""
import json, sys, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = round(v, 6) + 0.0  # -0.0 -> 0.0
            elif hasattr(v, "isoformat"):
                v = v.isoformat()
            elif isinstance(v, list):
                v = tuple(round(x, 6) + 0.0 if isinstance(x, float) else x
                          for x in v)
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda t: tuple(str(x) for x in t))
    return [cols[i] for i in order], out

def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    n_pass = n_fail = n_skip = 0
    for name in sorted(os.listdir(out_dir)):
        qdir = os.path.join(out_dir, name)
        if not os.path.isdir(qdir) or (only and name not in only):
            continue
        files = glob.glob(f"{qdir}/*.parquet")
        if not files:
            print(f"MISSING  {name}: no spark result parquet")
            n_fail += 1
            continue
        sq = con.execute(f"SELECT * FROM read_parquet({files!r})")
        scols = [d[0] for d in sq.description]
        srows = sq.fetchall()
        if name not in oracle:
            print(f"ENGINE   {name}: rows={len(srows)} (no oracle)")
            n_skip += 1
            continue
        try:
            oq = con.execute(oracle[name])
            ocols = [d[0] for d in oq.description]
            orows = oq.fetchall()
        except Exception as e:
            print(f"ORAERR   {name}: {e}")
            n_fail += 1
            continue
        scols_n, srows_n = normalize(srows, scols)
        ocols_n, orows_n = normalize(orows, ocols)
        if scols_n != ocols_n:
            print(f"SCHEMA   {name}: spark={scols_n} oracle={ocols_n}")
            n_fail += 1
            continue
        if len(srows_n) != len(orows_n):
            print(f"ROWS     {name}: spark={len(srows_n)} oracle={len(orows_n)}")
            n_fail += 1
            continue
        diffs = [(i, a, b) for i, (a, b) in enumerate(zip(srows_n, orows_n))
                 if a != b]
        if diffs:
            print(f"VALUES   {name}: {len(diffs)}/{len(srows_n)} rows differ; first:")
            i, a, b = diffs[0]
            for c, x, y in zip(scols_n, a, b):
                mark = " " if x == y else "*"
                print(f"  {mark} {c}: spark={x!r} oracle={y!r}")
            n_fail += 1
        else:
            print(f"PASS     {name}: rows={len(srows_n)}")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_skip} engine-only")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
