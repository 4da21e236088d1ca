#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [query ...]

Reads <verifyOutDir>/<name>/ parquet (Spark output) and oracle_sql.json,
registers the sf tables in DuckDB, runs each oracle, and compares row sets
(columns sorted by name, rows sorted) exactly.
"""
import sys, os, json, duckdb

TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

def canon(rows):
    return sorted(tuple("NULL" if v is None else repr(v) for v in r) for r in rows)

def main():
    sf, out = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{out}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        try:
            spark_rel = con.sql(f"SELECT * FROM read_parquet('{out}/{name}/*.parquet')")
            scols = sorted(spark_rel.columns)
            srows = con.execute(
                f"SELECT {', '.join(scols)} FROM read_parquet('{out}/{name}/*.parquet')").fetchall()
            orel = con.sql(sql)
            ocols = sorted(orel.columns)
            orows = con.execute(f"SELECT {', '.join(ocols)} FROM ({sql}) q").fetchall()
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            n_fail += 1
            continue
        if scols != ocols:
            print(f"FAIL {name}: schema {scols} != {ocols}")
            n_fail += 1
            continue
        a, b = canon(srows), canon(orows)
        if a == b:
            print(f"PASS {name} ({len(a)} rows)")
            n_pass += 1
        else:
            n_fail += 1
            sa, sb = set(a), set(b)
            only_s = list(sa - sb)[:5]
            only_o = list(sb - sa)[:5]
            print(f"FAIL {name}: spark={len(a)} oracle={len(b)} rows")
            for r in only_s: print(f"  spark-only:  {r}")
            for r in only_o: print(f"  oracle-only: {r}")
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
