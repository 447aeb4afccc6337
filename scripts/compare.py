#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Usage: python3 scripts/compare.py <sfDir> <verifyOutDir>

Registers the sfDir parquet tables as DuckDB views, runs each oracle
from <verifyOutDir>/oracle_sql.json, loads the Spark parquet result,
sorts both by all columns (columns ordered by name), and compares
values exactly (hash-compare strictness: floats must be bit-equal)
AND column types as DuckDB reports them (the driver's hash is
type-sensitive: r08's q157/q173 were value-identical but DuckDB's
sum() promoted the oracle column to HUGEINT vs Spark's BIGINT and the
hashes diverged — a Python-value compare alone cannot catch that).
"""
import json
import sys
import glob

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def fetch_sorted(con, sql_source: str):
    desc = con.execute(
        f"DESCRIBE SELECT * FROM ({sql_source})").fetchall()
    cols = [r[0] for r in desc]
    types = {r[0]: r[1] for r in desc}
    sel = ", ".join(f'"{c}"' for c in sorted(cols))
    rows = con.execute(
        f"SELECT {sel} FROM ({sql_source}) ORDER BY ALL NULLS FIRST").fetchall()
    return sorted(cols), [types[c] for c in sorted(cols)], rows


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

    n_pass = n_fail = 0
    spark_dirs = sorted({d.rstrip("/").split("/")[-1] for d in glob.glob(f"{out_dir}/*/")})
    for name in spark_dirs:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output files")
            n_fail += 1
            continue
        spark_src = f"SELECT * FROM read_parquet({files!r})"
        if name not in oracle:
            n = con.execute(f"SELECT count(*) FROM ({spark_src})").fetchone()[0]
            ok = n > 0
            print(f"{'ROWS' if ok else 'FAIL'} {name}: rows-only check, {n} rows")
            n_pass += ok
            n_fail += (not ok)
            continue
        try:
            ocols, otypes, orows = fetch_sorted(con, oracle[name])
            scols, stypes, srows = fetch_sorted(con, spark_src)
        except Exception as e:
            print(f"FAIL {name}: error: {e}")
            n_fail += 1
            continue
        if scols != ocols:
            print(f"FAIL {name}: columns spark={scols} oracle={ocols}")
            n_fail += 1
        elif stypes != otypes:
            diff = [(c, s, o) for c, s, o in zip(scols, stypes, otypes) if s != o]
            print(f"FAIL {name}: column TYPES differ (driver hash would miss): {diff}")
            n_fail += 1
        elif len(srows) != len(orows):
            print(f"FAIL {name}: rows spark={len(srows)} oracle={len(orows)}")
            n_fail += 1
        elif srows != orows:
            bad = [(i, a, b) for i, (a, b) in enumerate(zip(srows, orows)) if a != b]
            print(f"FAIL {name}: {len(bad)}/{len(srows)} row mismatches; first:")
            for i, a, b in bad[:3]:
                print(f"  row {i}: spark={a}")
                print(f"  row {i}: oracle={b}")
            n_fail += 1
        else:
            print(f"PASS {name}: {len(srows)} rows")
            n_pass += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
