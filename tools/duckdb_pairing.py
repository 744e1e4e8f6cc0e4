#!/usr/bin/env python3
"""Paired DuckDB timing run — the oracle half of the 2x-bar comparison.

Executes every statement in a Verify-dumped oracle_sql.json against the
sf tables (views over the same parquet the engine read) and prints the
total plus the slowest statements. Run back-to-back with graft.Bench on
the same machine; compare engine total vs this total.

Usage: python3 tools/duckdb_pairing.py <sfDir> <oracle_sql.json> [reps]
"""
import sys, os, json, time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    sf_dir, oj = sys.argv[1], sys.argv[2]
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    sql = json.load(open(oj))
    for rep in range(reps):
        con = duckdb.connect()
        for t in TABLES:
            p = f"{sf_dir}/{t}.parquet"
            src = (f"read_parquet('{p}/*.parquet')" if os.path.isdir(p)
                   else f"read_parquet('{p}')")
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM {src}")
        times = {}
        t0 = time.time()
        for name in sorted(sql):
            q0 = time.time()
            con.execute(sql[name]).fetchall()
            times[name] = time.time() - q0
        total = time.time() - t0
        top = sorted(times.items(), key=lambda kv: -kv[1])[:5]
        label = "first" if rep == 0 else f"warm{rep}"
        print(f"DUCKDB {label} total={total:.1f}s n={len(sql)} slowest=" +
              " ".join(f"{k}:{v:.1f}" for k, v in top))
        con.close()


if __name__ == "__main__":
    main()
