#!/usr/bin/env python3
"""d4_simhash_pairs slice-parity compare — the DuckDB half of the r15
slice-parity convention (see graft.tools.D4SliceProof for the engine
half and the closure argument).

Usage: python3 tools/d4_slice_check.py <sfDir> <proofDir> [mod]

Registers `documents` as the sfDir table RESTRICTED to doc_id % mod = 0,
replays the registry's d4_simhash_pairs oracle SQL over it, and compares
against <proofDir>/engine (the full engine run filtered to slice-internal
pairs): row counts plus both EXCEPT directions must be zero.
The oracle SQL is read from <proofDir>/oracle_sql.json if present, else
from any sibling verify dump passed via ORACLE_JSON.
"""
import sys, os, json, glob
import duckdb


def main():
    sf_dir, proof_dir = sys.argv[1], sys.argv[2]
    mod = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    oj = os.environ.get("ORACLE_JSON", f"{proof_dir}/oracle_sql.json")
    sql = json.load(open(oj))["d4_simhash_pairs"]
    con = duckdb.connect()
    p = f"{sf_dir}/documents.parquet"
    src = f"read_parquet('{p}/*.parquet')" if os.path.isdir(p) \
        else f"read_parquet('{p}')"
    con.execute(f"CREATE VIEW documents AS SELECT * FROM {src} "
                f"WHERE doc_id % {mod} = 0")
    con.execute(f"CREATE TABLE oracle AS {sql}")
    eng = f"{proof_dir}/engine/*.parquet"
    con.execute(f"CREATE TABLE engine AS SELECT * FROM read_parquet('{eng}')")
    n_o = con.execute("SELECT count(*) FROM oracle").fetchone()[0]
    n_e = con.execute("SELECT count(*) FROM engine").fetchone()[0]
    miss = con.execute(
        "SELECT count(*) FROM (SELECT * FROM oracle EXCEPT "
        "SELECT * FROM engine)").fetchone()[0]
    spur = con.execute(
        "SELECT count(*) FROM (SELECT * FROM engine EXCEPT "
        "SELECT * FROM oracle)").fetchone()[0]
    ok = n_o == n_e and miss == 0 and spur == 0
    print(f"{'PASS' if ok else 'FAIL'} d4 slice parity mod={mod}: "
          f"oracle={n_o} engine={n_e} missing={miss} spurious={spur}")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
