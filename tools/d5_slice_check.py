#!/usr/bin/env python3
"""d5_embed_neardup slice-parity compare — the DuckDB half of the
D5SliceProof convention (see graft.tools.D5SliceProof for the engine
half and the closure argument).

Usage: python3 tools/d5_slice_check.py <sfDir> <proofDir> [mod]

Registers `embeddings` as the sfDir table RESTRICTED to
vec_id % mod = 0, replays the registry's d5_embed_neardup oracle SQL
over it, and compares against <proofDir>/engine (the full engine run
filtered to slice-internal pairs): row counts plus both EXCEPT
directions must be zero. The oracle SQL is read from
<proofDir>/oracle_sql.json (written by D5SliceProof), else from a
sibling dump passed via ORACLE_JSON.
"""
import sys, os, json
import duckdb


def main():
    sf_dir, proof_dir = sys.argv[1], sys.argv[2]
    mod = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    oj = os.environ.get("ORACLE_JSON", f"{proof_dir}/oracle_sql.json")
    sql = json.load(open(oj))["d5_embed_neardup"]
    con = duckdb.connect()
    p = f"{sf_dir}/embeddings.parquet"
    src = f"read_parquet('{p}/*.parquet')" if os.path.isdir(p) \
        else f"read_parquet('{p}')"
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM {src} "
                f"WHERE vec_id % {mod} = 0")
    con.execute(f"CREATE TABLE oracle AS {sql}")
    eng = f"{proof_dir}/engine/*.parquet"
    con.execute(f"CREATE TABLE engine AS SELECT * FROM read_parquet('{eng}')")
    n_o = con.execute("SELECT count(*) FROM oracle").fetchone()[0]
    n_e = con.execute("SELECT count(*) FROM engine").fetchone()[0]
    # sim is a double; compare at the engine's emitted precision by
    # exact value — both sides compute the identical IEEE expression
    miss = con.execute(
        "SELECT count(*) FROM (SELECT * FROM oracle EXCEPT "
        "SELECT * FROM engine)").fetchone()[0]
    spur = con.execute(
        "SELECT count(*) FROM (SELECT * FROM engine EXCEPT "
        "SELECT * FROM oracle)").fetchone()[0]
    ok = n_o == n_e and miss == 0 and spur == 0
    print(f"{'PASS' if ok else 'FAIL'} d5 slice parity mod={mod}: "
          f"oracle={n_o} engine={n_e} missing={miss} spurious={spur}")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
