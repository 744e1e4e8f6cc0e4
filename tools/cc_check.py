#!/usr/bin/env python3
"""Engine-independent CC attestation (round 19, r18 verdict item 2).

Components are not closed under corpus slicing, so the slice-proof
convention cannot carry the CC family at 100x. This closes the gap from
the other side:

  1. PAIR PARITY — replay both verified pair frames (exact Jaccard>=0.5
     and LSH-banded+verified) in DuckDB from the raw corpus, using the
     rep-collapsed SQL the engine dump ships (cc_oracle_sql.json,
     authored by Dedup.ccReplaySql: cost scales with DISTINCT contents,
     not copy mass). Both EXCEPT directions must be zero and counts
     must match.
  2. COMPONENT REPRODUCTION — a pure-Python union-find over the
     engine's pair dump (plus the corpus node list) re-derives the
     min-id component labels, compared exactly against every engine
     component frame: comp_exact (d7/d21's pin), comp_lsh (d26+ pin),
     d34_incremental_components (incremental must equal full rebuild),
     and the d7/d26 size outputs.

Usage: cc_check.py <fixtureDir> <dumpDir> [jsonOut]
  fixtureDir — parquet tables (documents.parquet is read)
  dumpDir    — CCAttestation output
  jsonOut    — optional path for a machine-readable record of every
               check (the CC_ATTEST_100X.json artifact)
Exit 0 iff every check passes.
"""
import glob
import json
import os
import sys
from collections import Counter
from pathlib import Path

import duckdb
import pyarrow.parquet as pq


def table_pattern(fixture, table):
    """Single-file (driver testdata) or Spark-written dir (TenXFixture)."""
    p = f"{fixture}/{table}.parquet"
    return f"{p}/*.parquet" if os.path.isdir(p) else p

failures = []
records = []


def check(name, ok, detail=""):
    print(f"{'PASS' if ok else 'FAIL'}  {name:34s} {detail}")
    records.append({"check": name, "pass": ok, "detail": detail})
    if not ok:
        failures.append(name)


def pair_parity(con, dump, name, sql):
    # EXCEPT ALL: multiset semantics. Plain EXCEPT dedups, so an engine
    # frame duplicating one row while dropping another would pass all
    # three checks; EXCEPT ALL + equal counts pins exact row-multiset
    # equality (round-19 review finding).
    eng = f"read_parquet('{dump}/{name}/*.parquet')"
    n_eng = con.execute(f"SELECT count(*) FROM {eng}").fetchone()[0]
    con.execute(f"CREATE OR REPLACE TEMP VIEW oracle_pairs AS {sql}")
    n_ora = con.execute("SELECT count(*) FROM oracle_pairs").fetchone()[0]
    e_minus_o = con.execute(
        f"SELECT count(*) FROM (SELECT * FROM {eng} EXCEPT ALL "
        f"SELECT * FROM oracle_pairs)").fetchone()[0]
    o_minus_e = con.execute(
        f"SELECT count(*) FROM (SELECT * FROM oracle_pairs EXCEPT ALL "
        f"SELECT * FROM {eng})").fetchone()[0]
    check(f"{name} parity",
          n_eng == n_ora and e_minus_o == 0 and o_minus_e == 0,
          f"engine={n_eng} oracle={n_ora} e-o={e_minus_o} o-e={o_minus_e}")


def read_pairs(dump, name):
    t = pq.read_table(f"{dump}/{name}", columns=["doc_i", "doc_j"])
    return t.column("doc_i").to_pylist(), t.column("doc_j").to_pylist()


def union_find_labels(nodes, ei, ej):
    # attach the larger root under the smaller: every tree root stays
    # the min id of its set, so the final root IS the engine's label
    # convention (component = min reachable id); path-halving keeps the
    # walk short without disturbing that invariant
    parent = {v: v for v in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(ei, ej):
        ra, rb = find(a), find(b)
        if ra != rb:
            if ra < rb:
                parent[rb] = ra
            else:
                parent[ra] = rb
    return {v: find(v) for v in nodes}


def read_labels(dump, name, id_col, comp_col):
    t = pq.read_table(f"{dump}/{name}", columns=[id_col, comp_col])
    return dict(zip(t.column(id_col).to_pylist(),
                    t.column(comp_col).to_pylist()))


def main():
    fixture, dump = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{table_pattern(fixture, t)}')")
    oracle_sql = json.loads(
        Path(dump, "cc_oracle_sql.json").read_text())

    # 1. pair parity: DuckDB re-derives every dumped frame from the
    # corpus — the two edge sets plus any full registry outputs the
    # dump ships SQL for (d2/d3/d11/d16)
    for name, sql in sorted(oracle_sql.items()):
        pair_parity(con, dump, name, sql)

    nodes = []
    for f in sorted(glob.glob(table_pattern(fixture, "documents"))) or \
            [f"{fixture}/documents.parquet"]:
        nodes.extend(pq.read_table(f, columns=["doc_id"])
                     .column("doc_id").to_pylist())

    # 2. union-find over the engine's own pair dumps reproduces every
    # component frame (the pair dumps are DuckDB-attested above, so the
    # closure below is grounded in engine-independent edges) — a SECOND
    # reproduction path that shares nothing with the contracted
    # recursive-CTE replay the SQL side runs
    for pairs_name, frames in (
            ("pairs_exact", [("comp_exact", "id", "component"),
                             ("d7_dup_components", None, None)]),
            ("pairs_lsh", [("comp_lsh", "id", "component"),
                           ("d34_incremental_components",
                            "doc_id", "component"),
                           ("d26_lsh_dedup_components", None, None)])):
        ei, ej = read_pairs(dump, pairs_name)
        labels = union_find_labels(nodes, ei, ej)
        sizes = sorted((c, n) for c, n in
                       Counter(labels.values()).items() if n > 1)
        for frame, id_col, comp_col in frames:
            if id_col is None:  # a (component, n_docs) size output
                t = pq.read_table(f"{dump}/{frame}")
                got = sorted(zip(t.column("component").to_pylist(),
                                 t.column("n_docs").to_pylist()))
                check(f"{frame} == union-find sizes", got == sizes,
                      f"engine={len(got)} clusters, replay={len(sizes)}")
            else:
                got = read_labels(dump, frame, id_col, comp_col)
                check(f"{frame} == union-find labels", got == labels,
                      f"engine={len(got)} rows, replay={len(labels)}")

    print(f"\n{'FAIL: ' + ', '.join(failures) if failures else 'ALL PASS'}")
    if len(sys.argv) > 3:
        Path(sys.argv[3]).write_text(json.dumps(
            {"fixture": fixture, "dump": dump, "n_docs": len(nodes),
             "checks": records, "all_pass": not failures},
            indent=1) + "\n")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
