#!/usr/bin/env python3
"""Time every oracle SQL in DuckDB at a given SF (default sf0.1) for a
single-node comparison point against BENCH (graft.Bench at the same
SF). DuckDB here is the measuring stick, not a dependency of the
engine. Usage: python3 tools/bench_duckdb.py [sfDir] [oracle_json]

oracle_json defaults to the dump graft.Verify writes
(/tmp/graft_verify/oracle_sql.json); run tools/check.py first.
"""
import json, sys, time
from pathlib import Path

import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
ORACLES = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify/oracle_sql.json")

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main():
    sqls = json.loads(ORACLES.read_text())
    con = duckdb.connect()
    con.execute(f"SET threads TO 32")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    out = {}
    for name in sorted(sqls):
        best = None
        for _ in range(2):
            t0 = time.time()
            try:
                con.execute(f"CREATE OR REPLACE TABLE _sink AS {sqls[name]}")
            except Exception as e:
                best = -1.0
                print(f"FAIL {name}: {e}", file=sys.stderr)
                break
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
            # the FNV-kernel oracles (q_llm_minhash_pairs ~4 min,
            # q_llm_fingerprints ~100 s at sf0.1) emulate 64-bit
            # wrapping hashes in HUGEINT SQL — 150-380x slower than
            # the engine's codegen'd kernels by design; one run is
            # representative, don't double the wait
            if dt > 30:
                break
        out[name] = round(best, 3)
    total = sum(v for v in out.values() if v >= 0)
    print(json.dumps({"metric": "duckdb_oracle_total", "value": round(total, 2),
                      "unit": "sec", "queries": out, "sf": SF}))


if __name__ == "__main__":
    main()
