#!/usr/bin/env python3
"""Time selected oracle SQL in DuckDB over a ScaleStress corpus dir.

Usage: python3 tools/scaleoracle.py <scaleDir> <oracle_sql.json> <q1,q2,...> [threads]

Companion to graft.ScaleStress (SCALING.md): runs the SAME queries DuckDB-side
on the SAME scaled corpus, so the size-vs-time curves can be compared
engine-to-engine. Spark writes each table as a directory of parquet parts,
hence the glob views. Best-of-two, mirroring the bench protocol.
"""
import json
import os
import sys
import time

import duckdb


def main() -> None:
    scale_dir, oracle_path, names = sys.argv[1], sys.argv[2], sys.argv[3]
    threads = sys.argv[4] if len(sys.argv) > 4 else "32"
    with open(oracle_path) as f:
        oracles = json.load(f)
    con = duckdb.connect()
    con.execute(f"SET threads TO {threads}")
    for entry in sorted(os.listdir(scale_dir)):
        if entry.endswith(".parquet"):
            t = entry[: -len(".parquet")]
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{scale_dir}/{entry}/*.parquet')")
    for name in names.split(","):
        best = None
        rows = None
        try:
            for _ in range(2):
                t0 = time.time()
                rows = len(con.execute(oracles[name]).fetchall())
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
        except Exception as e:  # noqa: BLE001 - report and continue
            print(f"[scaleoracle] {name} failed: {e}", file=sys.stderr)
        sec = None if best is None else round(best, 2)
        print(json.dumps(
            {"dir": scale_dir, "query": name, "sec": sec, "rows": rows}))


if __name__ == "__main__":
    main()
