#!/usr/bin/env python3
"""Time each oracle SQL in DuckDB over the same sf parquet tables.

Usage: python3 tools/oracletime.py <sfDir> <verify_out_dir_with_oracle_sql.json>

Local benchmarking aid only (mirrors how the judge re-times oracles to
grade Spark's bench line); not part of the driver contract.
"""
import json
import os
import sys
import time

import selfcheck  # shared fixture-table list + DuckDB view bootstrap


def main() -> None:
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    con = selfcheck.connect_views(sf_dir)
    con.execute("SET threads TO 32")
    times = {}
    for name in sorted(oracles):
        sql = oracles[name]
        best = None
        try:
            for _ in range(2):  # best-of-two, mirroring the Spark bench
                t0 = time.time()
                con.execute(sql).fetchall()
                dt = time.time() - t0
                # record inside the loop: a crash on run 2 must not discard
                # run 1's valid measurement
                best = dt if best is None else min(best, dt)
        except Exception as e:  # noqa: BLE001 - report and continue
            print(f"[oracletime] {name} failed: {e}", file=sys.stderr)
        times[name] = None if best is None else round(best, 2)
        print(f"{name}\t{times[name]}")
    total = sum(v for v in times.values() if v is not None)
    print(json.dumps({"total": round(total, 2),
                      "n": len([v for v in times.values() if v is not None])}))


if __name__ == "__main__":
    main()
