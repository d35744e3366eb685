#!/usr/bin/env python3
"""Merge a graft.Bench JSON stream with a tools/oracletime.py dump into one
round sidecar (ORACLETIME_r{N}.json): per-query Spark-vs-DuckDB seconds and
the shared-total ratio, so the engine comparison is tracked round-over-round
without re-derivation.

Usage: python3 tools/benchsidecar.py <bench_lines.json> <oracletime.txt> <round> <out.json>
"""
import json
import sys


def main() -> None:
    bench_path, oracle_path, rnd, out_path = sys.argv[1:5]
    spark, final = {}, None
    with open(bench_path) as f:
        for line in f:
            if not line.strip():
                continue
            d = json.loads(line)
            spark.update(d.get("queries", {}))
            if "value" in d:
                final = d
    duck, meta = {}, {}
    with open(oracle_path) as f:
        for line in f:
            line = line.strip()
            if line.startswith("{"):
                meta = json.loads(line)
                continue
            k, v = line.split("\t")
            duck[k] = None if v == "None" else float(v)
    shared = [k for k in spark if duck.get(k) is not None]
    s_tot = sum(spark[k] for k in shared)
    d_tot = sum(duck[k] for k in shared)
    out = {
        "round": int(rnd),
        "sf": final.get("sf"),
        "protocol": {
            "spark": "graft.Bench warm-session (see canary for noise state)",
            "duckdb": "tools/oracletime.py best-of-2, 32 threads, same parquet",
        },
        "canary": final.get("canary"),
        "spark_total_s": round(final["value"], 2),
        "spark_n_queries": final.get("n_queries"),
        "duckdb_total_s": meta.get("total"),
        "duckdb_n_oracles": meta.get("n"),
        "shared_queries": len(shared),
        "shared_spark_s": round(s_tot, 2),
        "shared_duckdb_s": round(d_tot, 2),
        "shared_total_ratio": round(s_tot / d_tot, 3),
        "per_query": {
            k: {"spark_s": spark.get(k), "duckdb_s": duck.get(k)}
            for k in sorted(set(spark) | set(duck))
        },
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"spark {round(s_tot, 1)}s vs duckdb {round(d_tot, 1)}s over "
          f"{len(shared)} shared -> ratio {round(s_tot / d_tot, 3)}")


if __name__ == "__main__":
    main()
