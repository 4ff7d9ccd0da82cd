#!/usr/bin/env python
"""Full-corpus oracle-parity sweep at an arbitrary scale factor.

    python parity_sweep.py [sf_dir]     # default /root/testdata/sf0.1

The driver's correctness gate runs at sf0.01 and pytest at sf0.001;
this sweep runs every registered query against its DuckDB oracle at
sf0.1 (or any sf_dir) and writes PARITY_SWEEP.json. Larger inputs
exercise failure modes smaller ones cannot: multi-split scans,
sampled range-exchange bounds, real AQE decisions. The first sweep
caught exactly such a bug — sort_global_events' two dataflow branches
re-sampling different range bounds (operators/relational.py) — that
three rounds of sf0.001/sf0.01 checks could never trip.
"""

from __future__ import annotations

import json
import sys
import time


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "32")
        .getOrCreate()
    )
    import __spark_entry__ as entry
    from lapidus_spark.plans.registry import load_all
    from tests.oracle_utils import compare, duck_connection

    con = duck_connection(sf_dir)
    queries, oracles = entry.queries(), entry.oracle_sql()
    expected_empty = {n for n, s in load_all().items() if s.expected_empty}
    results: dict[str, dict] = {}
    for name in queries:
        t0 = time.time()
        try:
            if name in oracles:
                r = compare(queries[name](spark, sf_dir), con, oracles[name])
                rows = r["rows"][0]
                # Vacuity guard (VERDICT r9 #1): empty≡empty proves nothing.
                vacuous = bool(r["ok"]) and rows == 0 and name not in expected_empty
                results[name] = {
                    "ok": bool(r["ok"]) and not vacuous,
                    "detail": "vacuous: 0 rows at tested sf"
                    if vacuous
                    else (r.get("detail") or None),
                    "rows": rows,
                    "sec": round(time.time() - t0, 2),
                }
            else:
                rows = queries[name](spark, sf_dir).count()
                ok = rows >= 1 or name in expected_empty
                results[name] = {
                    "ok": ok,
                    "detail": "rows-only" if ok else "vacuous: 0 rows at tested sf",
                    "rows": rows,
                    "sec": round(time.time() - t0, 2),
                }
        except Exception as e:  # noqa: BLE001 — isolate per query
            results[name] = {
                "ok": False,
                "detail": str(e)[:200],
                "sec": round(time.time() - t0, 2),
            }
        print(name, results[name]["ok"], results[name]["sec"], flush=True)
    bad = [n for n, r in results.items() if not r["ok"]]
    out = {"sf_dir": sf_dir, "n": len(results), "failures": bad, "results": results}
    with open("PARITY_SWEEP.json", "w") as f:
        json.dump(out, f, indent=1)
    print(f"SWEEP DONE {len(results)} queries, {len(bad)} failures: {bad}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
