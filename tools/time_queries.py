"""Per-query wall-time profile at driver SF: Spark collect + DuckDB oracle.

The external driver runs queries serially under a budget; this ranks where
that budget goes.  Usage: python tools/time_queries.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

from etl_ender_turing_spark.session import get_spark
from etl_ender_turing_spark.sources.readers import TESTDATA_TABLES


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from etl_ender_turing_spark.plans import CATALOG

    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    spark = get_spark("time-queries")
    rows = []
    for name, spec in CATALOG.items():
        t0 = time.time()
        try:
            spec.builder(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"ERR spark {name}: {e}")
            continue
        t1 = time.time()
        if spec.oracle is not None:
            try:
                con.execute(spec.oracle).df()
            except Exception as e:  # noqa: BLE001
                print(f"ERR duckdb {name}: {e}")
        t2 = time.time()
        rows.append((t2 - t0, t1 - t0, t2 - t1, name))
    rows.sort(reverse=True)
    total = sum(r[0] for r in rows)
    print(f"\nTOTAL {total:.1f}s over {len(rows)} queries")
    for tot, sp, du, name in rows[:30]:
        print(f"{tot:6.2f}s  spark {sp:6.2f}  duck {du:6.2f}  {name}")


if __name__ == "__main__":
    main()
