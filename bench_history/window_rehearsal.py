"""Driver-window dress rehearsal: run the FIRST 50 registered queries
in registry order against their DuckDB oracles at sf0.01, in ONE fresh
process — exactly the shape of the driver's per-round CORRECTNESS
pass, including cross-query state (the per-process build memos, cache
release between queries, session conf accretion) that per-test pytest
runs cannot see. Prints one JSON line {"window": N, "failures": [...]}.

Run before ending any round that touched the registry:
  python bench_history/window_rehearsal.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import __spark_entry__ as e
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import duckdb

    from tests.oracle import compare

    q, o = e.queries(), e.oracle_sql()
    window = list(q)[:50]
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    failures = []
    for name in window:
        try:
            df = q[name](spark, sf_dir)
            if name in o:
                ok, msg = compare(df, o[name], sf_dir)
                if not ok:
                    failures.append((name, msg[:200]))
            else:
                assert df.count() >= 0
        except Exception as ex:  # noqa: BLE001 - report, don't abort
            failures.append((name, repr(ex)[:200]))
    print(json.dumps({"window": len(window), "failures": failures}))
    spark.stop()


if __name__ == "__main__":
    main()
