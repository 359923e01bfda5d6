"""Driver simulation (verify step 2): consume __spark_entry__.py the
way the grading driver does — importlib load, a session deliberately
configured with a NON-UTC timezone (tune() must repair it), entry()
smoke check with schema stability on rerun, oracle-key containment,
and a couple of sampled callables diffed against DuckDB.

Usage: python tools/driver_sim.py [sf_dir] [query ...]
(default sf_dir /root/testdata/sf0.001 for entry; sampled queries run
at /root/testdata/sf0.01 like the driver's correctness gate)
"""

from __future__ import annotations

import importlib.util
import os
import random
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402


def main() -> int:
    sf001 = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    sample = sys.argv[2:]
    sf01 = "/root/testdata/sf0.01"

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("driver-sim")
        .config("spark.sql.session.timeZone", "America/New_York")
        .config("spark.sql.shuffle.partitions", "32")
        .getOrCreate()
    )
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "__spark_entry__.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    df1 = mod.entry(spark)
    rows = df1.count()
    schema1 = df1.schema.simpleString()
    df2 = mod.entry(spark)
    assert rows >= 0 and df2.schema.simpleString() == schema1, "unstable"
    print(f"entry(): {rows} rows, stable schema OK")

    queries = mod.queries()
    oracles = mod.oracle_sql()
    missing = set(oracles) - set(queries)
    assert not missing, f"oracle keys without queries: {missing}"
    print(f"{len(queries)} queries, {len(oracles)} oracles, keys OK")

    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf01}/{t}.parquet'"
        )
    names = sample or random.sample(sorted(oracles), 3)
    for name in names:
        got = queries[name](spark, sf01)
        want = con.sql(oracles[name]).df()
        n_got, n_want = got.count(), len(want)
        status = "PASS" if n_got == n_want else "FAIL"
        print(f"{status}  {name}: spark={n_got} oracle={n_want}")
        if status == "FAIL":
            return 1
    print("driver-sim OK")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
