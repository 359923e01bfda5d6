"""Local stand-in for the driver's correctness gate.

Runs every registered query through Spark AND its DuckDB oracle at a
given sf dir, then compares:
  - row count
  - schema (column names; dtypes printed for eyeballing)
  - order-insensitive value hash (rows sorted, columns sorted by name)

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import go_pulsar_elasticsearch_spark as gpe
from go_pulsar_elasticsearch_spark.catalog import TABLES
from go_pulsar_elasticsearch_spark.registry import ORACLES, QUERIES
from go_pulsar_elasticsearch_spark.session import get_spark

gpe.load_all()


def canon(df: pd.DataFrame) -> tuple[str, list[str]]:
    """Order-insensitive canonical hash: sort columns by name, stringify
    every value (floats via repr for bit-exactness), sort rows."""
    df = df[sorted(df.columns)]
    rows = []
    for row in df.itertuples(index=False):
        parts = []
        for v in row:
            if v is None or v != v:  # NaN/None
                parts.append("<null>")
            elif isinstance(v, float):
                parts.append(repr(v))
            else:
                parts.append(str(v))
        rows.append(" | ".join(parts))
    rows.sort()
    h = hashlib.sha256("\x1e".join(rows).encode()).hexdigest()[:16]
    return h, rows


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        # testdata ships single files; scale-probe replicas are Spark
        # output DIRECTORIES — glob those
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

    n_pass = n_fail = n_rows_only = 0
    failures = []
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            spdf = sdf.toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            n_fail += 1
            failures.append(name)
            continue
        if name not in ORACLES:
            print(f"rows  {name}: {len(spdf)} rows (rows-only, no oracle) "
                  f"[{time.time()-t0:.1f}s]")
            n_rows_only += 1
            continue
        try:
            odf = con.sql(ORACLES[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: oracle error: {e}")
            n_fail += 1
            failures.append(name)
            continue
        problems = []
        if len(spdf) != len(odf):
            problems.append(f"rowcount spark={len(spdf)} oracle={len(odf)}")
        if sorted(spdf.columns) != sorted(odf.columns):
            problems.append(
                f"columns spark={sorted(spdf.columns)} oracle={sorted(odf.columns)}"
            )
        if not problems:
            hs, rs = canon(spdf)
            ho, ro = canon(odf)
            if hs != ho:
                problems.append("value-hash mismatch")
                for i, (a, b) in enumerate(zip(rs, ro)):
                    if a != b:
                        problems.append(f"  first diff row {i}:")
                        problems.append(f"    spark : {a[:300]}")
                        problems.append(f"    oracle: {b[:300]}")
                        break
        # dtype report (informational — driver may compare schemas)
        dt_s = {c: str(spdf[c].dtype) for c in spdf.columns}
        dt_o = {c: str(odf[c].dtype) for c in odf.columns}
        dtype_diff = {
            c: (dt_s.get(c), dt_o.get(c))
            for c in set(dt_s) | set(dt_o)
            if dt_s.get(c) != dt_o.get(c)
        }
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems[:1]))
            for p in problems[1:]:
                print(p)
            n_fail += 1
            failures.append(name)
        else:
            extra = f" dtypes~{dtype_diff}" if dtype_diff else ""
            print(f"PASS  {name}: {len(spdf)} rows [{time.time()-t0:.1f}s]{extra}")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    if failures:
        print("failures:", " ".join(failures))
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
