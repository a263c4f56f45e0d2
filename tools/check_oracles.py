"""Local stand-in for the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB over the
same sf dir; compare row counts + values (columns sorted by name, rows
sorted by all columns).  Usage:  python tools/check_oracles.py [sf_dir]
[query ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6g}"
    if hasattr(v, "isoformat"):
        return v.isoformat().replace("+00:00", "")
    if isinstance(v, bool):
        return str(int(v))
    if v is None:
        return ""
    return str(v)


def frame_to_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    return [cols[i] for i in order], sorted(out)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "16")
             .config("spark.ui.enabled", "false")
             .config("spark.sql.session.timeZone", "UTC")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir)
        srows = sdf.collect()
        scols, svals = frame_to_rows(sdf.columns, [tuple(r) for r in srows])
        if name not in oracles:
            print(f"{name:28s} rows-only: {len(srows)} rows "
                  f"(no oracle, weaker check)")
            continue
        try:
            res = con.execute(oracles[name])
            ocols_raw = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            print(f"{name:28s} ORACLE ERROR: {str(e)[:200]}")
            failures.append(name)
            continue
        ocols, ovals = frame_to_rows(ocols_raw, orows)
        status = []
        if scols != ocols:
            status.append(f"SCHEMA spark={scols} oracle={ocols}")
        if len(svals) != len(ovals):
            status.append(f"COUNT spark={len(svals)} oracle={len(ovals)}")
        elif svals != ovals:
            ndiff = sum(1 for a, b in zip(svals, ovals) if a != b)
            status.append(f"VALUES {ndiff}/{len(svals)} rows differ")
            for a, b in zip(svals, ovals):
                if a != b:
                    print(f"    spark : {a}\n    oracle: {b}")
                    break
        if status:
            print(f"{name:28s} FAIL: {'; '.join(status)}")
            failures.append(name)
        else:
            print(f"{name:28s} OK ({len(svals)} rows)")

    print(f"\n{len(failures)} failures: {failures}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
