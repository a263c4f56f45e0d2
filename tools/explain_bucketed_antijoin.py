"""Measured witness for the SURVEY §4 claim that the 10^10-scale seen-set
anti-join is storage-partitioned (bucket-local, no shuffle of the big side).

The production design keeps the accumulated ``seen`` table hash-bucketed by
``url_hash`` (Iceberg ``bucket(B, url_hash)``; the parquet stand-in's
``compact_seen`` writes the same layout).  When the wave's candidate set is
written/read with the SAME bucketing, Spark's bucketed-scan rule plans the
``LEFT ANTI`` membership probe with ZERO Exchange operators — each task
anti-joins bucket i against bucket i locally.  This script builds both
shapes at a few million keys, prints the executed plans (no Exchange vs two
Exchanges), and times them; append its output to EXPLAIN.md.

Run:  python tools/explain_bucketed_antijoin.py [n_seen] [n_cand] [buckets]
"""
from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_seen = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    n_cand = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    buckets = int(sys.argv[3]) if len(sys.argv) > 3 else 16

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    wh = tempfile.mkdtemp(prefix="bucket-antijoin-wh-")
    spark = (SparkSession.builder.master(f"local[{os.cpu_count() or 8}]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.driver.memory", "8g")
             .config("spark.sql.warehouse.dir", wh)
             .config("spark.ui.enabled", "false")
             # force the join itself (not a broadcast) so the witness shows
             # the storage-partitioned shape that survives any table size
             .config("spark.sql.autoBroadcastJoinThreshold", "-1")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    # synthetic key tables: seen = accumulated url hashes, cand = one wave's
    # candidate hashes (half known, half novel — the realistic mix)
    seen = spark.range(n_seen).select(
        F.xxhash64(F.col("id").cast("string")).alias("url_hash"))
    cand = spark.range(n_cand).select(
        F.xxhash64(((F.col("id") % (2 * n_cand))
                    + (n_seen - n_cand)).cast("string")).alias("url_hash"))

    spark.sql("DROP TABLE IF EXISTS seen_b")
    spark.sql("DROP TABLE IF EXISTS cand_b")
    seen.write.bucketBy(buckets, "url_hash").sortBy("url_hash") \
        .mode("overwrite").saveAsTable("seen_b")
    cand.write.bucketBy(buckets, "url_hash").sortBy("url_hash") \
        .mode("overwrite").saveAsTable("cand_b")
    # unbucketed copies of the SAME data for the baseline
    seen.write.mode("overwrite").saveAsTable("seen_p")
    cand.write.mode("overwrite").saveAsTable("cand_p")

    def anti(a, b):
        return spark.table(a).join(spark.table(b), "url_hash", "left_anti")

    def run(tag, df, reps=3):
        plan = df._jdf.queryExecution().executedPlan().toString()
        n_ex = plan.count("Exchange")
        best = min(_timed(df) for _ in range(reps))
        print(f"\n=== {tag}: {n_ex} Exchange operator(s), best of {reps}: "
              f"{best:.2f} s ===")
        print("\n".join(plan.splitlines()[:28]))
        return n_ex, best

    def _timed(df):
        t0 = time.monotonic()
        df.count()
        return time.monotonic() - t0

    nb, tb = run("BUCKETED anti-join (storage-partitioned, bucket-local)",
                 anti("cand_b", "seen_b"))
    nu, tu = run("UNBUCKETED anti-join (both sides shuffle)",
                 anti("cand_p", "seen_p"))
    print(f"\nsummary: bucketed={tb:.2f}s ({nb} exchanges) "
          f"unbucketed={tu:.2f}s ({nu} exchanges) "
          f"n_seen={n_seen} n_cand={n_cand} buckets={buckets}")
    assert nb == 0, "bucketed anti-join must plan with zero Exchange"
    assert nu >= 2, "unbucketed baseline should shuffle both sides"
    spark.stop()
    shutil.rmtree(wh, ignore_errors=True)


if __name__ == "__main__":
    main()
