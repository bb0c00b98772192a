"""Per-query decomposition for the r11 optimization round.

    python tools/decompose_r11.py <query> [sf_dir]

Runs one registered query in a fresh session and reports, with wall times:
  1. build:    registry fn call -> DataFrame (driver-side; includes any
               eager actions the query body runs: counts, training loops,
               collects)
  2. exec1:    first noop-sink execution (JIT + codegen + shuffle warm)
  3. exec2/3:  steady-state noop executions (the bench's measured regime)

plus the Spark job count the query issued during build and during exec
(from the status tracker), so "many tiny jobs" shows up as a number.
"""

from __future__ import annotations

import os
import sys
import time


def main() -> int:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    from mapreduce_model_spark import registry
    from mapreduce_model_spark.session import get_spark

    spark = get_spark(app_name=f"decompose-{name}")
    # same warmup the bench does, abbreviated: touch parquet + python workers
    registry.table(spark, sf_dir, "lineitem").count()
    from pyspark.sql import functions as F

    docs = registry.table(spark, sf_dir, "documents").limit(50)
    docs.select("doc_id").mapInPandas(lambda it: it, "doc_id bigint").write.format(
        "noop"
    ).mode("overwrite").save()
    docs.select(F.explode(F.split("text", " ")).alias("w")).groupBy("w").count().write.format(
        "noop"
    ).mode("overwrite").save()

    st = spark.sparkContext.statusTracker()
    fn = registry.QUERIES[name]

    j0 = len(st.getJobIdsForGroup(None) or [])
    t0 = time.perf_counter()
    df = fn(spark, sf_dir)
    t_build = time.perf_counter() - t0
    j1 = len(st.getJobIdsForGroup(None) or [])

    times = []
    for i in range(3):
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)  # rebuild each run like the bench does
        df.write.format("noop").mode("overwrite").save()
        times.append(time.perf_counter() - t0)
    j2 = len(st.getJobIdsForGroup(None) or [])

    print(
        f"DECOMP {name}: build={t_build:.3f}s jobs_build={j1 - j0} "
        f"runs={[round(t, 3) for t in times]} jobs_per_full_run={(j2 - j1) / 3:.1f}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
