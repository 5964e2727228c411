"""Skew evidence for the salted two-stage aggregation (round-2 verdict task
#7): on a skewed-host view log (one host = 30% of rows), compare

  naive holistic:  groupBy(host).agg(size(collect_set(url)))
                   — the hot host's whole element set is accumulated by ONE
                   reducer task
  salted:          salted_two_stage_agg(..., n_salts) — stage 1 builds
                   disjoint partial sets across n_salts reducers, stage 2
                   sums their sizes (no element merge on any single task)

Algebraic aggs are NOT benchmarked here: map-side partial aggregation
already makes plain groupBy skew-proof for sum/count (see the helper's
docstring) — claiming a salting win there would be benchmarketing.

Prints one JSON line and appends a table to BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from py_image_toolkit_spark.plans.job import salted_two_stage_agg  # noqa: E402
from py_image_toolkit_spark.session import build_session  # noqa: E402


def skewed_views(spark, n: int, hot_share: float = 0.3):
    n_hot = int(n * hot_share)
    return spark.range(n, numPartitions=64).select(
        F.when(F.col("id") < n_hot, F.lit("hot.example"))
        .otherwise(F.concat(F.lit("host-"), (F.col("id") % 500).cast("string")))
        .alias("host"),
        F.concat(F.lit("/page/"), F.md5(F.col("id").cast("string"))).alias("url"),
    )


def main(n: int = 8_000_000, cpus: int = 16, trials: int = 2) -> None:
    spark = build_session(
        "salted-bench", master=f"local[{cpus}]", shuffle_partitions=cpus,
        extra_conf={"spark.driver.memory": "24g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    views = skewed_views(spark, n)
    views.write.mode("overwrite").parquet("/tmp/salted_views")
    views = spark.read.parquet("/tmp/salted_views")

    def run(df):
        t0 = time.time()
        df.write.mode("overwrite").format("noop").save()
        return time.time() - t0

    naive = views.groupBy("host").agg(F.size(F.collect_set("url")).alias("n_urls"))
    salted = salted_two_stage_agg(
        views.select("host", "url"),
        "host",
        {
            "n_urls": (
                lambda c: F.size(F.collect_set("url")).alias("n_urls"),
                lambda c: F.sum("n_urls").alias("n_urls"),
            )
        },
        n_salts=cpus,
    )
    # warm both plans (codegen), then timed best-of-N
    run(naive.limit(1)), run(salted.limit(1))
    t_naive = min(run(naive) for _ in range(trials))
    t_salted = min(run(salted) for _ in range(trials))

    report = {
        "n_rows": n,
        "hot_share": 0.3,
        "cpus": cpus,
        "naive_collect_set_s": round(t_naive, 2),
        "salted_s": round(t_salted, 2),
        "speedup": round(t_naive / t_salted, 2),
    }
    print(json.dumps(report))
    md = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      "BENCH", "BASELINE.md")
    with open(md, "a") as fh:
        fh.write(
            f"\n## Salted holistic agg {time.strftime('%Y-%m-%d %H:%M:%S')} — "
            f"{n} rows, hot host 30%, local[{cpus}]\n\n"
            f"| plan | wall (s) |\n|---|---|\n"
            f"| naive groupBy(host).collect_set(url) | {t_naive:.2f} |\n"
            f"| salted two-stage (n_salts={cpus}, disjoint buckets) | {t_salted:.2f} |\n\n"
            f"speedup {t_naive / t_salted:.2f}× — the hot key's set-build "
            f"parallelizes across salts; stage 2 sums partial sizes only. "
            f"(Algebraic aggs not claimed: map-side partial agg already "
            f"handles skew there.)\n"
        )
    spark.stop()


if __name__ == "__main__":
    main(
        int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000,
        int(sys.argv[2]) if len(sys.argv) > 2 else 16,
    )
