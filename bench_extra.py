"""Extra benchmarks for the optimization round (bench.py is FROZEN).

Per-query isolation with the noop sink (guide §1.4), job descriptions
(§1.5), and .explain("formatted") capture for plans/r06/. Mirrors bench.py's
methodology (same session config, sf0.001 warm-up, interleaved best-of-N)
so numbers are comparable, but adds:

  - plan capture:    python bench_extra.py plans [out_dir] [names...]
  - per-query bench: python bench_extra.py time [trials] [names...]
  - extract bench:   python bench_extra.py extract [trials]

Env: $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), $SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from py_image_toolkit_spark import contract  # noqa: E402
from py_image_toolkit_spark.config import ExtractConfig  # noqa: E402
from py_image_toolkit_spark.fixtures import pages_df  # noqa: E402
from py_image_toolkit_spark.plans.pipeline import extract  # noqa: E402
from py_image_toolkit_spark.session import build_session  # noqa: E402

BENCH_QUERIES = [
    "q01_pricing_summary",
    "q02_revenue_by_nation",
    "q06_sessionize_rle",
    "q09_topk_per_brand",
    "q17_merge_pivot",
    "q19_ngram_jaccard",
    "q20_minhash_lsh",
    "q22_ann_cosine_topk",
    "q25_quality_score",
]


def _session():
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_session(
        f"bench-extra-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={"spark.driver.memory": os.environ.get("SPARK_DRIVER_MEMORY", "24g")},
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _sf_dir() -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _warm(spark, names) -> None:
    warm_dir = os.path.join(os.path.dirname(_sf_dir().rstrip("/")), "sf0.001")
    if not os.path.isdir(warm_dir):
        return
    for name in names:
        contract.QUERIES[name](spark, warm_dir).write.mode("overwrite").format(
            "noop"
        ).save()
        contract.release_persists()
        spark.catalog.clearCache()


def cmd_plans(out_dir: str, names: list[str]) -> None:
    spark = _session()
    os.makedirs(out_dir, exist_ok=True)
    for name in names or BENCH_QUERIES:
        df = contract.QUERIES[name](spark, _sf_dir())
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        path = os.path.join(out_dir, f"{name}.txt")
        with open(path, "w") as f:
            f.write(plan)
        contract.release_persists()
        spark.catalog.clearCache()
        print(f"wrote {path}", flush=True)
    spark.stop()


def cmd_time(trials: int, names: list[str]) -> None:
    spark = _session()
    names = names or BENCH_QUERIES
    _warm(spark, names)
    timings: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(trials):
        for name in names:
            spark.sparkContext.setJobDescription(name)
            t0 = time.time()
            df = contract.QUERIES[name](spark, _sf_dir())
            df.write.mode("overwrite").format("noop").save()
            timings[name].append(round(time.time() - t0, 3))
            contract.release_persists()
            spark.catalog.clearCache()
    spark.sparkContext.setJobDescription(None)
    out = {
        n: {"min": min(v), "samples": v}
        for n, v in timings.items()
    }
    out["_total_min"] = round(sum(min(v) for v in timings.values()), 3)
    print(json.dumps(out))
    spark.stop()


def cmd_extract(trials: int) -> None:
    spark = _session()
    sf = 0.1
    base = os.path.basename(_sf_dir().rstrip("/"))
    try:
        sf = float(base.replace("sf", ""))
    except ValueError:
        pass
    n_docs = max(200, int(sf * 200_000))
    sink = tempfile.mkdtemp(prefix="bench_extra_sink_")
    samples = []
    try:
        pages_path = os.path.join(sink, "pages")
        pages_df(spark, n_docs, partitions=64).write.mode("overwrite").parquet(
            pages_path
        )
        pages = spark.read.parquet(pages_path)
        for _ in range(trials):
            spark.sparkContext.setJobDescription("extract_pipeline")
            t0 = time.time()
            extract(pages, ExtractConfig()).write.mode("overwrite").parquet(
                os.path.join(sink, "extractions")
            )
            samples.append(round(time.time() - t0, 3))
    finally:
        shutil.rmtree(sink, ignore_errors=True)
    print(json.dumps({"extract_pipeline": {"min": min(samples), "samples": samples},
                      "n_docs": n_docs}))
    spark.stop()


def main() -> None:
    cmd = sys.argv[1] if len(sys.argv) > 1 else "time"
    if cmd == "plans":
        out_dir = sys.argv[2] if len(sys.argv) > 2 else "plans/r06"
        cmd_plans(out_dir, sys.argv[3:])
    elif cmd == "extract":
        cmd_extract(int(sys.argv[2]) if len(sys.argv) > 2 else 3)
    else:
        trials = int(sys.argv[2]) if len(sys.argv) > 2 else 3
        cmd_time(trials, sys.argv[3:])


if __name__ == "__main__":
    main()
