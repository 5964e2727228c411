"""Per-phase scaling probe for the extraction pipeline (staging mode):
P1 parse+stage, P2 windows materialize, P3 fused extract + sink.
One (cpus,) measurement per fresh JVM. Prints one JSON line."""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from py_image_toolkit_spark.config import ExtractConfig  # noqa: E402
from py_image_toolkit_spark.fixtures import pages_df  # noqa: E402
from py_image_toolkit_spark.operators.extract_kernel import fused_extract_df  # noqa: E402
from py_image_toolkit_spark.operators.segment import segment_pages  # noqa: E402
from py_image_toolkit_spark.operators.select import (  # noqa: E402
    compute_windows_df,
    layout_blocks_df,
    select_main_df,
)
from py_image_toolkit_spark.session import build_session  # noqa: E402


def main(cpus: int, n_docs: int) -> None:
    spark = build_session(
        f"phases-{cpus}", master=f"local[{cpus}]", shuffle_partitions=cpus,
        extra_conf={"spark.driver.memory": "24g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    cfg = ExtractConfig()
    work = tempfile.mkdtemp(prefix=f"phases_{cpus}_")
    t = {}
    try:
        pages_path = os.path.join(work, "pages")
        pages_df(spark, n_docs, partitions=64).write.mode("overwrite").parquet(pages_path)
        pages = spark.read.parquet(pages_path).repartition(cpus * 2, F.xxhash64("url"))

        t0 = time.time()
        staging = os.path.join(work, "staging")
        segment_pages(pages, cfg.wrap_width).write.mode("overwrite").parquet(staging)
        t["p1_parse_stage"] = round(time.time() - t0, 2)

        blocks = spark.read.parquet(staging).repartition(cpus * 2, F.xxhash64("url"))
        laid = layout_blocks_df(blocks, cfg)
        main_df = select_main_df(laid, cfg)
        windows = compute_windows_df(main_df, cfg).persist()
        t0 = time.time()
        windows.count()
        t["p2_windows"] = round(time.time() - t0, 2)

        t0 = time.time()
        fused_extract_df(laid, windows, cfg).write.mode("overwrite").parquet(
            os.path.join(work, "out")
        )
        t["p3_fused_sink"] = round(time.time() - t0, 2)

        t["total"] = round(sum(t.values()), 2)
        print(json.dumps({"cpus": cpus, "n_docs": n_docs, **t}))
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]) if len(sys.argv) > 2 else 100000)
