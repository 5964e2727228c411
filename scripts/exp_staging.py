"""Experiment: persist vs columnar staging for the extraction pipeline at two
parallelism levels. One (mode, cpus) measurement per fresh JVM. Prints one
JSON line."""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from py_image_toolkit_spark.config import ExtractConfig  # noqa: E402
from py_image_toolkit_spark.fixtures import pages_df  # noqa: E402
from py_image_toolkit_spark.plans.pipeline import extract  # noqa: E402
from py_image_toolkit_spark.session import build_session  # noqa: E402


def main(mode: str, cpus: int, n_docs: int) -> None:
    spark = build_session(
        f"exp-{mode}-{cpus}", master=f"local[{cpus}]", shuffle_partitions=cpus,
        extra_conf={"spark.driver.memory": "24g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix=f"exp_{mode}_{cpus}_")
    try:
        pages_path = os.path.join(work, "pages")
        pages_df(spark, n_docs, partitions=64).write.mode("overwrite").parquet(pages_path)
        pages = spark.read.parquet(pages_path)
        t0 = time.time()
        kw = {}
        if mode == "staging":
            kw["staging_dir"] = os.path.join(work, "staging")
        elif mode == "nopersist":
            kw["persist"] = False
        extract(pages, ExtractConfig(), num_partitions=cpus * 2, **kw).write.mode(
            "overwrite"
        ).parquet(os.path.join(work, "out"))
        dt = time.time() - t0
        print(json.dumps({"mode": mode, "cpus": cpus, "n_docs": n_docs,
                          "wall_s": round(dt, 2),
                          "docs_per_sec": round(n_docs / dt, 1)}))
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]), int(sys.argv[3]))
