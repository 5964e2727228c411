"""Spark-level CPU-scaling probe: a pure-Python busy-loop mapInPandas job
(no shuffle, no text, no parquet) at a given core count. If THIS doesn't
scale ~linearly 8→32, the host/Spark overhead is the ceiling, not the
pipeline. Prints one JSON line."""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from py_image_toolkit_spark.session import build_session  # noqa: E402


def main(cpus: int, n_tasks: int = 64, spins: int = 4_000_000) -> None:
    spark = build_session(
        f"ceiling-{cpus}", master=f"local[{cpus}]", shuffle_partitions=cpus,
        extra_conf={"spark.driver.memory": "8g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    import pandas as pd

    def burn(batches):
        for pdf in batches:
            c = 0
            for _ in range(spins):
                c += 1
            yield pd.DataFrame({"c": [c + int(pdf["id"].sum())]})

    df = spark.range(n_tasks).repartition(n_tasks)
    # warm the Python workers once (exclude worker-spawn from the measurement)
    df.mapInPandas(burn, "c long").count()
    t0 = time.time()
    df.mapInPandas(burn, "c long").count()
    dt = time.time() - t0
    print(json.dumps({"cpus": cpus, "n_tasks": n_tasks, "wall_s": round(dt, 2),
                      "tasks_per_sec": round(n_tasks / dt, 1)}))
    spark.stop()


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]) if len(sys.argv) > 2 else 64)
