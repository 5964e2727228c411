import sys, time
from py_image_toolkit_spark.config import ExtractConfig
from py_image_toolkit_spark.fixtures import pages_df
from py_image_toolkit_spark.plans.pipeline import extract
from py_image_toolkit_spark.session import build_session

n = int(sys.argv[1]) if len(sys.argv) > 1 else 10000
cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
spark = build_session("fullprof", master=f"local[{cpus}]", shuffle_partitions=cpus,
                      extra_conf={"spark.driver.memory": "24g"})
spark.sparkContext.setLogLevel("ERROR")

src = f"/tmp/pages_{n}"
import os
if not os.path.exists(src + "/_SUCCESS"):
    pages_df(spark, n, partitions=64).write.mode("overwrite").parquet(src)
pages = spark.read.parquet(src)

for trial in (1, 2):
    t0 = time.time()
    extract(pages, ExtractConfig()).write.mode("overwrite").parquet(f"/tmp/ext_sink_{n}")
    dt = time.time() - t0
    print(f"trial {trial}: {dt:.1f}s  ({n/dt:.0f} docs/s)", flush=True)
print("FULL-DONE", flush=True)
