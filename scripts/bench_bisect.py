import json, os, shutil, sys, tempfile, time
sys.path.insert(0, '/root/repo')
from py_image_toolkit_spark.config import ExtractConfig
from py_image_toolkit_spark.fixtures import pages_df
from py_image_toolkit_spark.operators.segment import segment_pages
from py_image_toolkit_spark.plans.pipeline import extract
from py_image_toolkit_spark.session import build_session
from pyspark.sql import functions as F

cpus = int(sys.argv[1]); n = int(sys.argv[2]); variant = sys.argv[3]
conf = {"spark.driver.memory": "48g" if variant == "mem48" else "24g"}
spark = build_session(f"bisect-{cpus}", master=f"local[{cpus}]",
                      shuffle_partitions=cpus, extra_conf=conf)
spark.sparkContext.setLogLevel("ERROR")
src = f"/tmp/bpages_{n}"
if not os.path.exists(src + "/_SUCCESS"):
    pages_df(spark, n, partitions=64).write.mode("overwrite").parquet(src)
pages = spark.read.parquet(src)

t0 = time.time()
if variant == "parse_only":
    segment_pages(pages.repartition(cpus * 2, F.xxhash64("url"))).write.mode("overwrite").format("noop").save()
elif variant == "nopersist":
    extract(pages, ExtractConfig(), persist=False, num_partitions=cpus * 2).write.mode("overwrite").parquet(f"/tmp/bsink_{cpus}")
elif variant == "noop_sink":
    extract(pages, ExtractConfig(), num_partitions=cpus * 2).write.mode("overwrite").format("noop").save()
elif variant == "staged":
    import tempfile
    stg = tempfile.mkdtemp(prefix=f"stage_{cpus}_")
    extract(pages, ExtractConfig(), num_partitions=cpus * 2, staging_dir=os.path.join(stg, "blocks")).write.mode("overwrite").parquet(f"/tmp/bsink_{cpus}")
    shutil.rmtree(stg, ignore_errors=True)
else:
    extract(pages, ExtractConfig(), num_partitions=cpus * 2).write.mode("overwrite").parquet(f"/tmp/bsink_{cpus}")
dt = time.time() - t0
print(json.dumps({"variant": variant, "cpus": cpus, "n": n, "wall_s": round(dt, 1), "docs_per_sec": round(n/dt, 1)}), flush=True)
