import sys, time
from py_image_toolkit_spark.fixtures import pages_df
from py_image_toolkit_spark.operators.segment import segment_pages
from py_image_toolkit_spark.session import build_session
from pyspark.sql import functions as F

n = int(sys.argv[1]) if len(sys.argv) > 1 else 10000
spark = build_session("parseprof", master="local[32]", shuffle_partitions=32,
                      extra_conf={"spark.driver.memory": "24g"})
spark.sparkContext.setLogLevel("ERROR")

t0 = time.time()
pages_df(spark, n, partitions=64).write.mode("overwrite").parquet("/tmp/pages_prof")
print(f"materialize pages: {time.time()-t0:.1f}s", flush=True)

pages = spark.read.parquet("/tmp/pages_prof")
t0 = time.time()
c = segment_pages(pages).write.mode("overwrite").format("noop").save()
print(f"segment from parquet: {time.time()-t0:.1f}s", flush=True)

# pure passthrough mapInPandas to isolate framework overhead
import pandas as pd
def pt(its):
    for pdf in its:
        yield pd.DataFrame({"url": pdf["url"], "n": pdf["html"].map(lambda b: len(b) if b is not None else 0)})
t0 = time.time()
pages.select("url", "html").mapInPandas(pt, "url string, n long").write.mode("overwrite").format("noop").save()
print(f"passthrough mapInPandas: {time.time()-t0:.1f}s", flush=True)

# JVM-only baseline
t0 = time.time()
pages.select("url", F.length("html").alias("n")).write.mode("overwrite").format("noop").save()
print(f"jvm-only: {time.time()-t0:.1f}s", flush=True)
print("PARSE-DONE", flush=True)
