import os, sys, time
from pyspark.sql import functions as F
from py_image_toolkit_spark.config import ExtractConfig
from py_image_toolkit_spark.fixtures import pages_df
from py_image_toolkit_spark.operators.extract_fields import fields_from_text
from py_image_toolkit_spark.operators.segment import segment_pages
from py_image_toolkit_spark.operators.select import (
    compute_windows_df, extract_window_text_df, layout_blocks_df, select_main_df,
)
from py_image_toolkit_spark.session import build_session

n = int(sys.argv[1]) if len(sys.argv) > 1 else 10000
cpus = 32
spark = build_session("coldprof", master=f"local[{cpus}]", shuffle_partitions=cpus,
                      extra_conf={"spark.driver.memory": "24g"})
spark.sparkContext.setLogLevel("ERROR")
cfg = ExtractConfig()
src = f"/tmp/pages_{n}"
if not os.path.exists(src + "/_SUCCESS"):
    pages_df(spark, n, partitions=64).write.mode("overwrite").parquet(src)
pages = spark.read.parquet(src).repartition(64, F.xxhash64("url"))

def step(name, df):
    d = df.persist()
    t0 = time.time()
    c = d.count()
    print(f"{name}: {c} rows {time.time()-t0:.1f}s", flush=True)
    return d

blocks = step("parse", segment_pages(pages))
laid = step("layout", layout_blocks_df(blocks, cfg))
main = step("select", select_main_df(laid, cfg))
windows = step("windows", compute_windows_df(main, cfg))
assembled = step("H16 text", extract_window_text_df(laid, windows, cfg))
wf = step("E3 array fields", fields_from_text(assembled))
t0 = time.time()
wf.write.mode("overwrite").parquet("/tmp/cold_sink")
print(f"sink write: {time.time()-t0:.1f}s", flush=True)
print("COLD-DONE", flush=True)
