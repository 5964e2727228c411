import os, sys, time
from pyspark.sql import functions as F
from py_image_toolkit_spark.config import ExtractConfig
from py_image_toolkit_spark.fixtures import pages_df
from py_image_toolkit_spark.operators.extract_fields import classify_token, fields_from_text
from py_image_toolkit_spark.operators.segment import segment_pages
from py_image_toolkit_spark.operators.select import (
    compute_windows_df, extract_window_text_df, layout_blocks_df, select_main_df,
)
from py_image_toolkit_spark.session import build_session

n = 10000
spark = build_session("aprof", master="local[32]", shuffle_partitions=32,
                      extra_conf={"spark.driver.memory": "24g"})
spark.sparkContext.setLogLevel("ERROR")
cfg = ExtractConfig()
src = f"/tmp/pages_{n}"
if not os.path.exists(src + "/_SUCCESS"):
    pages_df(spark, n, partitions=64).write.mode("overwrite").parquet(src)
pages = spark.read.parquet(src).repartition(64, F.xxhash64("url"))
blocks = segment_pages(pages).persist(); blocks.count()
laid = layout_blocks_df(blocks, cfg)
windows = compute_windows_df(select_main_df(laid, cfg), cfg).persist(); windows.count()
assembled = extract_window_text_df(laid, windows, cfg).persist(); assembled.count()

def ts(name, df):
    t0 = time.time()
    df.write.mode("overwrite").format("noop").save()
    print(f"{name}: {time.time()-t0:.1f}s", flush=True)

toksed = assembled.withColumn("_toks", F.filter(F.split(F.col("extracted_text"), r"\s+"), lambda x: x != "")).persist()
toksed.count()
ts("tokenize only", toksed)

lab = toksed.withColumn("_lab1", F.transform(F.col("_toks"),
      lambda t, i: classify_token(t, F.when(i >= 1, F.element_at(F.col("_toks"), i)))))
ts("classify transform (interpreted)", lab)

ts("full fields_from_text", fields_from_text(assembled))

# comparison: exploded codegen'd classify, no shuffle (prev from array)
ex = toksed.select("url", "rule", "_toks", F.posexplode("_toks").alias("seq", "token"))
cls = ex.withColumn("label", classify_token(F.col("token"),
        F.when(F.col("seq") >= 1, F.element_at(F.col("_toks"), F.col("seq")))))
ts("exploded codegen classify", cls.select("url", "rule", "seq", "label"))

# exploded classify + collect back to arrays (one shuffle)
back = cls.groupBy("url", "rule").agg(
    F.array_sort(F.collect_list(F.struct("seq", "token", "label"))).alias("tl"))
ts("exploded classify + collect_list", back)
print("APROF-DONE", flush=True)
