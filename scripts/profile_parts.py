import sys
import time

from pyspark.sql import functions as F

from py_image_toolkit_spark.config import ExtractConfig
from py_image_toolkit_spark.fixtures import pages_df
from py_image_toolkit_spark.operators.extract_fields import label_pass1, tokenize_df
from py_image_toolkit_spark.operators.segment import segment_pages
from py_image_toolkit_spark.operators.select import (
    compute_windows_df, extract_window_text_df, layout_blocks_df, select_main_df,
)
from py_image_toolkit_spark.session import build_session

n = int(sys.argv[1]) if len(sys.argv) > 1 else 10000
spark = build_session("pprof", master="local[32]", shuffle_partitions=32,
                      extra_conf={"spark.driver.memory": "24g"})
spark.sparkContext.setLogLevel("ERROR")
cfg = ExtractConfig()

pages = pages_df(spark, n, partitions=64)
blocks = segment_pages(pages).persist(); blocks.count()
laid = layout_blocks_df(blocks, cfg)
windows = compute_windows_df(select_main_df(laid, cfg), cfg).persist(); windows.count()
assembled = extract_window_text_df(laid, windows, cfg).persist()
print("assembled parts:", assembled.count(), assembled.rdd.getNumPartitions(), flush=True)

tokens = tokenize_df(assembled).persist()
print("tokens parts:", tokens.count(), tokens.rdd.getNumPartitions(), flush=True)

t0 = time.time()
label_pass1(tokens, ("url", "rule")).write.mode("overwrite").format("noop").save()
print(f"label_pass1 as-is: {time.time()-t0:.1f}s", flush=True)

tok32 = tokens.repartition(32, "url", "rule").persist(); tok32.count()
t0 = time.time()
label_pass1(tok32, ("url", "rule")).write.mode("overwrite").format("noop").save()
print(f"label_pass1 repartitioned: {time.time()-t0:.1f}s", flush=True)

# token length distribution
tokens.select(F.max(F.length("token")), F.avg(F.length("token"))).show()
print("PPROF-DONE", flush=True)
