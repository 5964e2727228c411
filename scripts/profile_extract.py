import os
import sys
import time

from py_image_toolkit_spark.config import ExtractConfig
from py_image_toolkit_spark.fixtures import pages_df
from py_image_toolkit_spark.operators.extract_fields import extract_fields_df
from py_image_toolkit_spark.operators.segment import segment_pages
from py_image_toolkit_spark.operators.select import (
    compute_windows_df, extract_window_text_df, layout_blocks_df, select_main_df,
)
from py_image_toolkit_spark.plans.pipeline import extract
from py_image_toolkit_spark.session import build_session

n = int(sys.argv[1]) if len(sys.argv) > 1 else 10000
cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
spark = build_session("prof", master=f"local[{cpus}]", shuffle_partitions=cpus,
                      extra_conf={"spark.driver.memory": "24g"})
spark.sparkContext.setLogLevel("ERROR")
cfg = ExtractConfig()


def ts(name, fn):
    t0 = time.time()
    r = fn()
    print(f"{name}: {time.time()-t0:.1f}s", flush=True)
    return r


pages = pages_df(spark, n, partitions=cpus * 2)
ts("pages gen+count", lambda: pages.count())

blocks = segment_pages(pages).persist()
ts("segment(parse)", lambda: blocks.count())

laid = layout_blocks_df(blocks, cfg)
main = select_main_df(laid, cfg)
windows = compute_windows_df(main, cfg).persist()
ts("layout+select+windows", lambda: windows.count())

assembled = extract_window_text_df(laid, windows, cfg).persist()
ts("window text (H16)", lambda: assembled.count())

fields = extract_fields_df(assembled)
ts("E3 fields", lambda: fields.count())

t0 = time.time()
extract(pages, cfg).write.mode("overwrite").parquet("/tmp/prof_sink")
full = time.time() - t0
print(f"FULL extract->parquet: {full:.1f}s  ({n/full:.0f} docs/s)", flush=True)
print("PROF-DONE", flush=True)
