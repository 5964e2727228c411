from py_image_toolkit_spark.config import ExtractConfig
from py_image_toolkit_spark.fixtures import pages_df
from py_image_toolkit_spark.operators.segment import segment_pages
from py_image_toolkit_spark.operators.select import (
    compute_windows_df, extract_window_text_df, layout_blocks_df, select_main_df,
)
from py_image_toolkit_spark.session import build_session

spark = build_session("plans", master="local[2]", shuffle_partitions=2)
spark.sparkContext.setLogLevel("ERROR")
cfg = ExtractConfig()
pages = pages_df(spark, 5)

blocks = segment_pages(pages)
laid = layout_blocks_df(blocks, cfg)
main = select_main_df(laid, cfg)
windows = compute_windows_df(main, cfg).persist()
assembled = extract_window_text_df(laid, windows, cfg)

for name, df in [("blocks", blocks), ("laid", laid), ("main", main),
                 ("windows", windows), ("assembled", assembled)]:
    s = df._jdf.queryExecution().executedPlan().toString()
    a = df._jdf.queryExecution().analyzed().toString()
    print(f"{name}: analyzed={len(a)} physical={len(s)}", flush=True)

import re
s = assembled._jdf.queryExecution().executedPlan().toString()
lines = s.split("\n")
big = sorted(lines, key=len, reverse=True)[:3]
for b in big:
    print("BIGLINE", len(b), b[:300])
print("DONE", flush=True)
