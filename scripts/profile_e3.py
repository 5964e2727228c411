import sys
import time

from py_image_toolkit_spark.config import ExtractConfig
from py_image_toolkit_spark.fixtures import pages_df
from py_image_toolkit_spark.operators.extract_fields import (
    label_name_inference, label_neighbor_relabel, label_pass1,
    merge_runs_df, pivot_fields_df, tokenize_df,
)
from py_image_toolkit_spark.operators.segment import segment_pages
from py_image_toolkit_spark.operators.select import (
    compute_windows_df, extract_window_text_df, layout_blocks_df, select_main_df,
)
from py_image_toolkit_spark.session import build_session

n = int(sys.argv[1]) if len(sys.argv) > 1 else 10000
spark = build_session("e3prof", master="local[32]", shuffle_partitions=32,
                      extra_conf={"spark.driver.memory": "24g"})
spark.sparkContext.setLogLevel("WARN")
cfg = ExtractConfig()
keys = ("url", "rule")

pages = pages_df(spark, n, partitions=64)
blocks = segment_pages(pages).persist()
blocks.count()
laid = layout_blocks_df(blocks, cfg)
windows = compute_windows_df(select_main_df(laid, cfg), cfg).persist()
windows.count()
assembled = extract_window_text_df(laid, windows, cfg).persist()
print("assembled:", assembled.count(), flush=True)


def ts(name, df):
    d = df.persist()
    t0 = time.time()
    c = d.count()
    print(f"{name}: {c} rows {time.time()-t0:.1f}s", flush=True)
    return d


tokens = ts("tokenize", tokenize_df(assembled, keys))
l1 = ts("label_pass1", label_pass1(tokens, keys))
l2 = ts("name_inference", label_name_inference(l1, keys))
l3 = ts("neighbor", label_neighbor_relabel(l2, keys))
merged = ts("merge_runs", merge_runs_df(l3, keys))
piv = ts("pivot", pivot_fields_df(merged, keys))
print("E3PROF-DONE", flush=True)
