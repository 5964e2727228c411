import time

from py_image_toolkit_spark.config import ExtractConfig
from py_image_toolkit_spark.fixtures import pages_df
from py_image_toolkit_spark.operators.extract_fields import extract_fields_df
from py_image_toolkit_spark.operators.segment import segment_pages
from py_image_toolkit_spark.operators.select import (
    compute_windows_df, extract_window_text_df, layout_blocks_df, select_main_df,
)
from py_image_toolkit_spark.session import build_session

spark = build_session("profile", master="local[8]", shuffle_partitions=8)
spark.sparkContext.setLogLevel("ERROR")
cfg = ExtractConfig()
pages = pages_df(spark, 30)


def t(name, df):
    t0 = time.time()
    n = df.count()
    print(f"{name}: {n} rows in {time.time()-t0:.1f}s", flush=True)
    return df


blocks = t("blocks", segment_pages(pages))
laid = t("laid", layout_blocks_df(blocks, cfg))
main = t("main", select_main_df(laid, cfg))
windows = t("windows", compute_windows_df(main, cfg))
assembled = t("assembled", extract_window_text_df(laid, windows, cfg))
fields = t("fields", extract_fields_df(assembled))
print("DONE", flush=True)
