"""Watermarked event-time windowed aggregation (streaming/windowed.py):
exactly-once append emission per closed window, late-data drop, and
watermark persistence across AvailableNow restarts via the checkpoint."""

import os

from pyspark.sql import functions as F

from py_image_toolkit_spark.streaming.windowed import windowed_host_counts

_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"


def _rows(spark, specs):
    return spark.createDataFrame(
        [
            (f"https://{host}/p/{i}", f"2024-01-01 {hhmm}:00", None, None, "en")
            for i, (host, hhmm) in enumerate(specs)
        ],
        "url string, warc_ts string, html binary, text string, lang string",
    ).withColumn("warc_ts", F.col("warc_ts").cast("timestamp"))


def _drain(spark, input_dir, out_dir, checkpoint):
    """One AvailableNow pass: parquet file sink (supports checkpoint
    recovery, unlike the memory sink); returns the CUMULATIVE emitted rows."""
    stream = spark.readStream.schema(_SCHEMA).format("parquet").load(input_dir)
    q = (
        windowed_host_counts(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return {
        (str(r["window_start"]), r["host"]): r["n_docs"]
        for r in spark.read.parquet(out_dir).collect()
    }


def test_windowed_counts_emit_once_and_drop_late(spark, tmp_path):
    input_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    checkpoint = str(tmp_path / "ckpt")
    os.makedirs(input_dir)

    # batch 1: three docs in the 10:00 window, one at 10:21 that advances
    # the watermark to 10:16 — past the 10:00 window's end, so it closes
    # and is emitted in this drain
    _rows(
        spark,
        [("a.io", "10:01"), ("a.io", "10:04"), ("b.io", "10:07"), ("a.io", "10:21")],
    ).coalesce(1).write.mode("append").parquet(input_dir)
    out1 = _drain(spark, input_dir, out_dir, checkpoint)
    assert out1 == {
        ("2024-01-01 10:00:00", "a.io"): 2,
        ("2024-01-01 10:00:00", "b.io"): 1,
    }

    # batch 2: a LATE row for the already-closed 10:00 window (must be
    # dropped — the checkpointed watermark survives the restart) plus a
    # 10:41 row that closes the 10:20 window
    _rows(spark, [("a.io", "10:02"), ("a.io", "10:41")]).coalesce(1).write.mode(
        "append"
    ).parquet(input_dir)
    out2 = _drain(spark, input_dir, out_dir, checkpoint)
    # cumulative: the 10:00 windows are UNCHANGED (late row dropped, no
    # re-emission) and the 10:20 window closed with exactly its on-time doc
    assert out2 == {
        ("2024-01-01 10:00:00", "a.io"): 2,
        ("2024-01-01 10:00:00", "b.io"): 1,
        ("2024-01-01 10:20:00", "a.io"): 1,
    }


def test_windowed_counts_batch_mode(spark):
    """The same operator is usable as a plain batch aggregation."""
    df = _rows(spark, [("a.io", "10:01"), ("a.io", "10:11"), ("b.io", "10:01")])
    out = {
        (str(r["window_start"]), r["host"]): r["n_docs"]
        for r in windowed_host_counts(df).collect()
    }
    assert out == {
        ("2024-01-01 10:00:00", "a.io"): 1,
        ("2024-01-01 10:10:00", "a.io"): 1,
        ("2024-01-01 10:00:00", "b.io"): 1,
    }


def test_dedup_within_watermark(spark, tmp_path):
    """Built-in bounded-state streaming dedup: duplicate urls inside the
    watermark horizon are suppressed; each unique url is emitted once."""
    import os

    from py_image_toolkit_spark.streaming.windowed import dedup_within_watermark

    input_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    os.makedirs(input_dir)
    _rows(
        spark,
        [("a.io", "10:01"), ("a.io", "10:02"), ("b.io", "10:03"), ("a.io", "10:04")],
    ).withColumn("url", F.regexp_replace("url", r"/p/\d+", "/p/X")).coalesce(
        1
    ).write.mode("append").parquet(input_dir)

    stream = spark.readStream.schema(_SCHEMA).format("parquet").load(input_dir)
    q = (
        dedup_within_watermark(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    urls = sorted(r["url"] for r in spark.read.parquet(out_dir).collect())
    assert urls == ["https://a.io/p/X", "https://b.io/p/X"]
