"""Multimodal plumbing (schema/batch shapes real, decode stubbed) and the
AvailableNow incremental-streaming wrapper."""

import pytest

from pyspark.sql import functions as F

from py_image_toolkit_spark.operators.multimodal import (
    decode_features,
    frame_sample_plan,
    probe_media,
    resize_plan,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, "image/png", b"\x89PNG\r\n" + bytes(range(64)), (640, 480, None, None)),
        (2, "image/jpeg", b"\xff\xd8\xff\xe0" + bytes(64), (1920, 1080, None, None)),
        (3, "audio/wav", b"RIFF" + bytes(32), (None, None, None, 44100)),
        (4, "video/webm", b"\x1a\x45\xdf\xa3" + bytes(128), (1280, 720, 100, None)),
        (5, "unknown", b"\x00\x01", (None, None, None, None)),
        (6, "empty", b"", (None, None, None, None)),
    ]
    return spark.createDataFrame(
        [(i, k, p, m) for i, k, p, m in rows],
        "media_id bigint, kind string, payload binary, "
        "meta struct<width:int, height:int, n_frames:int, sample_rate:int>",
    )


def test_probe_media_magic_sniff(media):
    got = {r["media_id"]: r["probed_kind"] for r in probe_media(media).collect()}
    assert got[1] == "image/png" and got[2] == "image/jpeg"
    assert got[3] == "audio/wav" and got[4] == "video/webm"
    assert got[5] == "application/octet-stream"


def test_decode_features_fake_deterministic(media):
    a = {r["media_id"]: r["features"] for r in decode_features(media, fake=True).collect()}
    b = {r["media_id"]: r["features"] for r in decode_features(media, fake=True).collect()}
    assert a == b                          # deterministic
    assert len(a[1]) == 8                  # batch shape: fixed dim
    empty = {r["media_id"]: r["status"] for r in decode_features(media).collect()}
    assert empty[6] == "empty payload"     # error containment, no task death


def test_decode_features_real_is_stubbed(media):
    with pytest.raises(Exception, match="NotImplementedError|media decode"):
        decode_features(media, fake=False).collect()


def test_resize_plan_truncation(media):
    got = {
        r["media_id"]: (r["out_w"], r["out_h"])
        for r in resize_plan(media.filter("meta.width is not null"), 1280, 720).collect()
    }
    assert got[1] == (960, 720)            # 640×480 → fit 1280×720 (H1 verified math)
    assert got[2] == (1280, 720)
    assert got[4] == (1280, 720)


def test_frame_sample_plan(media):
    got = {r["media_id"]: r["frame_indices"] for r in frame_sample_plan(media).collect()}
    assert got[4] == [0, 12, 24, 36, 48, 60, 72, 84]  # 100 frames, stride 12
    assert got[1] == []


def test_available_now_streaming(spark, tmp_path):
    from py_image_toolkit_spark.config import ExtractConfig
    from py_image_toolkit_spark.fixtures import pages_df
    from py_image_toolkit_spark.sources.tables import SnapshotTable
    from py_image_toolkit_spark.streaming import run_available_now

    inp = str(tmp_path / "incoming")
    pages_df(spark, 20).write.parquet(inp)
    out = SnapshotTable(str(tmp_path / "out"))
    runs = SnapshotTable(str(tmp_path / "runs"))

    run_available_now(spark, inp, out, runs, str(tmp_path / "ckpt"),
                      ExtractConfig(), max_files_per_trigger=4)
    assert out.read(spark).count() == 40  # 20 urls × 2 rules, exactly once

    # drain again with new files landing: only the new urls are processed
    pages_df(spark, 30).filter(F.xxhash64("url") % 3 == 0).write.mode("append").parquet(inp)
    run_available_now(spark, inp, out, runs, str(tmp_path / "ckpt"),
                      ExtractConfig(), max_files_per_trigger=4)
    dupes = out.read(spark).groupBy("url", "rule").count().filter("count > 1").count()
    assert dupes == 0


def test_streaming_exact_dedup_across_batches(spark, tmp_path):
    """Custom stateful operator (applyInPandasWithState): each distinct text
    is emitted exactly once even when its duplicates arrive in LATER
    micro-batches — per-batch dropDuplicates cannot do this."""
    import os

    from py_image_toolkit_spark.streaming.stateful import streaming_exact_dedup

    src = str(tmp_path / "src")
    os.makedirs(src)
    # batch 1: docs 1-3 (3 distinct texts, one in-batch dup)
    # coalesce(1): one FILE per batch dir — with maxFilesPerTrigger=1 each
    # file IS a micro-batch, so multi-file writes would split a batch's rows
    # nondeterministically across triggers (first-seen winner would then be
    # trigger-order-dependent, which is correct behavior but untestable)
    spark.createDataFrame(
        [(1, "alpha text"), (2, "beta text"), (3, "alpha text")],
        "doc_id long, text string",
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(src, "b1"))
    # batch 2: doc 4 duplicates batch-1 text; doc 5 is new
    spark.createDataFrame(
        [(4, "beta text"), (5, "gamma text")],
        "doc_id long, text string",
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(src, "b2"))

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/*")
    )
    out = []

    def sink(batch_df, batch_id):
        out.extend(batch_df.collect())

    (
        streaming_exact_dedup(stream)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    got = {r["text"]: (r["doc_id"], r["n_dropped"]) for r in out}
    assert set(got) == {"alpha text", "beta text", "gamma text"}
    assert got["alpha text"][0] == 1  # lowest doc_id wins within the batch
    # each text emitted exactly once across ALL batches
    assert len(out) == 3


def test_resize_plan_mode_dispatch(media):
    """Reference resize.py:106-120 mode dispatch on the metadata planner."""
    fixed = {r["media_id"]: (r["out_w"], r["out_h"])
             for r in resize_plan(media, 320, 240, mode="fixed").collect()}
    assert fixed[1] == (320, 240) and fixed[2] == (320, 240)
    none = {r["media_id"]: (r["out_w"], r["out_h"])
            for r in resize_plan(media, 320, 240, mode="none").collect()}
    assert none[1] == (640, 480) and none[4] == (1280, 720)
    aspect = {r["media_id"]: (r["out_w"], r["out_h"])
              for r in resize_plan(media, 320, 240).collect()}
    assert aspect[1] == (320, 240)       # 4:3 → exact fit
    assert aspect[2] == (320, 180)       # 16:9 fit inside 320x240
