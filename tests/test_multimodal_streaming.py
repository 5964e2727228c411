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
