"""E4 encode-options dispatch (reference optimize.py:39-53 analog) and the
snapshot sink's optimistic manifest commit."""

import json
import os

import pytest

from py_image_toolkit_spark.operators.encode import (
    EncodeOptions,
    encoded_writer,
    session_codec_conf,
    writer_options,
)
from py_image_toolkit_spark.sources.tables import SnapshotTable


def test_dispatch_table_per_format():
    o = EncodeOptions()
    assert writer_options("parquet", o)["compression"] == "zstd"
    assert writer_options("parquet", o)["parquet.enable.dictionary"] == "true"
    assert writer_options("parquet", EncodeOptions(optimize=False))[
        "parquet.enable.dictionary"
    ] == "false"
    assert writer_options("orc", o)["compression"] == "zstd"
    assert writer_options("orc", EncodeOptions(quality=10, lossless=False))[
        "compression"
    ] == "snappy"
    assert writer_options("json", EncodeOptions(optimize=False))["compression"] == "none"
    assert writer_options("csv", o)["compression"] == "gzip"
    # unknown format falls through to engine defaults (reference behavior)
    assert writer_options("avro", o) == {}


def test_quality_maps_to_zstd_level():
    lo = session_codec_conf(EncodeOptions(quality=10, optimize=False))
    hi = session_codec_conf(EncodeOptions(quality=95, optimize=False))
    assert int(lo["spark.io.compression.zstd.level"]) < int(
        hi["spark.io.compression.zstd.level"]
    )


def test_written_parquet_codec_is_zstd(spark, tmp_path):
    """Assert the codec actually lands in the file footer, not just the conf."""
    import pyarrow.parquet as pq

    df = spark.range(1000).withColumnRenamed("id", "v")
    out = str(tmp_path / "enc")
    encoded_writer(df, "parquet", EncodeOptions()).mode("overwrite").save(out)
    files = [f for f in os.listdir(out) if f.endswith(".parquet")]
    assert files
    meta = pq.ParquetFile(os.path.join(out, files[0])).metadata
    codecs = {
        meta.row_group(g).column(c).compression
        for g in range(meta.num_row_groups)
        for c in range(meta.row_group(g).num_columns)
    }
    assert codecs == {"ZSTD"}


def test_snapshot_append_uses_encode_dispatch(spark, tmp_path):
    import pyarrow.parquet as pq

    tbl = SnapshotTable(str(tmp_path / "snap"))
    tbl.append(spark.range(10).withColumnRenamed("id", "v"), run_id="r1")
    snap = tbl.latest_snapshot()
    d = os.path.join(tbl.data_dir, snap["data_dirs"][0])
    f = next(f for f in os.listdir(d) if f.endswith(".parquet"))
    meta = pq.ParquetFile(os.path.join(d, f)).metadata
    assert meta.row_group(0).column(0).compression == "ZSTD"


def test_manifest_commit_is_race_safe(spark, tmp_path):
    """If a concurrent writer claims the same snapshot id, append retries with
    the next id and no committed data directory is lost from the lineage."""
    tbl = SnapshotTable(str(tmp_path / "race"))
    tbl.append(spark.range(5).withColumnRenamed("id", "v"), run_id="r1")

    # simulate the racer: pre-claim manifest-2 with its own commit dir
    # (carrying snapshot 1's lineage forward, as a real writer would)
    os.makedirs(os.path.join(tbl.data_dir, "commit-racer"), exist_ok=True)
    racer = {
        "snapshot_id": 2,
        "data_dirs": tbl.latest_snapshot()["data_dirs"] + ["commit-racer"],
        "run_id": "racer",
        "committed_at": 0,
        "schema": {},
        "meta": {},
    }
    with open(os.path.join(tbl.snap_dir, "manifest-2.json"), "w") as fh:
        json.dump(racer, fh)

    sid = tbl.append(spark.range(5).withColumnRenamed("id", "v"), run_id="r2")
    assert sid == 3
    lineage = tbl.latest_snapshot()["data_dirs"]
    assert "commit-racer" in lineage and len(lineage) == 3  # nothing lost:
    # snapshot-1's dir, the racer's dir, and r2's dir all survive
    # no orphan tmp files left behind
    assert not [f for f in os.listdir(tbl.snap_dir) if f.endswith(".tmp")]
