"""M5 resume semantics (SURVEY.md §5.2.4): a killed/partial run + a resume
run converge to exactly the uninterrupted run's table; crashed (uncommitted)
data is invisible; each url lands exactly once per rule."""

import os

from pyspark.sql import functions as F

from py_image_toolkit_spark.config import ExtractConfig
from py_image_toolkit_spark.fixtures import pages_df
from py_image_toolkit_spark.plans.job import run_extraction_job
from py_image_toolkit_spark.sources.tables import SnapshotTable

CFG = ExtractConfig()


def _tables(tmp_path, name):
    return (
        SnapshotTable(str(tmp_path / f"{name}_out")),
        SnapshotTable(str(tmp_path / f"{name}_runs")),
    )


def test_kill_and_resume_converges(spark, tmp_path):
    pages = pages_df(spark, 60)

    # uninterrupted reference run
    full_out, full_runs = _tables(tmp_path, "full")
    s = run_extraction_job(spark, pages, full_out, full_runs, CFG, run_id="full")
    assert s["rows_out"] == 120

    # "killed" run: only a third of the input got processed+committed
    part_out, part_runs = _tables(tmp_path, "part")
    partial = pages.filter(F.xxhash64("url") % 3 == 0)
    s1 = run_extraction_job(spark, partial, part_out, part_runs, CFG, run_id="r1")
    assert 0 < s1["rows_out"] < 120

    # resume over the FULL input: anti-join skips committed urls
    s2 = run_extraction_job(spark, pages, part_out, part_runs, CFG, run_id="r2")
    assert s1["rows_out"] + s2["rows_out"] == 120

    a = full_out.read(spark)
    b = part_out.read(spark)
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0

    # exactly once per (url, rule)
    dupes = b.groupBy("url", "rule").count().filter("count > 1").count()
    assert dupes == 0

    # third run: nothing left to do, no new snapshot
    s3 = run_extraction_job(spark, pages, part_out, part_runs, CFG, run_id="r3")
    assert s3["rows_out"] == 0 and s3["snapshot_id"] is None
    assert part_out.snapshot_ids() == [1, 2]


def test_orphan_commit_dir_is_invisible(spark, tmp_path):
    out, runs = _tables(tmp_path, "orphan")
    pages = pages_df(spark, 20)
    run_extraction_job(spark, pages, out, runs, CFG, run_id="r1")
    n = out.read(spark).count()

    # simulate a crash: data directory written but no manifest rename
    orphan = os.path.join(out.data_dir, "commit-deadbeef")
    pages_df(spark, 5).write.parquet(orphan)
    assert out.read(spark).count() == n  # unchanged


def test_lineage_rows_cover_all_docs(spark, tmp_path):
    out, runs = _tables(tmp_path, "lineage")
    run_extraction_job(spark, pages_df(spark, 30), out, runs, CFG, run_id="r1")
    lin = runs.read(spark)
    agg = lin.agg(
        F.sum("rows_out").alias("rows"),
        F.sum("rows_ok").alias("ok"),
        F.sum("rows_failed").alias("failed"),
    ).collect()[0]
    assert agg["rows"] == 60 and agg["ok"] + agg["failed"] == 60
    assert {"partition_id", "run_id", "snapshot_id", "wall_us", "job_wall_ms"} <= set(
        lin.columns
    )
    # per-partition elapsed is MEASURED (round-3 verdict #7), not a job-level
    # literal: every value positive, and values differ across partitions
    # (µs resolution makes collisions vanishingly unlikely)
    walls = [r["wall_us"] for r in lin.select("wall_us").collect()]
    assert min(walls) > 0
    assert len(walls) == 1 or len(set(walls)) >= 2


def test_snapshot_diff_incremental_read(spark, tmp_path):
    out, runs = _tables(tmp_path, "diff")
    pages = pages_df(spark, 40)
    run_extraction_job(
        spark, pages.filter(F.xxhash64("url") % 2 == 0), out, runs, CFG, run_id="r1"
    )
    run_extraction_job(spark, pages, out, runs, CFG, run_id="r2")
    delta = out.diff(spark, 1, 2)
    assert delta.count() == out.read(spark).count() - out.read(spark, snapshot_id=1).count()


def test_manifest_stats_prune_commits(spark, tmp_path):
    """Iceberg-style commit pruning: read(where=...) skips whole commit
    directories whose recorded [min,max] cannot intersect the predicate."""
    from py_image_toolkit_spark.sources.tables import SnapshotTable

    tbl = SnapshotTable(str(tmp_path / "pruned"))
    for lo in (0, 100, 200):
        df = spark.range(lo, lo + 100).withColumnRenamed("id", "v")
        tbl.append(df, run_id=f"r{lo}", stats_cols=("v",))

    full = tbl.read(spark)
    assert full.count() == 300

    pruned = tbl.read(spark, where={"v": (150, 160)})
    assert pruned.count() == 100  # only the [100,199] commit survives
    # the pruned plan lists exactly one commit directory
    files = pruned.inputFiles()
    assert len({f.split("/commit-")[1].split("/")[0] for f in files}) == 1

    # no-stats commits are conservatively kept
    tbl.append(spark.range(900, 910).withColumnRenamed("id", "v"), run_id="nostats")
    kept = tbl.read(spark, where={"v": (150, 160)})
    assert kept.count() == 110  # matching commit + the stats-less one

    # fully disjoint predicate over only-stats commits -> None when nothing survives
    none_df = SnapshotTable(str(tmp_path / "p2"))
    none_df.append(spark.range(5).withColumnRenamed("id", "v"), stats_cols=("v",))
    assert none_df.read(spark, where={"v": (100, 200)}) is None


def test_manifest_stats_timestamp_bounds(spark, tmp_path):
    """Timestamp stats are stored as ISO strings in the manifest; read()
    normalizes datetime where-bounds the same way, so pruning on a
    timestamp column works with native datetime bounds (round-2 advice).
    Stats come from parquet footers (metadata-only) — TIMESTAMP_MICROS
    output keeps footer min/max available (INT96 would not)."""
    from datetime import datetime

    from py_image_toolkit_spark.sources.tables import SnapshotTable

    tbl = SnapshotTable(str(tmp_path / "ts_pruned"))
    for day in (1, 10, 20):
        df = spark.sql(
            f"SELECT TIMESTAMP'2024-03-{day:02d} 12:00:00' AS ts, {day} AS v"
        )
        tbl.append(df, run_id=f"d{day}", stats_cols=("ts",))

    snap = tbl.latest_snapshot()
    recorded = [s["ts"] for s in snap["commit_stats"].values()]
    assert all(isinstance(b, str) for lo_hi in recorded for b in lo_hi)

    got = tbl.read(
        spark,
        where={"ts": (datetime(2024, 3, 5), datetime(2024, 3, 15))},
    )
    rows = got.collect()
    assert [r["v"] for r in rows] == [10]  # only the mid-month commit survives


def test_manifest_stats_timestamp_boundary_equality(spark, tmp_path):
    """Round-3 ADVICE (medium): pyarrow footer stats for TIMESTAMP_MICROS
    are tz-aware, so before normalization the stored string carried a
    '+00:00' suffix while a naive where-bound did not — lexicographically
    hi < stat_min for EQUAL instants, silently pruning a commit whose min
    equals the upper bound. Pruning must be conservative: a bound exactly
    equal to a commit's min (or max) keeps the commit."""
    from datetime import datetime, timezone

    from py_image_toolkit_spark.sources.tables import SnapshotTable

    tbl = SnapshotTable(str(tmp_path / "ts_boundary"))
    df = spark.sql("SELECT TIMESTAMP'2024-03-15 00:00:00' AS ts, 1 AS v")
    tbl.append(df, run_id="d15", stats_cols=("ts",))

    # stored stats must render WITHOUT a utc offset suffix
    snap = tbl.latest_snapshot()
    (lo_hi,) = [s["ts"] for s in snap["commit_stats"].values()]
    assert lo_hi == ["2024-03-15 00:00:00", "2024-03-15 00:00:00"]

    # upper bound == commit min: the commit must survive pruning
    hit_hi = tbl.read(spark, where={"ts": (datetime(2024, 3, 1), datetime(2024, 3, 15))})
    assert hit_hi is not None and hit_hi.count() == 1
    # lower bound == commit max: likewise
    hit_lo = tbl.read(spark, where={"ts": (datetime(2024, 3, 15), datetime(2024, 3, 20))})
    assert hit_lo is not None and hit_lo.count() == 1
    # tz-aware where-bounds normalize to the same naive-UTC rendering
    aware = (
        datetime(2024, 3, 1, tzinfo=timezone.utc),
        datetime(2024, 3, 15, tzinfo=timezone.utc),
    )
    hit_aware = tbl.read(spark, where={"ts": aware})
    assert hit_aware is not None and hit_aware.count() == 1
    # and a genuinely disjoint bound still prunes
    assert tbl.read(spark, where={"ts": (datetime(2024, 3, 16), datetime(2024, 3, 20))}) is None


def test_concurrent_appends_no_lost_update(spark, tmp_path):
    """Round-2 made commits race-safe (tmp-write + O_EXCL hard-link publish
    + id-collision retry); prove it: N writers appending concurrently to the
    same table must ALL become visible — no lost update, snapshot ids form a
    contiguous lineage (round-2 verdict task #9). Threads suffice: the race
    window is the manifest read→link sequence, which is pure file I/O that
    releases the GIL."""
    from concurrent.futures import ThreadPoolExecutor

    from py_image_toolkit_spark.sources.tables import SnapshotTable

    tbl = SnapshotTable(str(tmp_path / "concurrent"))
    n_writers = 6

    def write_one(k: int) -> int:
        df = spark.range(k * 100, k * 100 + 10).withColumnRenamed("id", "v")
        return tbl.append(df, run_id=f"w{k}")

    with ThreadPoolExecutor(max_workers=n_writers) as ex:
        ids = list(ex.map(write_one, range(n_writers)))

    # every writer got a DISTINCT snapshot id, contiguous from 1
    assert sorted(ids) == list(range(1, n_writers + 1))
    # the final lineage lists every commit → all rows visible, none lost
    snap = tbl.latest_snapshot()
    assert snap["snapshot_id"] == n_writers
    assert len(snap["data_dirs"]) == n_writers
    rows = {r["v"] for r in tbl.read(spark).collect()}
    assert rows == {k * 100 + j for k in range(n_writers) for j in range(10)}


def test_compact_rewrites_lineage_preserves_rows_and_time_travel(spark, tmp_path):
    """compact(): many small commits → one replacing commit; rows identical,
    old snapshots still readable (time travel), file listing shrinks, and a
    concurrent append during the rewrite aborts instead of losing rows."""
    from py_image_toolkit_spark.sources.tables import SnapshotTable

    tbl = SnapshotTable(str(tmp_path / "compact"))
    for lo in (0, 10, 20, 30):
        tbl.append(spark.range(lo, lo + 10).withColumnRenamed("id", "v"))
    assert len(tbl.latest_snapshot()["data_dirs"]) == 4
    before = sorted(r["v"] for r in tbl.read(spark).collect())

    sid = tbl.compact(spark, target_partitions=1)
    snap = tbl.latest_snapshot()
    assert snap["snapshot_id"] == sid and len(snap["data_dirs"]) == 1
    assert sorted(r["v"] for r in tbl.read(spark).collect()) == before
    # time travel to a pre-compaction snapshot still works
    assert tbl.read(spark, snapshot_id=2).count() == 20
    # appends continue on top of the compacted lineage
    tbl.append(spark.range(100, 105).withColumnRenamed("id", "v"))
    assert tbl.read(spark).count() == 45

    # base-snapshot validation: a publish between read and commit aborts
    import pytest as _pytest

    base = tbl.latest_snapshot()["snapshot_id"]
    df = tbl.read(spark)
    tbl.append(spark.range(200, 202).withColumnRenamed("id", "v"))  # racer
    with _pytest.raises(RuntimeError, match="concurrent append during replace"):
        tbl.append(df, replace=True, require_base_snapshot=base)


def test_expire_snapshots_gc(spark, tmp_path):
    """expire_snapshots(): old manifests go, directories referenced only by
    them are deleted, the surviving snapshot is untouched."""
    import os as _os

    from py_image_toolkit_spark.sources.tables import SnapshotTable

    tbl = SnapshotTable(str(tmp_path / "expire"))
    for lo in (0, 10, 20):
        tbl.append(spark.range(lo, lo + 10).withColumnRenamed("id", "v"))
    tbl.compact(spark, target_partitions=1)

    deleted = tbl.expire_snapshots(keep_latest=1)
    # the three pre-compaction directories are unreferenced by the survivor
    assert len(deleted) == 3
    assert tbl.snapshot_ids() == [4]
    assert tbl.read(spark).count() == 30
    # expired time travel is really gone
    assert tbl.read(spark, snapshot_id=2) is None
    live_dirs = set(tbl.latest_snapshot()["data_dirs"])
    on_disk = set(_os.listdir(tbl.data_dir))
    assert on_disk == live_dirs


def test_schema_evolution_merge_and_compact(spark, tmp_path):
    """Additive schema evolution: a later commit adds a column; plain reads
    keep the base schema semantics, merge_schema=True surfaces the new
    column (NULL for pre-evolution rows), and compaction bakes the merged
    schema in for free afterward."""
    from py_image_toolkit_spark.sources.tables import SnapshotTable

    tbl = SnapshotTable(str(tmp_path / "evolve"))
    tbl.append(spark.range(0, 5).withColumnRenamed("id", "v"))
    tbl.append(
        spark.range(5, 8).withColumnRenamed("id", "v").withColumn("extra", F.lit("x"))
    )

    # a PLAIN read over a heterogeneous lineage must fail loudly (Spark
    # would otherwise sample one file's schema and silently drop columns)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="different column sets"):
        tbl.read(spark)

    merged = tbl.read(spark, merge_schema=True)
    assert set(merged.columns) == {"v", "extra"}
    got = {r["v"]: r["extra"] for r in merged.collect()}
    assert got[0] is None and got[5] == "x" and len(got) == 8

    # compaction consolidates the merged schema → PLAIN reads see it now
    tbl.compact(spark, target_partitions=1)
    plain = tbl.read(spark)
    assert set(plain.columns) == {"v", "extra"}
    after = {r["v"]: r["extra"] for r in plain.collect()}
    assert after == got
