"""Snapshot-versioned table: Iceberg-semantics commits over plain parquet
(SURVEY.md §7.3).

The north rule mandates Iceberg tables; this sandbox has no Iceberg runtime
jar, so the same API is provided over a manifest-committed parquet layout:

    {root}/data/commit-<uuid>/part-*.parquet      (written, then committed)
    {root}/_snapshots/manifest-<n>.json           (atomic rename = commit)

Readers resolve the highest manifest and read exactly the data directories
it lists — a crashed job's orphan directory is invisible (≙ the reference's
partial-output cleanup, resize.py:134-140, but free by construction: A9).
Appends are atomic: data lands first, the manifest rename publishes it.

On a real cluster with iceberg-spark-runtime on the classpath, swap
``SnapshotTable`` for ``df.writeTo(table).append()`` — the pipeline code
only touches this API.
"""

from __future__ import annotations

import json
import os
import re
import time
import uuid
from datetime import timezone

from pyspark.sql import DataFrame, SparkSession

_MANIFEST_RE = re.compile(r"manifest-(\d+)\.json$")


def write_bucketed(
    df: DataFrame,
    table_name: str,
    path: str,
    key: str,
    n_buckets: int,
    sort: bool = True,
) -> None:
    """Bucketed co-located table (J5): pay the shuffle ONCE at write time —
    every later equi-join or aggregation on ``key`` between tables bucketed
    with the same count is then exchange-free (Spark reads bucket i of both
    sides into the same task). The big-join staging pattern at 100 TB:
    bucket the corpus by url/doc_id when it lands, and the dedup/verify/
    enrich joins that follow never reshuffle the text again
    (tests/test_plan_contracts.py asserts the exchange-free plan)."""
    w = df.write.bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    w.option("path", path).mode("overwrite").format("parquet").saveAsTable(table_name)


def _json_safe(v):
    """Manifest stats must round-trip through JSON (timestamps → ISO with a
    space separator — lexicographic order == chronological order, so pruning
    comparisons on the stored strings stay correct).

    tz-aware datetimes are normalized to naive UTC first: pyarrow footer
    stats for TIMESTAMP columns come back tz-aware ('… 00:00:00+00:00')
    while a naive where-bound renders without the offset — lexicographic
    compare would then treat EQUAL instants as hi < stat_min and prune a
    commit whose min equals the upper bound (round-3 ADVICE, confirmed
    empirically). Applied to both footer stats and where-bounds, so both
    sides of every pruning comparison share one canonical rendering."""
    if getattr(v, "tzinfo", None) is not None:
        v = v.astimezone(timezone.utc).replace(tzinfo=None)
    if hasattr(v, "isoformat"):
        return v.isoformat(sep=" ")
    return v


def _footer_stats(commit_dir: str, stats_cols: tuple[str, ...]) -> dict[str, list]:
    """Per-column [min, max] from parquet row-group footer statistics —
    metadata-only (never scans column data). A column missing min/max in any
    row group is recorded as [None, None] (pruning keeps it)."""
    import pyarrow.parquet as pq

    mins: dict[str, object] = {}
    maxs: dict[str, object] = {}
    known = set(stats_cols)
    for fname in sorted(os.listdir(commit_dir)):
        if not fname.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(commit_dir, fname)).metadata
        idx = {md.schema.column(i).path: i for i in range(md.num_columns)}
        for c in stats_cols:
            if c not in known:
                continue
            i = idx.get(c)
            if i is None:
                known.discard(c)
                continue
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(i).statistics
                if st is None or not st.has_min_max:
                    known.discard(c)
                    break
                if c not in mins or st.min < mins[c]:
                    mins[c] = st.min
                if c not in maxs or st.max > maxs[c]:
                    maxs[c] = st.max
    return {
        c: (
            [_json_safe(mins[c]), _json_safe(maxs[c])]
            if c in known and c in mins
            else [None, None]
        )
        for c in stats_cols
    }


class SnapshotTable:
    def __init__(self, root: str):
        self.root = root
        self.data_dir = os.path.join(root, "data")
        self.snap_dir = os.path.join(root, "_snapshots")
        os.makedirs(self.data_dir, exist_ok=True)
        os.makedirs(self.snap_dir, exist_ok=True)

    # -- manifest plumbing --------------------------------------------------

    def _manifests(self) -> list[tuple[int, str]]:
        out = []
        for f in os.listdir(self.snap_dir):
            m = _MANIFEST_RE.match(f)
            if m:
                out.append((int(m.group(1)), os.path.join(self.snap_dir, f)))
        return sorted(out)

    def latest_snapshot(self) -> dict | None:
        ms = self._manifests()
        if not ms:
            return None
        with open(ms[-1][1]) as fh:
            return json.load(fh)

    def snapshot_ids(self) -> list[int]:
        return [n for n, _ in self._manifests()]

    # -- write path ----------------------------------------------------------

    def append(
        self,
        df: DataFrame,
        run_id: str | None = None,
        meta: dict | None = None,
        encode: "EncodeOptions | None" = None,
        stats_cols: tuple[str, ...] = (),
        replace: bool = False,
        require_base_snapshot: int | None = None,
    ) -> int:
        """Write df to a fresh commit directory, then publish it with an
        optimistic-concurrency manifest commit. Returns the new snapshot id.

        Concurrency (Iceberg-style optimistic commit): the manifest file is
        created with O_EXCL — if another writer committed the same snapshot
        id first, the create fails, the data_dirs lineage is re-read and the
        commit retries with the next id. Without this, two concurrent appends
        could both read the same latest manifest and the second rename would
        silently drop the first commit's data directory from the lineage.

        ``encode`` routes through the E4 per-format options dispatch
        (operators/encode.py ≙ reference optimize.py:39-53).

        ``stats_cols``: record per-commit min/max for these columns in the
        manifest (Iceberg-style data-file stats). ``read(where=...)`` uses
        them to skip whole commit directories — at 10^12 docs this is the
        difference between scanning one day's append and the whole table.
        The stats come from the just-written parquet FOOTERS (pyarrow
        row-group statistics — metadata-only, no column-data scan); a column
        whose footer stats are absent is recorded as unknown and ``read``
        keeps its commits conservatively. Parquet may store truncated bounds
        for long binary values — still valid (loose) bounds, so pruning
        stays conservative."""
        from py_image_toolkit_spark.operators.encode import encoded_writer

        token = uuid.uuid4().hex[:12]
        commit_dir = os.path.join(self.data_dir, f"commit-{token}")
        encoded_writer(df, "parquet", encode).mode("errorifexists").save(commit_dir)

        stats: dict[str, list] = {}
        if stats_cols:
            stats = _footer_stats(commit_dir, stats_cols)

        while True:
            prev = self.latest_snapshot()
            snapshot_id = (prev["snapshot_id"] + 1) if prev else 1
            if require_base_snapshot is not None and (
                prev is None or prev["snapshot_id"] != require_base_snapshot
            ):
                # Iceberg-style validation: a replacing commit built from
                # snapshot N must abort if anyone has published past N —
                # silently replacing would drop their rows from the lineage
                raise RuntimeError(
                    "concurrent append during replace: base snapshot "
                    f"{require_base_snapshot} is no longer latest"
                )
            if replace:
                # replacing commit (compaction): the new lineage is exactly
                # this commit; prior directories stay on disk for time travel
                dirs = [f"commit-{token}"]
                commit_stats = {}
                commit_schemas = {}
            else:
                dirs = (prev["data_dirs"] if prev else []) + [f"commit-{token}"]
                commit_stats = dict(prev.get("commit_stats", {})) if prev else {}
                commit_schemas = dict(prev.get("commit_schemas", {})) if prev else {}
            if stats:
                commit_stats[f"commit-{token}"] = stats
            # per-commit column sets (manifest-only): lets read() detect a
            # heterogeneous lineage without touching any file footer
            commit_schemas[f"commit-{token}"] = list(df.schema.names)
            manifest = {
                "snapshot_id": snapshot_id,
                "data_dirs": dirs,
                "run_id": run_id,
                "committed_at": time.time(),
                "schema": df.schema.jsonValue(),
                "meta": meta or {},
                "commit_stats": commit_stats,
                "commit_schemas": commit_schemas,
            }
            target = os.path.join(self.snap_dir, f"manifest-{snapshot_id}.json")
            # tmp-write + hard-link publish: link(2) is atomic for readers
            # (no partially-written manifest is ever visible) AND fails with
            # EEXIST if a concurrent writer already claimed this id
            tmp = os.path.join(
                self.snap_dir, f".manifest-{snapshot_id}.json.{token}.tmp"
            )
            with open(tmp, "w") as fh:
                json.dump(manifest, fh)
            try:
                os.link(tmp, target)
            except FileExistsError:
                os.unlink(tmp)
                continue  # lost the race: re-read lineage, try the next id
            os.unlink(tmp)
            return snapshot_id

    # -- read path -----------------------------------------------------------

    def read(
        self,
        spark: SparkSession,
        snapshot_id: int | None = None,
        where: dict | None = None,
        merge_schema: bool = False,
    ) -> DataFrame | None:
        """DataFrame over exactly the committed files (None if no snapshot
        exists yet). ``snapshot_id`` time-travels to an older snapshot.

        ``merge_schema=True`` unions the schemas of all live commits
        (Iceberg-style additive evolution: a commit may add columns; older
        rows read NULL for them). Off by default — schema merging reads
        every file's footer up front, a real cost at 10^12-doc commit
        counts; compaction rewrites the table under the merged schema, after
        which plain reads see it for free.

        ``where={col: (lo, hi)}`` prunes whole commit directories whose
        recorded [min, max] for ``col`` does not intersect [lo, hi]
        (Iceberg-style manifest pruning; commits without stats for ``col``
        are conservatively kept). The residual row-level filter is still the
        caller's job — this only shrinks the file listing."""
        if snapshot_id is None:
            snap = self.latest_snapshot()
        else:
            path = os.path.join(self.snap_dir, f"manifest-{snapshot_id}.json")
            snap = json.load(open(path)) if os.path.exists(path) else None
        if snap is None or not snap["data_dirs"]:
            return None
        dirs = snap["data_dirs"]
        if where:
            cstats = snap.get("commit_stats", {})
            # normalize bounds the same way stats were stored (timestamps →
            # ISO strings), so datetime bounds compare against string stats
            # correctly instead of raising/mispruning
            norm = {c: (_json_safe(lo), _json_safe(hi)) for c, (lo, hi) in where.items()}
            dirs = [
                d for d in dirs
                if all(
                    d not in cstats
                    or c not in cstats[d]
                    or cstats[d][c][0] is None
                    or not (hi < cstats[d][c][0] or lo > cstats[d][c][1])
                    for c, (lo, hi) in norm.items()
                )
            ]
        if not dirs:
            return None
        if not merge_schema:
            # Guard against silent column loss: without mergeSchema, Spark
            # samples ONE file's schema for the whole scan, so a lineage
            # whose commits disagree on columns (e.g. an append after an
            # additive schema change) would silently drop or null columns
            # depending on which file wins. Detect it manifest-only (no
            # footer reads) and fail with the remedy. Tables written before
            # commit_schemas existed have no per-commit record — those read
            # as before.
            cs = snap.get("commit_schemas", {})
            col_sets = {tuple(cs[d]) for d in dirs if d in cs}
            if len(col_sets) > 1:
                raise ValueError(
                    f"SnapshotTable at {self.root}: live commits carry "
                    f"{len(col_sets)} different column sets "
                    f"{sorted(col_sets)}; pass merge_schema=True, or "
                    "compact() the table to consolidate the union schema"
                )
        paths = [os.path.join(self.data_dir, d) for d in dirs]
        reader = spark.read
        if merge_schema:
            reader = reader.option("mergeSchema", "true")
        return reader.parquet(*paths)

    def compact(
        self,
        spark: SparkSession,
        target_partitions: int | None = None,
        stats_cols: tuple[str, ...] = (),
    ) -> int | None:
        """Rewrite ALL live data directories into one fresh commit and
        publish a manifest whose lineage is exactly that commit — the
        small-files maintenance op (at 10^12 docs, thousands of incremental
        appends otherwise degrade every scan's split planning and footer
        reads; ≙ Iceberg's rewrite_data_files).

        Time travel is preserved: old manifests still list the old
        directories, which are NOT deleted here (garbage collection of
        unreferenced directories is a separate, explicitly-destructive
        step — see ``expire_snapshots``). Readers are never disturbed: data
        lands first, the O_EXCL manifest link publishes atomically. A
        concurrent append racing the rewrite makes the compaction ABORT
        (Iceberg-style base-snapshot validation) rather than silently drop
        the appended rows from the replacing lineage — retry when quiet.
        Returns the new snapshot id (None for an empty table)."""
        base = self.latest_snapshot()
        if base is None or not base["data_dirs"]:
            return None
        # merge_schema: the rewrite consolidates any additive schema
        # evolution — afterwards plain reads see the union schema for free
        df = self.read(spark, snapshot_id=base["snapshot_id"], merge_schema=True)
        if target_partitions:
            df = df.repartition(target_partitions)
        return self.append(
            df,
            run_id="compact",
            stats_cols=stats_cols,
            meta={"compacted": True, "base_snapshot": base["snapshot_id"]},
            replace=True,
            require_base_snapshot=base["snapshot_id"],
        )

    def expire_snapshots(self, keep_latest: int = 1) -> list[str]:
        """Drop manifests older than the ``keep_latest`` most recent and
        delete data directories no surviving manifest references. The
        explicitly-destructive half of compaction — time travel to expired
        snapshots is gone afterward. Returns the deleted directory names."""
        ms = self._manifests()
        if len(ms) <= keep_latest:
            return []
        keep, drop = ms[-keep_latest:], ms[:-keep_latest]
        live: set[str] = set()
        for _, path in keep:
            with open(path) as fh:
                live.update(json.load(fh)["data_dirs"])
        doomed: set[str] = set()
        for _, path in drop:
            with open(path) as fh:
                doomed.update(json.load(fh)["data_dirs"])
            os.unlink(path)
        deleted = []
        for d in sorted(doomed - live):
            full = os.path.join(self.data_dir, d)
            if os.path.isdir(full):
                for f in os.listdir(full):
                    os.unlink(os.path.join(full, f))
                os.rmdir(full)
                deleted.append(d)
        return deleted

    def diff(self, spark: SparkSession, from_snapshot: int, to_snapshot: int) -> DataFrame | None:
        """Rows appended between two snapshots (incremental-read primitive)."""
        a = json.load(open(os.path.join(self.snap_dir, f"manifest-{from_snapshot}.json")))
        b = json.load(open(os.path.join(self.snap_dir, f"manifest-{to_snapshot}.json")))
        new_dirs = [d for d in b["data_dirs"] if d not in set(a["data_dirs"])]
        if not new_dirs:
            return None
        return spark.read.parquet(*[os.path.join(self.data_dir, d) for d in new_dirs])
