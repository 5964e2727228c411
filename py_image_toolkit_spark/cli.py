"""J8 deployment surface: the spark-submit job entrypoint.

Spark recast of the reference's runnable batch drivers (resizes.py:135-171,
crops.py:170-196): argparse CLI → frozen config → batch run → counter
summary + per-item error report. Deployment shape per the north rule:

    spark-submit --py-files pyimgtk_spark.zip job.py extract \\
        --input /data/pages --output /data/extractions \\
        --runs /data/runs --rules thirds golden --num-partitions 2048

Subcommands:
    extract   one resumable extraction run over a pages table
              (anti-join resume against the committed output snapshot,
               atomic snapshot commit, per-partition lineage rows)
    resume    alias of extract — resume IS the default behavior; named
              separately so intent shows up in job schedulers
    bench     timed extraction over a synthetic deterministic pages table
              (fixtures.pages_df) — prints one JSON line
    compact   rewrite all live commits of a snapshot table into one
              (small-files maintenance; --expire additionally GCs
               pre-compaction snapshots)

``--master`` is deliberately absent: in production spark-submit supplies the
cluster master; locally the SPARK_MASTER / SPARK_GRAFT_CPUS env defaults
apply (session.build_session).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _add_config_args(p: argparse.ArgumentParser) -> None:
    """ExtractConfig knobs (≙ the reference CLI's shared parser,
    resize.py get_parser / crop.py options)."""
    p.add_argument("--rules", nargs="+", default=["thirds", "golden"],
                   help="composition rules fan-out (default: thirds golden)")
    p.add_argument("--method", default="largest", choices=["largest", "center"])
    p.add_argument("--ref-point", default="box", choices=["box", "top"])
    p.add_argument("--ratio", default=None,
                   help='target aspect "W:H" | float | omitted = canvas ratio')
    p.add_argument("--padding-percent", type=float, default=0.0)
    p.add_argument("--min-score", type=float, default=0.6)
    p.add_argument("--wrap-width", type=int, default=80)
    p.add_argument("--impl", default="doc", choices=["doc", "fused", "columns"],
                   help="pipeline implementation (doc = zero-shuffle production)")
    p.add_argument("--num-partitions", type=int, default=None,
                   help="parse-stage parallelism (extract/resume default: "
                        "defaultParallelism; bench default: 2x; 0 keeps the "
                        "input partitioning)")


def _config_from(args: argparse.Namespace):
    from py_image_toolkit_spark.config import ExtractConfig

    return ExtractConfig(
        wrap_width=args.wrap_width,
        min_score=args.min_score,
        method=args.method,
        ref_point=args.ref_point,
        rules=tuple(args.rules),
        ratio=args.ratio,
        padding_percent=args.padding_percent,
        extract_impl=args.impl,
    )


def build_parser() -> argparse.ArgumentParser:
    top = argparse.ArgumentParser(
        prog="job.py", description="py-image-toolkit-spark batch driver"
    )
    sub = top.add_subparsers(dest="cmd", required=True)

    for name, desc in (
        ("extract", "one resumable extraction run over a pages table"),
        ("resume", "alias of extract (resume is the default behavior)"),
    ):
        p = sub.add_parser(name, help=desc)
        p.add_argument("--input", required=True, help="pages parquet path/table")
        p.add_argument("--output", required=True, help="output snapshot table root")
        p.add_argument("--runs", default=None,
                       help="runs/lineage snapshot table root (default: <output>_runs)")
        p.add_argument("--run-id", default=None)
        _add_config_args(p)

    b = sub.add_parser("bench", help="timed synthetic extraction, one JSON line")
    b.add_argument("--n-docs", type=int, default=20000)
    b.add_argument("--output", default=None, help="sink dir (default: temp)")
    _add_config_args(b)

    c = sub.add_parser(
        "compact",
        help="rewrite all live commits of a snapshot table into one "
             "(small-files maintenance; time travel preserved)",
    )
    c.add_argument("--table", required=True, help="snapshot table root")
    c.add_argument("--target-partitions", type=int, default=None)
    c.add_argument("--expire", action="store_true",
                   help="ALSO delete pre-compaction manifests and unreferenced "
                        "data dirs (destroys time travel to them)")
    return top


def cmd_extract(args: argparse.Namespace) -> int:
    from py_image_toolkit_spark.plans.job import run_extraction_job
    from py_image_toolkit_spark.session import build_session
    from py_image_toolkit_spark.sources.tables import SnapshotTable

    spark = build_session("extract-job")
    pages = spark.read.parquet(args.input)
    out_table = SnapshotTable(args.output)
    runs_table = SnapshotTable(args.runs or f"{args.output.rstrip('/')}_runs")
    summary = run_extraction_job(
        spark, pages, out_table, runs_table,
        cfg=_config_from(args), run_id=args.run_id,
        num_partitions=args.num_partitions,
    )
    # counter summary + error count ≙ the reference driver's end-of-run
    # report (resizes.py:108-131)
    print(json.dumps(summary))
    return 0 if summary["rows_failed"] == 0 or summary["rows_ok"] > 0 else 1


def cmd_bench(args: argparse.Namespace) -> int:
    import shutil
    import tempfile

    from py_image_toolkit_spark.fixtures import pages_df
    from py_image_toolkit_spark.plans.pipeline import extract
    from py_image_toolkit_spark.session import build_session

    spark = build_session("bench-job")
    work = args.output or tempfile.mkdtemp(prefix="cli_bench_")
    try:
        pages = pages_df(spark, args.n_docs, partitions=64)
        t0 = time.time()
        extract(pages, _config_from(args), num_partitions=args.num_partitions) \
            .write.mode("overwrite").parquet(f"{work}/out")
        dt = time.time() - t0
        print(json.dumps({"n_docs": args.n_docs, "wall_s": round(dt, 2),
                          "docs_per_sec": round(args.n_docs / dt, 1)}))
    finally:
        if args.output is None:
            shutil.rmtree(work, ignore_errors=True)
    return 0


def cmd_compact(args: argparse.Namespace) -> int:
    from py_image_toolkit_spark.session import build_session
    from py_image_toolkit_spark.sources.tables import SnapshotTable

    spark = build_session("compact-job")
    try:
        tbl = SnapshotTable(args.table)
        before = len(tbl.latest_snapshot()["data_dirs"]) if tbl.latest_snapshot() else 0
        sid = tbl.compact(spark, target_partitions=args.target_partitions)
        expired = tbl.expire_snapshots(keep_latest=1) if (args.expire and sid) else []
        snap = tbl.latest_snapshot()
        after = len(snap["data_dirs"]) if snap else 0
        print(json.dumps({
            "snapshot_id": sid, "dirs_before": before,
            "dirs_after": after, "expired_dirs": len(expired),
        }))
    finally:
        spark.stop()
    return 0


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    if args.cmd in ("extract", "resume"):
        return cmd_extract(args)
    if args.cmd == "compact":
        return cmd_compact(args)
    return cmd_bench(args)


if __name__ == "__main__":
    sys.exit(main())
