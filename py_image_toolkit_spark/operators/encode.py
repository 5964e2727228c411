"""E4: per-format encode-options dispatch for the output sinks.

Spark recast of the reference's format→save-options map
(reference optimize.py:39-53):

    .jpg/.jpeg → {quality, optimize}
    .png       → {optimize, compress_level: 9|6}
    .webp      → {lossless} + {quality, method: 6} when lossy
    .tiff      → {compression: tiff_lzw}

Here the "formats" are columnar/row sink formats and the options are the
engine-level encode knobs that matter at 100 TB — codec choice, codec level,
dictionary encoding — resolved from one quality/lossless parameterization so
every write path shares a single dispatch table instead of hand-picked
per-call configs (the reference's whole point: callers say *quality*, the
dispatch says *how*).

Two layers:
- ``writer_options(fmt, opts)``  → options passed per-write
  (``df.write.options(**...)``) — these override session defaults;
- ``session_codec_conf(opts)``   → session-level codec confs for engines
  that only honor e.g. zstd level globally (parquet zstd level is a Hadoop
  conf, not a writer option).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame

#: reference defaults (optimize.py:7-9)
DEFAULT_QUALITY = 85
DEFAULT_LOSSLESS = False


@dataclass(frozen=True)
class EncodeOptions:
    """Caller-facing parameterization (≙ the reference CLI's --jpg-quality /
    --webp-quality / --lossless / optimize flags)."""

    quality: int = DEFAULT_QUALITY  # 0-100; mapped to codec level per format
    optimize: bool = True           # ≙ PNG optimize → max effort / dictionary
    lossless: bool = DEFAULT_LOSSLESS  # force a lossless-style codec config


def _zstd_level(quality: int, optimize: bool) -> int:
    """quality 0-100 → zstd level 1-19 (higher quality = smaller file =
    more CPU, same trade the reference's jpg `quality` knob expresses)."""
    lvl = max(1, min(19, round(quality / 100 * 19)))
    return max(lvl, 9) if optimize else lvl


def writer_options(fmt: str, opts: EncodeOptions | None = None) -> dict[str, str]:
    """Per-format writer options — the dispatch table itself.

    Unknown formats get the empty dict (engine defaults), mirroring the
    reference's fall-through (no save_options for unknown extensions)."""
    o = opts or EncodeOptions()
    fmt = fmt.lower()
    if fmt == "parquet":
        return {
            # zstd is lossless by construction; `quality` trades CPU for size
            "compression": "zstd",
            "parquet.enable.dictionary": str(o.optimize).lower(),
        }
    if fmt == "orc":
        return {
            "compression": "zstd" if o.lossless or o.quality >= 50 else "snappy",
            "orc.compress.size": str(262144 if o.optimize else 65536),
        }
    if fmt == "json":
        return {"compression": "gzip" if o.optimize else "none"}
    if fmt == "csv":
        # ≙ tiff_lzw: plain-row format still gets a lossless stream codec
        return {"compression": "gzip", "header": "true"}
    return {}


def session_codec_conf(opts: EncodeOptions | None = None) -> dict[str, str]:
    """Session/Hadoop-level codec confs (set once at session build): the
    parquet zstd *level* is not a writer option in Spark."""
    o = opts or EncodeOptions()
    return {
        "spark.sql.parquet.compression.codec": "zstd",
        "spark.io.compression.zstd.level": str(_zstd_level(o.quality, o.optimize)),
        "parquet.compression.codec.zstd.level": str(_zstd_level(o.quality, o.optimize)),
    }


def encoded_writer(df: DataFrame, fmt: str = "parquet", opts: EncodeOptions | None = None):
    """``df.write`` pre-configured through the dispatch table."""
    return df.write.format(fmt).options(**writer_options(fmt, opts))
