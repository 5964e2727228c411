"""THE correctness gate (BASELINE.json:14): byte-identical engine-vs-oracle
extraction per (url, rule) over the deterministic pages fixture — all columns
including extracted_text, char spans and the 6 E3 fields."""

import pytest

from py_image_toolkit_spark.config import ExtractConfig
from py_image_toolkit_spark.testing import (
    assert_parity,
    diff_frames,
    engine_frame,
    oracle_frame,
)


def test_parity_default_config(spark):
    # 200 docs × (88 html / 7 pdf / 5 junk per 100) × 2 rules = 400 records
    assert_parity(spark, 200)


@pytest.mark.parametrize("impl", ["kernel", "arrays", "relational"])
def test_parity_columns_h16_and_e3_impls(spark, impl):
    """The Column H16 path with all three E3 implementations (Arrow kernel /
    zero-shuffle arrays / relational windows) is byte-identical to the
    oracle — same for the doc-fused production kernel (default config above)."""
    assert_parity(spark, 60, ExtractConfig(extract_impl="columns", e3_impl=impl))


def test_parity_staged_fused(spark):
    """The staged pipeline (parse → Column E2 geometry → fused crop+label
    kernel) is byte-identical to the oracle — the SQL-verifiable
    decomposition, kept alongside the zero-shuffle doc kernel."""
    assert_parity(spark, 60, ExtractConfig(extract_impl="fused"))


def test_parity_staged_fused_degenerate(spark):
    assert_parity(spark, 24, ExtractConfig(extract_impl="fused", ratio="100:1"))


@pytest.mark.parametrize("impl", ["doc", "fused", "columns"])
def test_parity_padding_on_degenerate_windows(spark, impl):
    """Regression (found by the hypothesis config sweep): Spark greatest/
    least SKIP nulls, so the padding stage used to resurrect degenerate
    (null-coord) windows as full-canvas crops — a spurious success row per
    degenerate (url, rule)."""
    cfg = ExtractConfig(rules=("thirds",), ratio="100:1",
                        padding_percent=5.5, extract_impl=impl)
    assert_parity(spark, 14, cfg)


def test_parity_center_method_ratio_padding(spark):
    cfg = ExtractConfig(method="center", ratio="16:9", padding_percent=10.0,
                        rules=("golden",))
    assert_parity(spark, 80, cfg)


def test_parity_degenerate_ratio(spark):
    """Extreme ratio drives some (url, rule) windows degenerate — the
    degenerate failure branch is already per-(url, rule) and must NOT be
    re-fanned per rule (round-1 ADVICE: double-fan emitted len(rules)² rows
    per degenerate url, breaking the exactly-len(rules)-rows-per-url
    contract)."""
    assert_parity(spark, 24, ExtractConfig(ratio="100:1"))


def test_parity_degenerate_ratio_single_rule(spark):
    """Asymmetric check: with one rule the double-fan bug was invisible
    (len(rules)²=1) — use a tall ratio instead to hit the other window axis."""
    assert_parity(spark, 24, ExtractConfig(ratio="1:100"))


def test_parity_top_refpoint_fixed_ratio(spark):
    cfg = ExtractConfig(ref_point="top", ratio="1.5", rules=("thirds",))
    assert_parity(spark, 80, cfg)


@pytest.mark.parametrize("partitions", [2, 16])
def test_partitioning_invariance(spark, partitions):
    """Output is independent of physical partitioning (SURVEY.md §5.2.4)."""
    from py_image_toolkit_spark.fixtures import pages_df
    from py_image_toolkit_spark.plans.pipeline import extract
    from py_image_toolkit_spark.testing import norm_spans

    cfg = ExtractConfig()
    df = extract(pages_df(spark, 60, partitions=partitions), cfg).toPandas()
    df = df.sort_values(["url", "rule"]).reset_index(drop=True)
    df["spans"] = df["spans"].map(norm_spans)
    ora = oracle_frame(60, cfg)
    assert not diff_frames(df, ora)


def test_known_golden_values(spark):
    """Hard-assert a couple of fixture-derived goldens so regressions in the
    generator AND the pipeline both surface."""
    eng = engine_frame(spark, 10, ExtractConfig())
    ora = oracle_frame(10, ExtractConfig())
    # every html doc yields 2 rows; junk/degenerate paths are failures
    assert set(eng["rule"]) == {"thirds", "golden"}
    assert (eng["success"] == ora["success"]).all()
    ok = eng[eng["success"]]
    assert len(ok) > 0
    assert ok["extracted_text"].str.len().min() > 0


def test_differential_doc_vs_fused(spark):
    """Round-3 verdict task #4 — make the doc-vs-fused differential
    EXPLICIT: the default doc kernel loops the in-repo oracle per document,
    so its oracle-parity test is self-referential; the fused staged plan is
    an independent code path (Column E2 geometry + Arrow crop/label
    kernel). Comparing the two engines row-for-row on the same pages — no
    oracle in the loop — closes the triangle visibly instead of via the
    property sweep's sampling."""
    a = engine_frame(spark, 120, ExtractConfig(extract_impl="doc"))
    b = engine_frame(spark, 120, ExtractConfig(extract_impl="fused"))
    problems = diff_frames(a, b)
    assert not problems, "doc/fused divergence:\n" + "\n".join(problems)


@pytest.mark.parametrize("mode", ["fixed", "none"])
@pytest.mark.parametrize("impl", ["doc", "fused", "columns"])
def test_parity_norm_modes(spark, mode, impl):
    """B8 normalization dispatch (≙ reference resize.py:106-120
    aspect_ratio|fixed|none): every pipeline implementation matches the
    oracle byte-for-byte under each mode."""
    assert_parity(spark, 40, ExtractConfig(extract_impl=impl, norm_mode=mode))


def test_parity_driver_pages_with_pdf_route(spark):
    """The q27 driver gate is rows-only; close the loop here — the engine
    over pages_from_documents (90% HTML / 10% Column-built PDF payloads)
    must be byte-identical to the pure-Python oracle on the same pages,
    which also proves the PDF payloads round-trip the kernel's BT..ET
    parser exactly."""
    import pandas as pd

    from py_image_toolkit_spark.contract import pages_from_documents
    from py_image_toolkit_spark.oracle.extractor import extract_pages
    from py_image_toolkit_spark.plans.pipeline import extract
    from py_image_toolkit_spark.testing import norm_spans

    pages = pages_from_documents(spark, "/root/testdata/sf0.001").limit(120)
    rows = pages.collect()
    eng = extract(spark.createDataFrame(rows, pages.schema)).toPandas()
    eng = eng.sort_values(["url", "rule"]).reset_index(drop=True)
    eng["spans"] = eng["spans"].map(norm_spans)

    ora = pd.DataFrame(
        extract_pages(
            ((r["url"], bytes(r["html"]), r["warc_ts"], r["lang"]) for r in rows),
            ExtractConfig(),
        )
    )
    ora["spans"] = ora["spans"].map(
        lambda v: [(d["field"], int(d["start"]), int(d["end"])) for d in v]
    )
    ora = ora.sort_values(["url", "rule"]).reset_index(drop=True)
    problems = diff_frames(eng, ora)
    assert not problems, "driver-pages divergence:\n" + "\n".join(problems)
    # both routes actually exercised
    pdf_urls = {r["url"] for r in rows if bytes(r["html"]).startswith(b"%PDF-")}
    assert pdf_urls and len(pdf_urls) < len(rows)
