"""Property-based parity: for RANDOM configurations across the whole knob
space, the engine equals the pure-Python oracle byte-for-byte. The
example-based suite pins known quirks; this sweeps the cross-products nobody
hand-picked (hypothesis prints the failing ExtractConfig on regression)."""

import pytest

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from py_image_toolkit_spark.config import ExtractConfig
from py_image_toolkit_spark.testing import assert_parity

_spark = None


@pytest.fixture(scope="module", autouse=True)
def _bind_spark(spark):
    global _spark
    _spark = spark
    yield
    _spark = None


configs = st.builds(
    ExtractConfig,
    wrap_width=st.sampled_from([40, 80, 120]),
    norm_mode=st.sampled_from(["aspect", "fixed", "none"]),
    min_score=st.sampled_from([0.0, 0.6, 0.9]),
    method=st.sampled_from(["largest", "center"]),
    ref_point=st.sampled_from(["box", "top"]),
    rules=st.sampled_from([("thirds",), ("golden",), ("thirds", "golden")]),
    ratio=st.sampled_from([None, "16:9", "1:1", "3.5", "100:1"]),
    padding_percent=st.sampled_from([0.0, 5.5, 12.0]),
    extract_impl=st.sampled_from(["doc", "fused"]),
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(cfg=configs)
def test_parity_random_configs(cfg):
    assert_parity(_spark, 14, cfg)
