"""Oracle geometry vs values verified by executing the reference's pure
functions (SURVEY.md §2 H1-H7 'verified' notes)."""

from py_image_toolkit_spark.oracle import geometry as G


def test_rule_points_thirds_verified():
    # reference crop.py:240-245 — verified: 1200×900
    assert G.rule_points(1200, 900, "thirds") == [
        (400, 300), (400, 600), (800, 300), (800, 600)
    ]


def test_rule_points_golden_verified():
    # reference crop.py:246-250 — verified: 1200×900
    assert G.rule_points(1200, 900, "golden") == [
        (458, 344), (458, 556), (742, 344), (742, 556)
    ]


def test_rule_points_unknown_center():
    assert G.rule_points(1200, 900, "wat") == [(600, 450)]


def test_rule_points_degenerate():
    assert G.rule_points(0, 900, "thirds") == []


def test_optimal_crop_verified_169():
    # reference crop.py:262-325 — verified: subj(300,280), 16:9, 1200×900
    pts = G.rule_points(1200, 900, "thirds")
    assert G.optimal_crop(1200, 900, (300, 280), pts, 16 / 9) == (0, 75, 800, 525)


def test_optimal_crop_verified_orig_ratio():
    pts = G.rule_points(1200, 900, "thirds")
    assert G.optimal_crop(1200, 900, (300, 280), pts, None) == (0, 0, 800, 600)


def test_optimal_crop_edge_degenerate():
    # rule point on the image edge → no valid window
    assert G.optimal_crop(10, 10, (0, 0), [(0, 5)], None) is None


def test_apply_padding_verified():
    # reference crop.py:328-353 — verified: (100,100,500,400)+10% in 1200×900
    assert G.apply_padding((100, 100, 500, 400), 1200, 900, 10) == (80, 85, 520, 415)


def test_apply_padding_noop_and_revert():
    assert G.apply_padding((1, 1, 2, 2), 10, 10, 0) == (1, 1, 2, 2)


def test_fit_dims_truncates_not_rounds():
    # reference resize.py:41-69 — int() truncation (H1 parity caveat)
    assert G.fit_dims(1200, 900, 1280, 720) == (960, 720)
    assert G.fit_dims(3, 1000, 2, 999) == (2, 666)  # 1000*(2/3)=666.67 → 666
    assert G.fit_dims(100, 50, 0, 0) == (100, 50)  # no-op
    assert G.fit_dims(100, 50, 200, 0) == (200, 100)  # single-axis


def test_parse_ratio():
    # reference crop.py:69-96 (B7)
    assert G.parse_ratio("16:9") == 16 / 9
    assert G.parse_ratio("1.5") == 1.5
    assert G.parse_ratio("none") is None
    assert G.parse_ratio(None) is None
    assert G.parse_ratio("0:3") is None
    assert G.parse_ratio("-2") is None
    assert G.parse_ratio("abc") is None
