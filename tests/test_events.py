"""Gap-sessionization unit tests (q88)."""

from datetime import datetime

from py_image_toolkit_spark.operators.events import sessionize_gaps


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long"
    )


def test_gap_sessionization_splits_on_silence(spark):
    t = lambda m, s=0: datetime(2024, 1, 1, 0, m, s)  # noqa: E731
    df = _ev(
        spark,
        [
            (1, t(0), 7), (2, t(5), 7), (3, t(9), 7),     # session 1
            (4, t(40), 7), (5, t(41), 7),                  # >10min gap -> session 2
            (6, t(0), 8),                                  # other user: own session 1
        ],
    )
    out = {(r.user_id, r.session_id): r for r in sessionize_gaps(df, gap_s=600).collect()}
    assert out[(7, 1)].n_events == 3 and out[(7, 1)].duration_s == 9 * 60
    assert out[(7, 2)].n_events == 2 and out[(7, 2)].duration_s == 60
    assert out[(8, 1)].n_events == 1 and out[(8, 1)].duration_s == 0
    assert len(out) == 3


def test_gap_boundary_is_strict_greater_than(spark):
    t = lambda m, s=0: datetime(2024, 1, 1, 0, m, s)  # noqa: E731
    df = _ev(spark, [(1, t(0), 1), (2, t(10), 1), (3, t(20, 1), 1)])
    out = sessionize_gaps(df, gap_s=600).collect()
    # exactly-600s gap stays in-session; 601s starts a new one
    assert sorted((r.session_id, r.n_events) for r in out) == [(1, 2), (2, 1)]
