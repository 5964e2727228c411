"""asof_join — point-in-time join semantics vs a brute-force reference."""

from datetime import datetime

from py_image_toolkit_spark.operators.asof import asof_join


def _ts(m, s=0, us=0):
    return datetime(2024, 1, 1, 0, m, s, us)


def test_asof_picks_latest_at_or_before(spark):
    left = spark.createDataFrame(
        [(1, 10, _ts(5)), (2, 10, _ts(10)), (3, 10, _ts(1)), (4, 20, _ts(7))],
        "event_id long, user_id long, ts timestamp_ntz",
    )
    right = spark.createDataFrame(
        [(100, 10, _ts(2), 1.0), (101, 10, _ts(5), 2.0), (102, 10, _ts(9), 3.0),
         (103, 30, _ts(1), 9.0)],
        "rid long, user_id long, ts timestamp_ntz, val double",
    )
    out = {
        r["event_id"]: r
        for r in asof_join(
            left, right, on="user_id", right_cols=["rid", "val"], right_order="rid"
        ).collect()
    }
    assert out[1]["r_rid"] == 101 and out[1]["r_val"] == 2.0  # ties: same-ts wins
    assert out[2]["r_rid"] == 102
    assert out[3]["r_rid"] is None  # nothing at or before
    assert out[4]["r_rid"] is None  # key with no right rows at all


def test_asof_equal_ts_right_rows_tie_break_on_order_col(spark):
    left = spark.createDataFrame(
        [(1, 5, _ts(3))], "event_id long, user_id long, ts timestamp_ntz"
    )
    right = spark.createDataFrame(
        [(7, 5, _ts(2), "a"), (9, 5, _ts(2), "b"), (8, 5, _ts(2), "c")],
        "rid long, user_id long, ts timestamp_ntz, tag string",
    )
    row = asof_join(
        left, right, on="user_id", right_cols=["rid", "tag"], right_order="rid"
    ).collect()[0]
    # greatest right_order among equal (key, ts) wins — and BOTH payload
    # columns come from that same row (struct transport)
    assert row["r_rid"] == 9 and row["r_tag"] == "b"


def test_asof_matches_bruteforce_on_random_events(spark):
    import random

    rng = random.Random(7)
    lrows = [(i, rng.randrange(6), _ts(rng.randrange(40), rng.randrange(60)))
             for i in range(80)]
    rrows = [(1000 + i, rng.randrange(6), _ts(rng.randrange(40), rng.randrange(60)), float(i))
             for i in range(60)]
    left = spark.createDataFrame(lrows, "event_id long, user_id long, ts timestamp_ntz")
    right = spark.createDataFrame(rrows, "rid long, user_id long, ts timestamp_ntz, val double")
    got = {
        r["event_id"]: (r["r_rid"], r["r_val"])
        for r in asof_join(
            left, right, on="user_id", right_cols=["rid", "val"], right_order="rid"
        ).collect()
    }
    for eid, uid, ts in lrows:
        cands = [(rid, v) for rid, ruid, rts, v in rrows if ruid == uid and rts <= ts]
        exp = max(cands, key=lambda c: ( [r for r in rrows if r[0]==c[0]][0][2], c[0])) if cands else (None, None)
        assert got[eid] == exp, (eid, got[eid], exp)
