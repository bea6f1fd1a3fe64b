"""Unit tests for the as-of join and sessionization operators
(operators/timeseries.py) — semantics on hand-built frames; cross-engine
parity is covered by test_oracle_parity.py (event_context_join — the
family union that folded in the former asof_align entry — and
events_sessionize)."""

from __future__ import annotations

import datetime as dt

from sensapp_spark.operators.timeseries import asof_join, sessionize


def _ts(minute: int, second: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, minute, second)


def test_asof_backward_inclusive(spark):
    left = spark.createDataFrame(
        [("a", _ts(0)), ("a", _ts(5)), ("a", _ts(10))], "k string, time timestamp"
    )
    right = spark.createDataFrame(
        [("a", _ts(5), 50.0), ("a", _ts(7), 70.0)],
        "k string, time timestamp, value double",
    )
    out = {
        r.time.minute: r.value_right
        for r in asof_join(left, right, on=["k"]).collect()
    }
    assert out[0] is None          # nothing at or before 00:00
    assert out[5] == 50.0          # equal timestamp matches (inclusive)
    assert out[10] == 70.0         # latest prior sample wins


def test_asof_keys_do_not_leak(spark):
    left = spark.createDataFrame([("a", _ts(9))], "k string, time timestamp")
    right = spark.createDataFrame(
        [("b", _ts(1), 1.0)], "k string, time timestamp, value double"
    )
    [row] = asof_join(left, right, on=["k"]).collect()
    assert row.value_right is None


def test_asof_tolerance(spark):
    left = spark.createDataFrame(
        [("a", _ts(10)), ("a", _ts(30))], "k string, time timestamp"
    )
    right = spark.createDataFrame(
        [("a", _ts(9), 9.0)], "k string, time timestamp, value double"
    )
    out = {
        r.time.minute: (r.value_right, r.time_right)
        for r in asof_join(
            left, right, on=["k"], tolerance_seconds=300
        ).collect()
    }
    assert out[10] == (9.0, _ts(9))       # 60 s old — within tolerance
    assert out[30] == (None, None)        # 21 min old — cut

def test_asof_carries_left_payload(spark):
    left = spark.createDataFrame(
        [("a", _ts(5), "x")], "k string, time timestamp, tag string"
    )
    right = spark.createDataFrame(
        [("a", _ts(1), 1.5)], "k string, time timestamp, value double"
    )
    [row] = asof_join(left, right, on=["k"]).collect()
    assert (row.tag, row.value_right) == ("x", 1.5)


def test_sessionize_gaps(spark):
    base = dt.datetime(2024, 1, 1)

    def at(seconds: int) -> dt.datetime:
        return base + dt.timedelta(seconds=seconds)

    events = spark.createDataFrame(
        [
            ("u", at(0)),
            ("u", at(600)),     # 600 s gap — same session
            ("u", at(2401)),    # 1801 s gap — new session
            ("u", at(4201)),    # exactly 1800 s — same session (strict >)
            ("v", at(0)),       # other key independent
        ],
        "k string, time timestamp",
    )
    out = sessionize(events, on=["k"], gap_seconds=1800).collect()
    by_key = {(r.k, r.time): r.session_id for r in out}
    assert by_key[("u", at(0))] == 1
    assert by_key[("u", at(600))] == 1
    assert by_key[("u", at(2401))] == 2
    assert by_key[("u", at(4201))] == 2
    assert by_key[("v", at(0))] == 1


def test_gapfill_forward_fills_and_flags(spark):
    from sensapp_spark.operators.timeseries import gapfill

    hourly = spark.createDataFrame(
        [
            ("s", dt.datetime(2024, 1, 1, 0), 1.0),
            ("s", dt.datetime(2024, 1, 1, 3), 4.0),   # 2 missing hours
            ("t", dt.datetime(2024, 1, 1, 5), 9.0),   # single point
        ],
        "sensor_id string, bucket timestamp, value double",
    )
    out = gapfill(hourly, on=["sensor_id"]).collect()
    rows = {(r.sensor_id, r.bucket.hour): (r.value, r.gap_filled) for r in out}
    assert len(out) == 5  # 4 grid hours for s, 1 for t
    assert rows[("s", 0)] == (1.0, False)
    assert rows[("s", 1)] == (1.0, True)
    assert rows[("s", 2)] == (1.0, True)
    assert rows[("s", 3)] == (4.0, False)
    assert rows[("t", 5)] == (9.0, False)


def test_asof_matches_pandas_merge_asof_on_random_data(spark):
    """Independent oracle: pandas.merge_asof (backward, exact-match
    allowed) over seeded random data — 10 keys, hundreds of rows,
    colliding timestamps between sides."""
    import random

    import pandas as pd

    rng = random.Random(42)
    keys = [f"k{i}" for i in range(10)]
    left_rows = [
        (rng.choice(keys), _ts(0) + dt.timedelta(seconds=rng.randrange(0, 36000)))
        for _ in range(300)
    ]
    right_rows = {
        (rng.choice(keys), _ts(0) + dt.timedelta(seconds=rng.randrange(0, 36000)))
        for _ in range(200)
    }  # set: unique (key, time) so the matched value is well-defined
    right_rows = [(k, t, float(i)) for i, (k, t) in enumerate(sorted(right_rows))]

    left = spark.createDataFrame(left_rows, "k string, time timestamp")
    right = spark.createDataFrame(
        right_rows, "k string, time timestamp, value double"
    )
    got = {
        (r.k, r.time, r.value_right)
        for r in asof_join(left, right, on=["k"]).collect()
    }

    lpd = pd.DataFrame(left_rows, columns=["k", "time"]).sort_values("time")
    rpd = pd.DataFrame(
        right_rows, columns=["k", "time", "value"]
    ).sort_values("time")
    merged = pd.merge_asof(
        lpd, rpd, on="time", by="k", direction="backward",
        allow_exact_matches=True, suffixes=("", "_r"),
    )
    want = {
        (row.k, row.time.to_pydatetime(),
         None if pd.isna(row.value) else float(row.value))
        for row in merged.itertuples(index=False)
    }
    assert got == want


def test_sessionize_matches_python_reference_on_random_data(spark):
    import random

    rng = random.Random(7)
    rows = sorted(
        {
            (f"k{rng.randrange(5)}",
             _ts(0) + dt.timedelta(seconds=rng.randrange(0, 200_000)))
            for _ in range(400)
        }
    )
    df = spark.createDataFrame(rows, "k string, time timestamp")
    got = {
        (r.k, r.time): r.session_id
        for r in sessionize(df, on=["k"], gap_seconds=900).collect()
    }

    want = {}
    by_key: dict = {}
    for k, t in rows:  # sorted (k, time)
        by_key.setdefault(k, []).append(t)
    for k, times in by_key.items():
        sid, last = 0, None
        for t in times:
            if last is None or (t - last).total_seconds() > 900:
                sid += 1
            last = t
            want[(k, t)] = sid
    assert got == want
