"""Round-12 HTTP surface: rate() served from the rollup end-to-end,
instant queries served from the rollup, the Integer/Numeric→f64 union
on the extended PromQL routes, the query_range driver-materialization
cap, and fold=auto on the sketch routes."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from sensapp_spark.datamodel.types import SensorType
from sensapp_spark.server.app import create_app
from sensapp_spark.storage.lake import SensorLake

T0 = dt.datetime(2024, 1, 1)


def _mixed_lake(spark, tmp_path):
    """A lake holding one Float and one Integer counter series, plus
    the matching dimension rows."""
    lake = SensorLake(spark, str(tmp_path / "mixed_lake"))
    f_rows = [("fm/a", T0 + dt.timedelta(minutes=m), float(v))
              for m, v in [(10, 1.0), (40, 3.0), (70, 6.0), (100, 10.0)]]
    i_rows = [("im/a", T0 + dt.timedelta(minutes=m), v)
              for m, v in [(5, 100), (35, 140), (65, 200), (95, 280)]]
    lake.append_values(
        SensorType.FLOAT,
        spark.createDataFrame(
            f_rows, "sensor_id string, time timestamp, value double"
        ),
    )
    lake.append_values(
        SensorType.INTEGER,
        spark.createDataFrame(
            i_rows, "sensor_id string, time timestamp, value long"
        ),
    )
    sensors = spark.createDataFrame(
        [("fm/a", "fm", "Float"), ("im/a", "im", "Integer")],
        "sensor_id string, name string, type string",
    ).select(
        "sensor_id", "name", "type",
        F.lit(None).cast("string").alias("unit"),
        F.lit(None).cast("string").alias("unit_description"),
        F.create_map(F.lit("site"), F.lit("x")).alias("labels"),
    )
    lake.upsert_sensors(sensors)
    return lake


@pytest.fixture()
def mixed_app(spark, tmp_path):
    lake = _mixed_lake(spark, tmp_path)
    app = create_app(spark, lake)
    app.testing = True
    return app, lake


RANGE_Q = (
    "/api/v1/query_range?query={expr}"
    "&start=2024-01-01T01:00:00Z&end=2024-01-01T02:00:00Z&step=3600"
)


def test_integer_sensors_appear_in_query_range(mixed_app):
    """The P4 union: an Integer counter queried through query_range
    returns series (it silently vanished before round 12), raw AND
    rollup-served, with identical values."""
    app, _lake = mixed_app
    with app.test_client() as c:
        raw = c.get(RANGE_Q.format(expr="increase(im[1h])") + "&rollup=0")
        assert raw.status_code == 200, raw.get_data(as_text=True)
        assert raw.headers["X-Served-From"] == "raw"
        vals = {r["t"]: r["value"] for r in raw.get_json()["result"]}
        # [00:00,01:00]: 100@00:05 → 140@00:35 = 40;
        # [01:00,02:00]: 200@01:05 → 280@01:35 = 80.
        assert vals == {
            "2024-01-01T01:00:00": 40.0,
            "2024-01-01T02:00:00": 80.0,
        }
        # Maintain rollups for BOTH numeric tables, then the served
        # answer must be byte-equal (tag lists the one grain).
        assert c.post("/api/v1/admin/rollup/refresh").status_code == 200
        served = c.get(RANGE_Q.format(expr="increase(im[1h])"))
        assert served.headers["X-Served-From"] == "rollup-3600s"
        assert served.get_json() == raw.get_json()


def test_mixed_type_aggregation_unions_before_the_tail(mixed_app):
    """sum(last_over_time(...)) over a mixed Float/Integer fleet must
    aggregate ACROSS types — one number, not one per type — on both
    the raw and served paths."""
    import urllib.parse

    app, _lake = mixed_app
    q = (
        "/api/v1/query_range?query="
        + urllib.parse.quote(
            'sum(last_over_time({__name__=~"fm|im"}[1h]))'
        )
        + "&start=2024-01-01T02:00:00Z&end=2024-01-01T02:00:00Z&step=3600"
    )
    with app.test_client() as c:
        raw = c.get(q + "&rollup=0")
        assert raw.status_code == 200, raw.get_data(as_text=True)
        rows = raw.get_json()["result"]
        # last fm ≤ 02:00 (lookback 1h): 10.0 @01:40; last im: 280 @01:35.
        assert [r["value"] for r in rows] == [290.0]
        c.post("/api/v1/admin/rollup/refresh")
        served = c.get(q)
        assert served.headers["X-Served-From"] == "rollup-3600s"
        assert served.get_json() == raw.get_json()


def test_instant_query_served_from_rollup(mixed_app):
    """Anchored instant queries auto-route through the rollup with the
    X-Served-From header; ?rollup=0 A/B matches."""
    app, _lake = mixed_app
    anchor = int(
        (T0 + dt.timedelta(hours=2)).replace(
            tzinfo=dt.timezone.utc
        ).timestamp()
    )
    q = (
        "/api/v1/query?extended=true&query="
        f"rate(fm[2h] @ {anchor})"
    )
    with app.test_client() as c:
        c.post("/api/v1/admin/rollup/refresh")
        served = c.get(q)
        assert served.status_code == 200, served.get_data(as_text=True)
        assert served.headers["X-Served-From"] == "rollup-3600s"
        raw = c.get(q + "&rollup=0")
        assert raw.headers["X-Served-From"] == "raw"
        assert served.get_json() == raw.get_json()
        # fm in [00:00, 02:00]: 1.0@00:10 → 10.0@01:40, span 5400 s.
        vals = [r["value"] for r in served.get_json()["result"]]
        assert vals == [pytest.approx(9.0 / 5400)]
        # Unanchored (wall-clock) instant: unaligned → honest raw.
        live = c.get("/api/v1/query?extended=true&query=rate(fm[2h])")
        assert live.headers["X-Served-From"] == "raw"


def test_query_range_row_cap_returns_400(mixed_app, monkeypatch):
    import sensapp_spark.server.app as app_module

    app, _lake = mixed_app
    monkeypatch.setattr(app_module, "QUERY_RANGE_ROW_CAP", 3)
    with app.test_client() as c:
        # 1 series × 61 steps > 3 → in-plan limit, 400, no OOM path.
        r = c.get(
            "/api/v1/query_range?query=last_over_time(fm[1h])"
            "&start=2024-01-01T01:00:00Z&end=2024-01-01T02:00:00Z"
            "&step=60"
        )
        assert r.status_code == 400
        assert "exceeds 3 points" in r.get_json()["error"]
        # Under the cap: fine.
        ok = c.get(RANGE_Q.format(expr="last_over_time(fm[1h])"))
        assert ok.status_code == 200


def test_sketch_fold_auto_picks_coarsest_maintained_grain(
    spark, tmp_path
):
    lake = _mixed_lake(spark, tmp_path)
    app = create_app(spark, lake)
    app.testing = True
    with app.test_client() as c:
        assert c.post(
            "/api/v1/admin/rollup/refresh?sketch=1&grain=3600"
        ).status_code == 200
        assert c.post(
            "/api/v1/admin/rollup/refresh?sketch=1&grain=86400"
        ).status_code == 200
        # The float table holds ONE sensor (im/a lives in Integer).
        d = c.get("/api/v1/rollup/distinct?fold=auto").get_json()
        assert d["grain"] == 86400
        assert [b["distinct_series"] for b in d["buckets"]] == [1.0]
        # Explicit fold still folds the requested store.
        e = c.get("/api/v1/rollup/distinct?fold=86400").get_json()
        assert e["grain"] == 3600
        assert [b["distinct_series"] for b in e["buckets"]] == [1.0]
        # The refresh tick maintained Integer too — auto picks its own
        # coarsest table.
        g = c.get(
            "/api/v1/rollup/distinct?fold=auto&type=integer"
        ).get_json()
        assert g["grain"] == 86400
        assert [b["distinct_series"] for b in g["buckets"]] == [1.0]
        # No maintained sketch grains at all (Numeric holds no data)
        # → the requested grain serves, empty.
        f = c.get(
            "/api/v1/rollup/distinct?fold=auto&type=numeric"
        ).get_json()
        assert f["grain"] == 3600 and f["buckets"] == []
