"""DST time-kernel tests — the reference's own test strategy pins
2024-03-31 (spring forward, 23 h / 92 quarters) and 2024-10-27
(fall back, 25 h / 100 quarters) (i90_transform_tests.py:12-16).
Expected UTC values are hand-computed and cross-checked against
zoneinfo, not derived from the implementation.
"""

from __future__ import annotations

import datetime as dt
from zoneinfo import ZoneInfo

import pytest
from pyspark.sql import functions as F

from etl_energy_tracker_spark import timegrid as tg

MAD = ZoneInfo("Europe/Madrid")
UTC = ZoneInfo("UTC")


@pytest.fixture(scope="module")
def dim(spark):
    return tg.dst_dim(spark, 2023, 2026)


def test_transition_dates():
    trans = dict(tg.madrid_transitions(2024, 2025))
    assert trans[dt.date(2024, 3, 31)] == tg.DAY_SPRING_FWD
    assert trans[dt.date(2024, 10, 27)] == tg.DAY_FALL_BACK
    assert trans[dt.date(2025, 3, 30)] == tg.DAY_SPRING_FWD
    assert trans[dt.date(2025, 10, 26)] == tg.DAY_FALL_BACK


def test_dim_day_lengths(spark, dim):
    rows = {
        r["fecha"]: r
        for r in dim.where(
            F.col("fecha").isin([dt.date(2024, 3, 31), dt.date(2024, 10, 27), dt.date(2024, 1, 15), dt.date(2024, 7, 15)])
        ).collect()
    }
    assert rows[dt.date(2024, 3, 31)]["n_hours"] == 23
    assert rows[dt.date(2024, 3, 31)]["n_quarters"] == 92
    assert rows[dt.date(2024, 10, 27)]["n_hours"] == 25
    assert rows[dt.date(2024, 10, 27)]["n_quarters"] == 100
    assert rows[dt.date(2024, 1, 15)]["day_start_offset"] == 1
    assert rows[dt.date(2024, 7, 15)]["day_start_offset"] == 2
    # transition days start on the pre-transition offset
    assert rows[dt.date(2024, 3, 31)]["day_start_offset"] == 1
    assert rows[dt.date(2024, 10, 27)]["day_start_offset"] == 2


HOURLY_CASES = [
    # (fecha, hora_label, expected UTC)
    ("2024-01-15", "00-01", "2024-01-14 23:00:00"),
    ("2024-01-15", "12-13", "2024-01-15 11:00:00"),
    ("2024-01-15", "23-00", "2024-01-15 22:00:00"),
    ("2024-07-15", "00-01", "2024-07-14 22:00:00"),
    ("2024-07-15", "23-00", "2024-07-15 21:00:00"),
    # spring forward: local 02 missing; 23-hour day
    ("2024-03-31", "00-01", "2024-03-30 23:00:00"),
    ("2024-03-31", "01-02", "2024-03-31 00:00:00"),
    ("2024-03-31", "03-04", "2024-03-31 01:00:00"),
    ("2024-03-31", "23-00", "2024-03-31 21:00:00"),
    # fall back: 02a (CEST) then 02b (CET); 25-hour day
    ("2024-10-27", "00-01", "2024-10-26 22:00:00"),
    ("2024-10-27", "01-02", "2024-10-26 23:00:00"),
    ("2024-10-27", "02-03a", "2024-10-27 00:00:00"),
    ("2024-10-27", "02-03b", "2024-10-27 01:00:00"),
    ("2024-10-27", "03-04", "2024-10-27 02:00:00"),
    ("2024-10-27", "23-00", "2024-10-27 22:00:00"),
]


def test_hourly_to_utc(spark, dim):
    df = spark.createDataFrame(
        [(f, h) for f, h, _ in HOURLY_CASES], "fecha string, hora string"
    )
    out = tg.with_utc_from_hourly(df, dim)
    got = {(r["fecha"], r["hora"]): r["datetime_utc"] for r in out.collect()}
    for f, h, exp in HOURLY_CASES:
        assert got[(f, h)] == dt.datetime.fromisoformat(exp), (f, h)


def test_hourly_matches_zoneinfo_on_normal_days(spark, dim):
    # every hour of two normal days must agree with the tz database
    cases = []
    for f in ["2024-02-10", "2024-08-10"]:
        d = dt.date.fromisoformat(f)
        for h in range(24):
            local = dt.datetime(d.year, d.month, d.day, h, tzinfo=MAD)
            cases.append((f, f"{h:02d}-{(h + 1) % 24:02d}", local.astimezone(UTC).replace(tzinfo=None)))
    df = spark.createDataFrame([(f, h) for f, h, _ in cases], "fecha string, hora string")
    got = {
        (r["fecha"], r["hora"]): r["datetime_utc"]
        for r in tg.with_utc_from_hourly(df, dim).collect()
    }
    for f, h, exp in cases:
        assert got[(f, h)] == exp, (f, h)


QUARTER_CASES = [
    ("2024-01-15", 1, "2024-01-14 23:00:00"),
    ("2024-01-15", 96, "2024-01-15 22:45:00"),
    ("2024-03-31", 1, "2024-03-30 23:00:00"),
    ("2024-03-31", 92, "2024-03-31 21:45:00"),  # 23-hour day ends 21:45 UTC
    ("2024-10-27", 1, "2024-10-26 22:00:00"),
    ("2024-10-27", 100, "2024-10-27 22:45:00"),  # 25-hour day ends 22:45 UTC
    ("2024-10-27", 9, "2024-10-27 00:00:00"),  # 02:00a CEST
    ("2024-10-27", 13, "2024-10-27 01:00:00"),  # 02:00b CET
]


def test_quarter_to_utc(spark, dim):
    df = spark.createDataFrame(
        [(f, i) for f, i, _ in QUARTER_CASES], "fecha string, quarter_idx int"
    )
    out = tg.with_utc_from_quarter(df, dim)
    got = {(r["fecha"], r["quarter_idx"]): r["datetime_utc"] for r in out.collect()}
    for f, i, exp in QUARTER_CASES:
        assert got[(f, i)] == dt.datetime.fromisoformat(exp), (f, i)


def test_expand_hourly_divides_volumes(spark):
    df = spark.createDataFrame(
        [(dt.datetime(2024, 1, 15, 10), 100.0, 42.0)],
        "datetime_utc timestamp, volumenes double, precio double",
    )
    out = tg.expand_hourly_to_15min(df, divide_cols=("volumenes",)).collect()
    assert len(out) == 4
    assert sorted(r["datetime_utc"].minute for r in out) == [0, 15, 30, 45]
    assert all(r["volumenes"] == 25.0 for r in out)
    assert all(r["precio"] == 42.0 for r in out)  # prices replicate


def test_rollup_15min_to_hourly(spark):
    base = dt.datetime(2024, 1, 15, 10)
    rows = [
        (base + dt.timedelta(minutes=m), 1, float(p))
        for m, p in [(0, 10), (15, 20), (30, 30), (45, 40)]
    ]
    df = spark.createDataFrame(rows, "datetime_utc timestamp, id_mercado int, precio double")
    out = tg.rollup_15min_to_hourly(
        df, group_cols=("id_mercado",), mean_cols=("precio",)
    ).collect()
    assert len(out) == 1
    assert out[0]["precio"] == 25.0
    assert out[0]["datetime_utc"] == base


def test_round_trip_expand_rollup(spark, dim):
    # hourly → 15min → hourly must be identity for prices (mean of 4
    # replicas) on a DST day too
    df = spark.createDataFrame(
        [("2024-10-27", f"{h:02d}-{(h + 1) % 24:02d}{s}", 50.0 + h)
         for h, s in [(0, ""), (1, ""), (2, "a"), (2, "b"), (3, ""), (12, "")]],
        "fecha string, hora string, precio double",
    )
    hourly = tg.with_utc_from_hourly(df, dim).select("datetime_utc", "precio")
    q = tg.expand_hourly_to_15min(hourly)
    back = tg.rollup_15min_to_hourly(q, mean_cols=("precio",))
    a = {r["datetime_utc"]: r["precio"] for r in hourly.collect()}
    b = {r["datetime_utc"]: r["precio"] for r in back.collect()}
    assert a == b and len(a) == 6


def test_inverse_labels_round_trip(spark, dim):
    """UTC → local labels → UTC must be the identity across normal and
    both DST days, for every hour and quarter of each day."""
    days = ["2024-01-15", "2024-07-15", "2024-03-31", "2024-10-27"]
    lengths = {"2024-01-15": 24, "2024-07-15": 24, "2024-03-31": 23, "2024-10-27": 25}
    rows = []
    for f in days:
        d = dt.date.fromisoformat(f)
        # local midnight UTC then every 15 min of the local day
        start = dt.datetime(d.year, d.month, d.day, 0, tzinfo=MAD).astimezone(UTC).replace(tzinfo=None)
        for q in range(lengths[f] * 4):
            rows.append((start + dt.timedelta(minutes=15 * q),))
    df = spark.createDataFrame(rows, "datetime_utc timestamp")
    labeled = tg.with_local_labels(df, dim)

    # quarter round trip
    back_q = tg.with_utc_from_quarter(
        labeled.select("datetime_utc", "fecha", "quarter_idx"),
        dim,
        fecha="fecha",
        quarter_idx=F.col("quarter_idx"),
        out="utc_back",
    )
    mismatch = back_q.where(F.col("utc_back") != F.col("datetime_utc")).count()
    assert mismatch == 0

    # hourly round trip on the on-the-hour rows
    hourly = labeled.where(F.minute("datetime_utc").isin(0) & (F.minute(F.from_utc_timestamp("datetime_utc", "Europe/Madrid")) == 0))
    back_h = tg.with_utc_from_hourly(
        hourly.select("datetime_utc", "fecha", "hora"), dim, out="utc_back"
    )
    assert back_h.where(F.col("utc_back") != F.col("datetime_utc")).count() == 0

    # the fall-back day carries both suffix labels
    labels = {r["hora"] for r in labeled.where(F.col("fecha") == dt.date(2024, 10, 27)).collect()}
    assert "02-03a" in labels and "02-03b" in labels
