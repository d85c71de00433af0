"""Trailing-window ingestion rate gate — planted-scenario semantics.

Reference behavior: ``src/services/email_rate_limiter.py`` counts the
sender's ingestions in the trailing window and refuses the request at
the limit (fail-closed).  The batch-replay form gates every event
against its user's trailing count; registry correctness rides the
``rate_*`` columns of ``events_user_report``.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row

from car_etl_spark.queries import eventsq


def _gate_rows(spark, monkeypatch, rows):
    df = spark.createDataFrame(rows)

    def fake_load(spark_, sf_dir_, tables):
        assert tables == ("events",)
        return {"events": df}

    monkeypatch.setattr(eventsq, "load_tables", fake_load)
    out = eventsq.events_rate_limit_gate(spark, "unused")
    return {r["user_id"]: r.asDict() for r in out.collect()}


def _ev(eid, uid, ts, et="click"):
    return Row(
        event_id=eid, ts=ts, user_id=uid, event_type=et, value=1.0, props="{}"
    )


def test_burst_throttles_and_spread_does_not(spark, monkeypatch):
    base = dt.datetime(2024, 3, 1, 12, 0, 0)
    win = dt.timedelta(seconds=eventsq.RATE_WINDOW_SEC)
    rows = []
    # user 1: a burst of LIMIT+2 events inside one window — events
    # LIMIT+1 and LIMIT+2 exceed the gate
    for i in range(eventsq.RATE_LIMIT + 2):
        rows.append(_ev(100 + i, 1, base + dt.timedelta(minutes=i)))
    # user 2: the same volume spread one-per-window — never throttled
    for i in range(eventsq.RATE_LIMIT + 2):
        rows.append(_ev(200 + i, 2, base + i * win))
    r = _gate_rows(spark, monkeypatch, rows)
    u1, u2 = r[1], r[2]
    assert u1["rate_events"] == eventsq.RATE_LIMIT + 2
    assert u1["rate_throttled"] == 2
    assert u1["rate_peak_window"] == eventsq.RATE_LIMIT + 2
    assert u1["rate_throttled_frac"] == round(2 / (eventsq.RATE_LIMIT + 2), 6)
    assert u2["rate_throttled"] == 0
    assert u2["rate_peak_window"] == 1


def test_window_is_trailing_not_calendar(spark, monkeypatch):
    base = dt.datetime(2024, 3, 1, 23, 0, 0)
    rows = []
    # LIMIT events late in day 1, the (LIMIT+1)th early in day 2 —
    # inside the TRAILING window even though the calendar day rolled
    for i in range(eventsq.RATE_LIMIT):
        rows.append(_ev(300 + i, 3, base + dt.timedelta(minutes=i)))
    rows.append(_ev(399, 3, base + dt.timedelta(hours=2)))
    r = _gate_rows(spark, monkeypatch, rows)
    assert r[3]["rate_throttled"] == 1
    assert r[3]["rate_peak_window"] == eventsq.RATE_LIMIT + 1


def test_boundary_event_exactly_one_window_later_escapes(spark, monkeypatch):
    base = dt.datetime(2024, 3, 1, 0, 0, 0)
    win = dt.timedelta(seconds=eventsq.RATE_WINDOW_SEC)
    rows = [_ev(400 + i, 4, base) for i in range(eventsq.RATE_LIMIT)]
    # exactly one full window later: the first batch has aged out
    # (trailing frame is (t - window, t], the reference's ">= t-1h")
    rows.append(_ev(450, 4, base + win))
    r = _gate_rows(spark, monkeypatch, rows)
    assert r[4]["rate_throttled"] == 0
    assert r[4]["rate_peak_window"] == eventsq.RATE_LIMIT
