"""Recorded-fixture connector tests (SURVEY §2.1 S1-S3/S5).

The live-credential paths can't run offline, so these tests replay
CAPTURED payload shapes — a paginated Kobo KPI JSON response
(R/ingestion.R:294-329), a PDS trips/points CSV body (R/ingestion.R:428-475,
:539-629), and a Sheets ``devices`` tab (R/storage.R:135-156) — through the
real connector code end-to-end: the Kobo fixture goes through the actual
``urllib`` client (urlopen monkeypatched to serve the recording, pagination
and auth headers exercised for real), the CSV bodies through the real
parse/fan-out stages.
"""

import io
import json

import pandas as pd
import pytest
from pyspark.sql import functions as F

from peskas_malawi_data_pipeline_spark.sources import kobo, pds, sheets

# --------------------------------------------------------------------------
# Recorded Kobo KPI payload: two pages, realistic envelope (count / next /
# previous / results) and realistic submissions — full-path nested field
# names plus the server-side metadata fields (formhub/uuid, _submission_time,
# _attachments, __version__) a real response carries and the pinned schema
# deliberately ignores.
# --------------------------------------------------------------------------

def _kpi_submission(i: int) -> dict:
    gv = "group_vessel_data"
    return {
        "_id": i,
        "formhub/uuid": f"f{i:04d}",
        "today": "2024-03-02",
        "start": "2024-03-02T07:58:12.000+02:00",
        "end": "2024-03-02T08:10:44.000+02:00",
        "group_location/landing_date": "2024-03-01",
        "group_location/landing_beach": "beach-a",
        "group_location/gps_location": "-13.50 34.50 470 4",
        "fishing_today": "yes",
        "n_vessels": "1",
        gv: [{
            f"{gv}/group_vessel/vessel_type": "B+E",
            f"{gv}/group_vessel/crew_number": "3",
            f"{gv}/group_gear/gear_type": "Longline",
            f"{gv}/group_catch": [{
                "fish_species": "Chambo", "weight_kg": "3",
                "value_species": "600", "value_type": "per_kg",
            }],
        }],
        "__version__": "vGk5KxYzQq",
        "_xform_id_string": "aFieldDataApp2024",
        "_uuid": f"u-{i:04d}",
        "_attachments": [],
        "_status": "submitted_via_web",
        "_submission_time": "2024-03-02T06:11:03",
        "_tags": [],
        "_notes": [],
    }


def _kpi_pages(base: str, asset: str) -> dict:
    first = f"{base}/assets/{asset}/data/?format=json"
    second = f"{base}/assets/{asset}/data/?format=json&start=2"
    return {
        first: {
            "count": 3, "next": second, "previous": None,
            "results": [_kpi_submission(1), _kpi_submission(2)],
        },
        second: {
            "count": 3, "next": None,
            "previous": first,
            "results": [_kpi_submission(3)],
        },
    }


class _CannedResponse:
    def __init__(self, payload: dict):
        self._body = json.dumps(payload).encode("utf-8")

    def read(self) -> bytes:
        return self._body

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False


def test_kobo_kpi_recorded_roundtrip(spark, tmp_path, monkeypatch):
    """fetch_submissions drives the real urllib client over a recorded
    2-page KPI response (pagination followed, token header sent), then the
    landed JSON reads back through the pinned-schema path with the
    server-side metadata fields ignored and every answer intact."""
    import urllib.request

    asset = "aFieldDataApp2024"
    pages = _kpi_pages(kobo.KOBO_BASE, asset)
    seen = []

    def fake_urlopen(req, timeout=None):
        seen.append(req)
        assert req.headers.get("Authorization") == "Token sekrit"
        return _CannedResponse(pages[req.full_url])

    monkeypatch.setattr(urllib.request, "urlopen", fake_urlopen)
    subs = kobo.fetch_submissions(asset, token="sekrit")
    assert [s["_id"] for s in subs] == [1, 2, 3]
    assert len(seen) == 2                       # both pages fetched

    landed = str(tmp_path / "subs.jsonl")
    kobo.land_submissions(subs, landed)
    df = kobo.read_form_json(spark, landed, "FieldDataApp-2024")
    rows = df.orderBy("_id").collect()
    assert len(rows) == 3
    row = rows[0]
    assert row["n_vessels"] == "1"
    # the KPI metadata fields are not part of the pinned contract
    assert "_attachments" not in df.columns and "_uuid" not in df.columns
    # nested repeat survived the round trip
    exploded = df.select(F.explode("group_vessel_data").alias("v"))
    assert exploded.count() == 3


# --------------------------------------------------------------------------
# Recorded PDS bodies: the exact CSV header row the analytics API returns
# for trips and per-trip points (R/ingestion.R:473-475 reads the response
# body with read_csv; same columns as the bulk export).
# --------------------------------------------------------------------------

_TRIPS_BODY = """\
Trip,IMEI,Device,Boat,Community,Started,Ended,Duration (Seconds),Range (Meters),Distance (Meters),Last Seen,Tags
101,861111030002222,D-22,Mwera,Nkope,2024-03-05 04:10:00,2024-03-05 11:42:00,27120,14210.5,18411.2,2024-03-05 11:45:10,
102,861111030001111,D-11,Chambo II,Msaka,2024-03-06 18:05:00,2024-03-06 22:30:00,15900,9120.0,11800.7,2024-03-06 22:31:00,night
"""

def _points_body(trip: int) -> str:
    rows = "\n".join(
        f"{trip},2024-03-05 04:{10 + i:02d}:00,-14.0{i},34.9{i},"
        f"2.{i},120.{i},18{i},B-{trip},Boat {trip},Nkope"
        for i in range(3))
    return ("Trip,Time,Lat,Lng,Speed (M/S),Range (Meters),Heading,"
            "Boat,Boat Name,Community\n" + rows + "\n")


def test_pds_trips_recorded_body(spark, tmp_path):
    """A captured trips response body parses through read_trips_csv with
    full typing — timestamps, longs, doubles — and empty Tags as NULL."""
    p = tmp_path / "trips.csv"
    p.write_text(_TRIPS_BODY)
    trips = pds.read_trips_csv(spark, str(p))
    rows = {r.Trip: r for r in trips.collect()}
    assert set(rows) == {101, 102}
    assert rows[101].IMEI == "861111030002222"
    assert rows[101]["Duration (Seconds)"] == 27120
    assert abs(rows[102]["Distance (Meters)"] - 11800.7) < 1e-9
    assert rows[101].Started.hour == 4 and rows[102].Ended.minute == 30
    assert rows[101].Tags is None and rows[102].Tags == "night"


def test_pds_points_recorded_fanout(spark, tmp_path):
    """Captured per-trip point bodies flow through the distributed
    mapInPandas fan-out: every trip's rows appear, typed per POINTS_SCHEMA,
    and a trip whose fetch fails contributes zero rows (reference drops
    failures silently, R/export.R:143-152)."""
    p = tmp_path / "trips.csv"
    p.write_text(_TRIPS_BODY)
    trips = pds.read_trips_csv(spark, str(p))

    bodies = {101: _points_body(101), 102: _points_body(102)}

    def recorded_fetcher(trip_id: int):
        return bodies.get(trip_id)      # trip ids outside the recording: None

    points = pds.fetch_trip_points(trips, recorded_fetcher)
    got = points.collect()
    assert len(got) == 6
    by_trip = {t: [r for r in got if r.Trip == t] for t in (101, 102)}
    assert len(by_trip[101]) == 3 and len(by_trip[102]) == 3
    r = sorted(by_trip[101], key=lambda r: r.Time)[0]
    assert r.Time.minute == 10 and abs(r.Lat - -14.00) < 1e-9
    assert r["Boat Name"] == "Boat 101"


# --------------------------------------------------------------------------
# Recorded Sheets `devices` tab: every column string-typed (col_types="c"),
# including numerics-looking IMEIs — exactly what range_read returns.
# --------------------------------------------------------------------------

def test_sheets_devices_recorded_tab(spark, tmp_path):
    fetched = [
        {"IMEI": "861111030002222", "device_id": "D-22", "boat_name": "Mwera",
         "community": "Nkope", "status": "active"},
        {"IMEI": "861111030001111", "device_id": "D-11", "boat_name": "Chambo II",
         "community": "Msaka", "status": "inactive"},
    ]
    reg = sheets.devices_from_rows(spark, fetched)
    assert [f.dataType.simpleString() for f in reg.schema.fields] == ["string"] * 5
    assert {r.IMEI for r in reg.collect()} == {"861111030002222", "861111030001111"}

    # same tab landed as CSV reads to the identical frame
    p = tmp_path / "devices.csv"
    pd.DataFrame(fetched).to_csv(p, index=False)
    csv = sheets.read_devices_csv(spark, str(p))
    assert {tuple(r) for r in csv.collect()} == {tuple(r) for r in reg.collect()}
