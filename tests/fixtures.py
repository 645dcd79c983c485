"""Deterministic fixture generators per FIXTURES.md (F1/F2/F4/F5/F6).

Small but domain-shaped: every operator branch in SURVEY §2 gets exercised —
NULL variants, form-variant columns, outliers, tz day boundaries, unique vs
ambiguous IMEI suffixes, multi-trip days.
"""

from __future__ import annotations

import datetime as dt
import random

from pyspark.sql import Row, SparkSession

D = dt.datetime

DEVICES = [
    {"IMEI": "861111030001111", "device_id": "d1", "boat_name": "Mwera", "community": "Msaka", "status": "active"},
    {"IMEI": "861111030002222", "device_id": "d2", "boat_name": "Chambo1", "community": "Chembe", "status": "active"},
    # two IMEIs sharing a long common suffix -> ambiguous-match case
    {"IMEI": "861111039999999", "device_id": "d3", "boat_name": "TwinA", "community": "Monkey Bay", "status": "active"},
    {"IMEI": "862222039999999", "device_id": "d4", "boat_name": "TwinB", "community": "Monkey Bay", "status": "active"},
    {"IMEI": "861111030005555", "device_id": "d5", "boat_name": "Usipa5", "community": "Salima", "status": "inactive"},
]


def devices_df(spark: SparkSession):
    from peskas_malawi_data_pipeline_spark.sources.sheets import devices_from_rows
    return devices_from_rows(spark, DEVICES)


RAW_SCHEMA = (
    "form_name string, submission_id string, vessel_number int, "
    "catch_number int, today string, landing_date string, "
    "date_of_landing string, sample_district string, landing_beach string, "
    "sample_stratum string, sample_day string, gps_location string, "
    "gps_location_001 string, fishing_today string, fishing string, "
    "why_not_fishing string, why_not string, if_other string, "
    "n_vessels string, total_landings string, vessel_type string, "
    "crew_number string, crew_female string, hours_fished string, "
    "imei_number string, gear_type string, gear_type_other string, "
    "gear_mesh_size string, gear_mesh_size_mm string, gear_depth string, "
    "gear_depth_m string, num_hauls string, longline_effort_hooks string, "
    "longline_effort_hrs string, handline_effort_hooks string, "
    "handline_effort_hrs string, mosquito_effort_sets string, "
    "kambuzi_effort_sets string, chilimira_hauls string, trader_sex string, "
    "buyer_sex string, transport_mode string, trans string, "
    "transothers string, dest string, value_species string, "
    "value_type string, catch_use string, fish_species string, "
    "fish_species_other string, weight string, weight_kg string, "
    "weight_type string, "
    "gillnets array<struct<gillnet_number:int,net_type:string,"
    "gillnet_mesh:string,gillnet_mesh_mm:string,gillnet_length:string,"
    "gillnet_length_m:string>>"
)


def raw_landings_df(spark: SparkSession, n_submissions: int = 60):
    """F2 — flattened raw landings: one row per (submission, vessel, catch),
    all survey answers string-typed, union-widened across two form dialects.
    """
    rng = random.Random(42)
    taxa = ["Usipa", "Chambo", "Kampango", "Utaka", "Ndunduma",
            "Other-Tilapia", "NOCATCH", "0"]
    gears = ["Gillnet", "Chilimira", "Longline", "Handline", "Fish Trap",
             "Kambuzi seine", "Mosquito net", "other gear"]
    districts = ["Mangochi", "Salima", "Nkhotakota"]
    rows = []
    for s in range(n_submissions):
        form = "Malawi SSF" if s % 2 == 0 else "FieldDataApp-2024"
        sub_id = f"S{s:04d}"
        today = D(2024, 3, 1) + dt.timedelta(days=s % 28)
        landing = today - dt.timedelta(days=rng.choice([0, 0, 1, 1, 2]))
        if s % 17 == 0:
            landing = today + dt.timedelta(days=3)      # landing after submission (Q1)
        if s % 23 == 0:
            landing = D(2019, 6, 1)                      # before 2020-12-31 floor
        n_vessels = 0 if s % 13 == 0 else rng.randint(1, 3)
        imei_pool = ["2222", "9999999", "30001111", "77777",
                     "861111030002222", "123", None, "0"]
        if n_vessels == 0:
            rows.append(_raw_row(form, sub_id, None, None, today, landing,
                                 districts[s % 3], "no", None, None, None, None, None, rng))
            continue
        for v in range(1, n_vessels + 1):
            gear = gears[(s + v) % len(gears)]
            imei = imei_pool[(s + v) % len(imei_pool)]
            n_catches = 0 if (s + v) % 11 == 0 else rng.randint(1, 3)
            if n_catches == 0:
                rows.append(_raw_row(form, sub_id, v, None, today, landing,
                                     districts[s % 3], "yes", gear, imei, None, None, None, rng))
                continue
            for c in range(1, n_catches + 1):
                taxon = taxa[(s + v + c) % len(taxa)]
                kg = round(rng.lognormvariate(1.2, 0.6), 1)
                if (s + v + c) % 19 == 0:
                    kg = 5000.0                           # catch outlier
                price = round(kg * rng.uniform(800, 1800), 0)
                if (s + v + c) % 29 == 0:
                    price = kg * 500000.0                 # price outlier
                rows.append(_raw_row(form, sub_id, v, c, today, landing,
                                     districts[s % 3], "yes", gear, imei, taxon,
                                     kg, price, rng))
    return spark.createDataFrame(rows, RAW_SCHEMA)


def _raw_row(form, sub_id, vessel, catch, today, landing, district, fishing,
             gear, imei, taxon, kg, price, rng):
    is_ssf = form == "Malawi SSF"
    crew = str(rng.randint(1, 8)) if vessel else None
    if vessel and (hash((sub_id, vessel)) % 31 == 0):
        crew = "-2"                                      # negative crew (alert 2)
    gillnets = None
    if gear == "Gillnet" and vessel:
        gillnets = [Row(gillnet_number=1, net_type="A",
                        gillnet_mesh="25" if is_ssf else None,
                        gillnet_mesh_mm=None if is_ssf else "30",
                        gillnet_length=None, gillnet_length_m="100")]
    return Row(
        form_name=form,
        submission_id=sub_id,
        vessel_number=vessel,
        catch_number=catch,
        today=today.strftime("%Y-%m-%d"),
        landing_date=landing.strftime("%Y-%m-%d") if is_ssf else None,
        date_of_landing=None if is_ssf else landing.strftime("%Y-%m-%d"),
        sample_district=district,
        landing_beach=f"{district} beach",
        sample_stratum="A",
        sample_day="1",
        gps_location="-14.02 34.85 480 5" if is_ssf else None,
        gps_location_001=None if is_ssf else "-13.70 34.61 470 4",
        fishing_today=fishing if is_ssf else None,
        fishing=None if is_ssf else fishing,
        why_not_fishing="wind other" if fishing == "no" and is_ssf else None,
        why_not="rain wind" if fishing == "no" and not is_ssf else None,
        if_other=None,
        n_vessels=str(rng.randint(1, 30)) if is_ssf else None,
        total_landings=None if is_ssf else str(rng.randint(1, 30)),
        vessel_type="B+E" if (vessel or 0) % 2 else "Dugout Canoe",
        crew_number=crew,
        crew_female=str(rng.randint(0, 3)) if vessel else None,
        hours_fished=str(rng.randint(1, 12)) if vessel else None,
        imei_number=imei,
        gear_type=gear,
        gear_type_other=None,
        gear_mesh_size="25" if is_ssf and gear == "Gillnet" else None,
        gear_mesh_size_mm="30" if not is_ssf and gear == "Gillnet" else None,
        gear_depth="8" if is_ssf else None,
        gear_depth_m=None if is_ssf else "9",
        num_hauls=str(rng.randint(1, 6)) if gear == "Fish Trap" else None,
        longline_effort_hooks=str(rng.randint(50, 400)) if gear == "Longline" else None,
        longline_effort_hrs=str(rng.randint(1, 10)) if gear == "Longline" else None,
        handline_effort_hooks=str(rng.randint(1, 10)) if gear == "Handline" else None,
        handline_effort_hrs=str(rng.randint(1, 10)) if gear == "Handline" else None,
        mosquito_effort_sets=str(rng.randint(1, 5)) if gear == "Mosquito net" else None,
        kambuzi_effort_sets=str(rng.randint(1, 5)) if gear == "Kambuzi seine" else None,
        chilimira_hauls=str(rng.randint(1, 8)) if gear == "Chilimira" else None,
        trader_sex="female" if is_ssf else None,
        buyer_sex=None if is_ssf else "male",
        transport_mode=None,
        trans=str(rng.randint(1, 4)),
        transothers=None,
        dest="local market",
        value_species=str(price) if price is not None else None,
        value_type="total" if (catch or 0) % 2 else "per_kg",
        catch_use="sell",
        fish_species=taxon,
        fish_species_other="  Mixed Tilapia " if taxon == "Other-Tilapia" else None,
        weight=str(kg) if kg is not None and not is_ssf else None,
        weight_kg=str(kg) if kg is not None and is_ssf else None,
        weight_type="total" if (catch or 0) % 2 else "sample",
        gillnets=gillnets,
    )


def trips_df(spark: SparkSession):
    """F4 — PDS trip summaries. Includes: exactly-one-trip (imei, day) pairs
    (merge survivors), a 2-trip day (dropped by uniqueness guard), and a UTC
    timestamp near midnight whose Blantyre civil date rolls forward."""
    rows = [
        # unique match: Ended 2024-03-05 10:00 UTC -> Blantyre same day
        Row(Trip=101, IMEI="861111030002222", Device="d2", Boat="Chambo1",
            Community="Chembe", Started=D(2024, 3, 5, 4, 0), Ended=D(2024, 3, 5, 10, 0)),
        # tz day boundary: Ended 22:30 UTC = 00:30 next day in Blantyre
        Row(Trip=102, IMEI="861111030001111", Device="d1", Boat="Mwera",
            Community="Msaka", Started=D(2024, 3, 6, 16, 0), Ended=D(2024, 3, 6, 22, 30)),
        # two trips same (imei, day) -> both dropped by uniqueness guard
        Row(Trip=103, IMEI="861111030005555", Device="d5", Boat="Usipa5",
            Community="Salima", Started=D(2024, 3, 8, 3, 0), Ended=D(2024, 3, 8, 9, 0)),
        Row(Trip=104, IMEI="861111030005555", Device="d5", Boat="Usipa5",
            Community="Salima", Started=D(2024, 3, 8, 11, 0), Ended=D(2024, 3, 8, 15, 0)),
        # trip with no matching landing
        Row(Trip=105, IMEI="861111039999999", Device="d3", Boat="TwinA",
            Community="Monkey Bay", Started=D(2024, 3, 9, 3, 0), Ended=D(2024, 3, 9, 8, 0)),
    ]
    df = spark.createDataFrame(rows)
    for c in ["Duration (Seconds)", "Range (Meters)", "Distance (Meters)"]:
        df = df.withColumn(c, F_lit_null_double())
    return df


def F_lit_null_double():
    from pyspark.sql import functions as F
    return F.lit(None).cast("double")


def points_df(spark: SparkSession):
    """F5 — GPS pings: 40 pings/trip at 60s cadence spanning >3 buckets."""
    rows = []
    for trip, start in [(101, D(2024, 3, 5, 4, 0)), (102, D(2024, 3, 6, 16, 0))]:
        for i in range(40):
            rows.append(Row(
                Trip=trip, Time=start + dt.timedelta(seconds=60 * i),
                Lat=-14.0 - trip * 0.001 - i * 0.0001,
                Lng=34.8 + i * 0.0002,
            ))
    return spark.createDataFrame(rows)
