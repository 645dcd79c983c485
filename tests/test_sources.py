"""Offline tests for the source connectors (SURVEY §2.1 S1–S5): landing-zone
JSON with corrupt-record absorption, distributed per-trip CSV fan-out with an
injected fetcher, and the all-string device registry."""

import json

from pyspark.sql import functions as F

from peskas_malawi_data_pipeline_spark.sources import kobo, pds, sheets


def test_kobo_landed_json_drops_corrupt(spark, tmp_path):
    path = str(tmp_path / "subs.jsonl")
    kobo.land_submissions(
        [{"_id": "S1", "today": "2024-03-01", "n_boats": "3"},
         {"_id": "S2", "today": "2024-03-02", "n_boats": "1"}], path)
    with open(path, "a") as fh:
        fh.write("{this is not json\n")

    df = kobo.read_landed_json(
        spark, path, schema="_id string, today string, n_boats string, "
                            "_corrupt_record string")
    rows = {r["_id"] for r in df.collect()}
    assert rows == {"S1", "S2"}  # corrupt line absorbed, not fatal

    kept = kobo.read_landed_json(
        spark, path, schema="_id string, today string, n_boats string, "
                            "_corrupt_record string", drop_corrupt=False)
    # Spark disallows filtering raw JSON on the corrupt column alone; a
    # cache materializes the parse first (the documented audit pattern).
    kept.cache()
    try:
        assert kept.filter(F.col("_corrupt_record").isNotNull()).count() == 1
    finally:
        kept.unpersist()


def _submission(form, i, **extra):
    """One nested Kobo submission using the pinned full-path field names."""
    gv = "group_vessel_data"
    if form == "Malawi SSF":
        return {
            "_id": i, "today": "2024-03-02",
            "group_location/date_of_landing": "2024-03-01",
            "group_location/landing_beach": "beach-b",
            "group_location/gps_location_001": "-13.70 34.61 470 4",
            "fishing": "yes", "total_landings": "2",
            "vessels": [{
                "vessels/vessel_type": "Dugout Canoe",
                "vessels/crew_number": "2",
                "vessels/gear_type": "Chilimira",
                "vessels/chilimira_hauls": "4",
                "vessels/group_gillnets": [
                    {"net_type": "a", "gillnet_mesh": "25", "gillnet_length": "100"}],
                "vessels/fish_repeat": [{
                    "vessels/group_species/fish_species": "Usipa",
                    "vessels/group_species/weight": "5",
                    "vessels/group_species/value_species": "1000",
                    "vessels/group_species/value_type": "total",
                }],
            }],
        }
    sub = {
        "_id": i, "today": "2024-03-02",
        "group_location/landing_date": "2024-03-01",
        "group_location/landing_beach": "beach-a",
        "group_location/gps_location": "-13.50 34.50 470 4",
        "fishing_today": "yes", "n_vessels": "1",
        gv: [{
            f"{gv}/group_vessel/vessel_type": "B+E",
            f"{gv}/group_vessel/crew_number": "3",
            f"{gv}/group_gear/gear_type": "Longline",
            f"{gv}/group_catch": [{
                "fish_species": "Chambo",
                "weight_kg" if form != "FISHERIES eCAS DATA" else "weight": "3",
                "value_species": "600", "value_type": "per_kg",
            }],
            **extra,
        }],
    }
    return sub


def test_schema_pinned_ingest_all_five_forms(spark, tmp_path):
    """SURVEY §7.1 step 1: every form version reads through its pinned
    StructType (no inference), and the per-form effort fields route to the
    right canonical gear column end-to-end."""
    from peskas_malawi_data_pipeline_spark.plans import ingest, preprocess

    gv = "group_vessel_data"
    subs = {
        "FISHERIES eCAS DATA": _submission(
            "FISHERIES eCAS DATA", 1,
            **{f"{gv}/group_gear/longline_effort_hooks": "120",
               f"{gv}/group_gear/longline_effort_hrs": "6"}),
        "FieldDataApp-2024": _submission(
            "FieldDataApp-2024", 2,
            **{f"{gv}/gear_data/longline_effort": "80",
               f"{gv}/group_gear/chilimira_effort": "7"}),
        "FieldDataApp-2024A": _submission(
            "FieldDataApp-2024A", 3,
            **{f"{gv}/group_gear/chikwekwesa_effort": "55"}),
        "FieldDataApp-2023F": _submission(
            "FieldDataApp-2023F", 4,
            **{f"{gv}/gear_data/handline_effort": "9"}),
        "Malawi SSF": _submission("Malawi SSF", 5),
    }
    paths = {}
    for form, sub in subs.items():
        p = str(tmp_path / f"{form.replace(' ', '_')}.jsonl")
        kobo.land_submissions([sub], p)
        paths[form] = p
    # corrupt line in one landing file is absorbed, not fatal
    with open(paths["FieldDataApp-2024"], "a") as fh:
        fh.write("{not json\n")

    raw = ingest.ingest_landed_forms(spark, paths)
    out = {r.form_name: r for r in
           preprocess.preprocess_landings(raw).collect()}
    assert set(out) == set(subs)
    assert out["FISHERIES eCAS DATA"].gear_n_hooks == 120.0
    assert out["FISHERIES eCAS DATA"].gear_hrs == 6.0
    assert out["FieldDataApp-2024"].gear_n_hooks == 80.0
    assert out["FieldDataApp-2024"].gear_hrs == 7.0        # Q2 typo'd column path
    assert out["FieldDataApp-2024A"].gear_length == 55.0   # chikwekwesa -> length
    assert out["FieldDataApp-2023F"].gear_hrs == 9.0       # handline_effort
    ssf = out["Malawi SSF"]
    assert ssf.gear_n_hauls == 4.0                         # chilimira_hauls
    assert ssf.landing_site == "beach-b"
    assert ssf.lat == -13.70 and ssf.catch_kg == 5.0
    assert ssf.gillnets[0].gillnet_mesh_mm == 25.0


def test_schema_pinned_ingest_is_volume_independent(spark, tmp_path):
    """The pinned read yields the same column set whether the landing file
    is empty or populated — inference would collapse an empty batch."""
    from peskas_malawi_data_pipeline_spark.plans import ingest

    empty = str(tmp_path / "empty.jsonl")
    open(empty, "w").close()
    full = str(tmp_path / "full.jsonl")
    kobo.land_submissions([_submission("FieldDataApp-2024", 9)], full)

    cols_empty = ingest.ingest_landed_forms(
        spark, {"FieldDataApp-2024": empty}).columns
    cols_full = ingest.ingest_landed_forms(
        spark, {"FieldDataApp-2024": full}).columns
    assert cols_empty == cols_full


def test_pds_trip_point_fanout(spark, tmp_path):
    trips_csv = tmp_path / "trips.csv"
    trips_csv.write_text(
        "Trip,IMEI,Device,Boat,Community,Started,Ended,Duration (Seconds),"
        "Range (Meters),Distance (Meters),Last Seen,Tags\n"
        "101,123456789,D1,B1,C1,2024-03-01 05:00:00,2024-03-01 09:00:00,"
        "14400,1000.0,5000.0,2024-03-01 09:05:00,\n"
        "102,999999999,D2,B2,C2,2024-03-02 05:00:00,2024-03-02 08:00:00,"
        "10800,800.0,4000.0,2024-03-02 08:05:00,\n")
    trips = pds.read_trips_csv(spark, str(trips_csv))
    assert trips.count() == 2
    assert dict(trips.dtypes)["Started"] == "timestamp"

    points_dir = tmp_path / "points"
    points_dir.mkdir()
    (points_dir / "101.csv").write_text(
        "Time,Lat,Lng,Speed (M/S),Range (Meters),Heading,Boat,Boat Name,Community\n"
        "2024-03-01 05:01:00,-13.1,34.2,2.5,10.0,90.0,B1,Boat One,C1\n"
        "2024-03-01 05:02:00,-13.2,34.3,2.6,11.0,91.0,B1,Boat One,C1\n")
    # trip 102 has no file: the fetch fails quietly and yields zero rows
    points = pds.fetch_trip_points(trips, pds.local_dir_fetcher(str(points_dir)))
    got = points.collect()
    assert len(got) == 2
    assert {r["Trip"] for r in got} == {101}
    assert dict(points.dtypes)["Time"] == "timestamp"


def test_devices_registry_all_string(spark, tmp_path):
    reg_csv = tmp_path / "devices.csv"
    reg_csv.write_text("IMEI,device_id,boat_name,community,status\n"
                       "123456789012345,D1,Boat One,C1,active\n")
    reg = sheets.read_devices_csv(spark, str(reg_csv))
    assert all(t == "string" for _, t in reg.dtypes)
    assert reg.count() == 1


def test_config_profiles_and_env_interpolation(tmp_path, monkeypatch):
    """S6 — YAML config: env interpolation with defaults, profile deep-merge
    (reference config::get + R_CONFIG_ACTIVE, R/utils.R:65-77)."""
    from peskas_malawi_data_pipeline_spark.core.config import load_config

    cfg = tmp_path / "config.yml"
    cfg.write_text(
        "default:\n"
        "  storage:\n"
        "    path: ${DATA_ROOT:/tmp/data}\n"
        "    collection: raw\n"
        "  k_nfishers: 3\n"
        "production:\n"
        "  storage:\n"
        "    path: ${DATA_ROOT}\n")
    monkeypatch.delenv("DATA_ROOT", raising=False)
    base = load_config(str(cfg))
    assert base["storage"]["path"] == "/tmp/data"  # env default
    assert base["k_nfishers"] == 3

    monkeypatch.setenv("DATA_ROOT", "s3://bucket/landing")
    prod = load_config(str(cfg), profile="production")
    assert prod["storage"]["path"] == "s3://bucket/landing"  # interpolated
    assert prod["storage"]["collection"] == "raw"            # deep-merged
    assert prod["k_nfishers"] == 3


def test_custom_datasource_matches_pinned_reader(spark, tmp_path):
    """The Spark-4 Python DataSource (`format("kobo_jsonl")`) yields the
    same rows as the pinned-schema JSON reader, with one input partition
    per landing file and corrupt-line absorption."""
    from peskas_malawi_data_pipeline_spark.sources.jsonl_source import (
        register_kobo_source)

    register_kobo_source(spark)
    land = tmp_path / "zone"
    land.mkdir()
    subs = [_submission("FieldDataApp-2024", i) for i in (1, 2, 3)]
    (land / "a.jsonl").write_text(json.dumps(subs[0]) + "\n{corrupt\n")
    (land / "b.jsonl").write_text("\n".join(json.dumps(s) for s in subs[1:]) + "\n")

    ds = (spark.read.format("kobo_jsonl")
          .option("path", str(land))
          .option("form", "FieldDataApp-2024").load())
    assert ds.rdd.getNumPartitions() == 2          # one per landing file
    assert {r["_id"] for r in ds.collect()} == {1, 2, 3}

    ref = kobo.read_form_json(
        spark, str(land / "*.jsonl"), "FieldDataApp-2024")
    # same names and types; the PERMISSIVE JSON reader force-nullables
    # every field, so nullability flags are not compared
    assert ds.schema.simpleString() == ref.schema.simpleString()
    a = {tuple(str(v) for v in r) for r in ds.collect()}
    b = {tuple(str(v) for v in r) for r in ref.collect()}
    assert a == b

    empty = tmp_path / "empty_zone"
    empty.mkdir()
    ds0 = (spark.read.format("kobo_jsonl")
           .option("path", str(empty))
           .option("form", "FieldDataApp-2024").load())
    assert ds0.count() == 0 and ds0.schema == ds.schema


def test_custom_datasource_coerces_stringly_typed_scalars(spark, tmp_path):
    """Kobo answers are stringly typed, but clients sometimes send raw JSON
    numbers/booleans. Both S1 read paths must agree: the PERMISSIVE JSON
    reader renders them as their JSON text for StringType fields, and the
    Python DataSource coerces identically instead of yielding int/bool into
    a string column (which breaks at the Arrow conversion)."""
    from peskas_malawi_data_pipeline_spark.sources.jsonl_source import (
        register_kobo_source)

    register_kobo_source(spark)
    land = tmp_path / "zone"
    land.mkdir()
    sub = _submission("FieldDataApp-2024", 1)
    sub["n_vessels"] = 2            # JSON number in a string-typed answer
    sub["fishing_today"] = True     # JSON boolean likewise
    (land / "a.jsonl").write_text(json.dumps(sub) + "\n")

    ds = (spark.read.format("kobo_jsonl")
          .option("path", str(land))
          .option("form", "FieldDataApp-2024").load())
    row = ds.collect()[0]
    assert row["n_vessels"] == "2"
    assert row["fishing_today"] == "true"

    ref = kobo.read_form_json(
        spark, str(land / "*.jsonl"), "FieldDataApp-2024").collect()[0]
    assert (row["n_vessels"], row["fishing_today"]) == \
        (ref["n_vessels"], ref["fishing_today"])


def test_kobo_jsonl_preserves_lexical_number_tokens(spark, tmp_path):
    """Numbers landing in StringType fields keep their raw JSON token —
    "2.50" must not round-trip through float to "2.5", "1e3" must not
    become "1000.0" (PERMISSIVE-reader parity; code-review finding r3)."""
    import json as _json

    from peskas_malawi_data_pipeline_spark.sources import kobo
    from peskas_malawi_data_pipeline_spark.sources.jsonl_source import (
        register_kobo_source)

    register_kobo_source(spark)
    land = tmp_path / "zone_lex"
    land.mkdir()
    sub = _submission("FieldDataApp-2024", 1)
    (land / "a.jsonl").write_text(
        _json.dumps(sub).replace('"n_vessels": "1"', '"n_vessels": 2.50')
        .replace('"fishing_today": "yes"', '"fishing_today": 1e3') + "\n")

    ds = (spark.read.format("kobo_jsonl")
          .option("path", str(land))
          .option("form", "FieldDataApp-2024").load())
    row = ds.collect()[0]
    assert row["n_vessels"] == "2.50"
    assert row["fishing_today"] == "1e3"

    ref = kobo.read_form_json(
        spark, str(land / "*.jsonl"), "FieldDataApp-2024").collect()[0]
    assert (row["n_vessels"], row["fishing_today"]) == \
        (ref["n_vessels"], ref["fishing_today"])
