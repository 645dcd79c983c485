"""End-to-end CLI DAG test: all six stages chained through a parquet
lakehouse exactly as an external scheduler would run them (SURVEY §7.0
CLI/DAG-parity; reference data-pipeline.yaml needs: edges)."""

import json

from peskas_malawi_data_pipeline_spark.cli import run_stage


def _land(tmp_path):
    landing = tmp_path / "landing"
    landing.mkdir()
    # dialect A: vessels under group_vessel_data, catches under group_catch
    (landing / "FieldDataApp-2024.jsonl").write_text("\n".join(json.dumps(s) for s in [
        {"_id": "A1", "today": "2024-03-05",
         "date_of_landing": "2024-03-05", "sample_district": "Mangochi",
         "group_vessel_data": [
             {"vessel_type": "B+E", "crew_number": "4",
              "imei_number": "30002222", "gear_type": "Gillnet",
              "group_catch": [{"fish_species": "Usipa", "weight": "5.5",
                               "value_species": "8000", "value_type": "total",
                               "weight_type": "total"}],
              "group_gillnets": [{"net_type": "A", "gillnet_mesh": "25"}]}]},
        {"_id": "A2", "today": "2024-03-06", "date_of_landing": "2024-03-06",
         "sample_district": "Salima", "group_vessel_data": []},
    ]) + "\n")
    # dialect B ("Malawi SSF"): vessels array, fish_repeat catches
    (landing / "Malawi SSF.jsonl").write_text("\n".join(json.dumps(s) for s in [
        {"_id": "B1", "today": "2024-03-07", "landing_date": "2024-03-07",
         "sample_district": "Nkhotakota",
         "vessels": [
             {"vessel_type": "Dugout Canoe", "crew_number": "2",
              "imei_number": "30001111", "gear_type": "Handline",
              "fish_repeat": [{"fish_species": "Chambo", "weight_kg": "2.0",
                               "value_species": "5000", "value_type": "per_kg",
                               "weight_type": "sample"},
                              {"fish_species": "Utaka", "weight_kg": "1.0",
                               "value_species": "2000", "value_type": "per_kg",
                               "weight_type": "sample"}]}]},
    ]) + "\n")
    (landing / "trips.csv").write_text(
        "Trip,IMEI,Device,Boat,Community,Started,Ended,Duration (Seconds),"
        "Range (Meters),Distance (Meters),Last Seen,Tags\n"
        "201,861111030002222,D1,B1,C1,2024-03-05 04:00:00,2024-03-05 10:00:00,"
        "21600,1000.0,5000.0,2024-03-05 10:05:00,\n")
    (landing / "devices.csv").write_text(
        "IMEI,device_id,boat_name,community,status\n"
        "861111030002222,d2,Chambo1,Chembe,active\n"
        "861111030001111,d1,Mwera,Msaka,active\n")
    (landing / "points.csv").write_text(
        "Trip,Time,Lat,Lng,Speed (M/S),Range (Meters),Heading,Boat,"
        "Boat Name,Community\n" + "\n".join(
            f"201,2024-03-05 04:{i:02d}:00,-14.0{i},34.8,2.0,10.0,90.0,B1,Boat,C1"
            for i in range(30)))


def test_cli_ingest_pinned_schema_path(spark, tmp_path):
    """`--form NAME=pinned` resolves the form's pinned StructType and
    structural dialect from the registry instead of inferring — the
    production ingest path, runnable per stage from the CLI."""
    import sys
    sys.path.insert(0, "tests")
    from test_sources import _submission

    landing = tmp_path / "landing"
    landing.mkdir()
    (landing / "FieldDataApp-2024.jsonl").write_text(
        json.dumps(_submission("FieldDataApp-2024", 1)) + "\n")
    (landing / "Malawi SSF.jsonl").write_text(
        json.dumps(_submission("Malawi SSF", 2)) + "\n")

    n = run_stage(spark, "ingest", str(tmp_path),
                  forms={"FieldDataApp-2024": "pinned", "Malawi SSF": "pinned"})
    assert n == 2
    assert run_stage(spark, "preprocess", str(tmp_path)) == 2


def test_cli_six_stage_dag(spark, tmp_path):
    _land(tmp_path)
    root = str(tmp_path)
    forms = {"FieldDataApp-2024": "dialect_a", "Malawi SSF": "dialect_b"}

    assert run_stage(spark, "ingest", root, forms=forms) == 4  # 1+1(placeholder)+2
    assert run_stage(spark, "preprocess", root) == 4
    assert run_stage(spark, "validate", root) == 4
    n_merged = run_stage(spark, "merge", root)
    assert n_merged == 1            # A1 ↔ trip 201 via registry suffix match
    assert run_stage(spark, "export-landings", root) == 4
    n_tracks = run_stage(spark, "export-tracks", root)
    assert n_tracks == 3            # 30 pings at 60s → 10-minute buckets


def test_cli_ingest_unknown_pinned_form_fails_fast(spark, tmp_path):
    """--form NAME=pinned for a form with no registry entry must raise a
    clear KeyError naming the known forms, not fall through to schema
    inference with a bogus structural dialect."""
    import pytest

    root = tmp_path / "lake"
    (root / "landing").mkdir(parents=True)
    (root / "landing" / "mystery.jsonl").write_text('{"_id": 1}\n')

    for dialect in ("pinned", "auto"):
        with pytest.raises(KeyError, match="mystery"):
            run_stage(spark, "ingest", str(root),
                      forms={"mystery": dialect})
