"""Unit tests for structural operators (N1–N5): flatten, hierarchy explode,
nested array normalization — the Kobo ingest shape."""

from pyspark.sql import Row, functions as F

from peskas_malawi_data_pipeline_spark.operators import structural as S


def _survey_df(spark):
    """Two submissions: one with vessels/catches/gillnets, one with none
    (the placeholder-NA-row branch, R/ingestion.R:224-237)."""
    data = [
        Row(
            _id="sub1",
            loc=Row(district="Mangochi", gps="-14.4 35.2 480 4"),
            vessels=[
                Row(vessel_type="B+E", crew="4",
                    catches=[Row(species="Usipa", weight="12.5"),
                             Row(species="Chambo", weight="3.0")],
                    gillnets=[Row(mesh="25", length="100")]),
                Row(vessel_type="Dugout Canoe", crew="2",
                    catches=[], gillnets=None),
            ],
        ),
        Row(_id="sub2", loc=Row(district="Salima", gps=None), vessels=None),
    ]
    return spark.createDataFrame(data)


def test_flatten_struct_columns_dotted_names(spark):
    df = _survey_df(spark)
    flat = S.flatten_struct_columns(df)
    assert "loc.district" in flat.columns and "loc.gps" in flat.columns
    assert "vessels" in flat.columns  # arrays left intact
    row = flat.filter(F.col("_id") == "sub2").collect()[0]
    assert row["loc.district"] == "Salima" and row["loc.gps"] is None


def test_explode_hierarchy_one_based_indices_and_placeholders(spark):
    df = _survey_df(spark)
    flat = S.flatten_struct_columns(df)
    exploded = S.explode_hierarchy(flat, [("vessels", "vessel_number"),
                                          ("catches", "catch_number")])
    rows = {(r["_id"], r["vessel_number"], r["catch_number"]): r
            for r in exploded.collect()}
    # sub1 vessel 1 has catches 1 and 2 (1-based)
    assert rows[("sub1", 1, 1)]["species"] == "Usipa"
    assert rows[("sub1", 1, 2)]["species"] == "Chambo"
    # survey- and vessel-level fields replicate onto catch rows (W4)
    assert rows[("sub1", 1, 2)]["loc.district"] == "Mangochi"
    assert rows[("sub1", 1, 2)]["vessel_type"] == "B+E"
    # vessel with no catches -> placeholder row with NULL catch fields
    assert ("sub1", 2, None) in rows and rows[("sub1", 2, None)]["species"] is None
    # submission with no vessels -> single survey-only row
    assert ("sub2", None, None) in rows
    assert len(rows) == 4


def test_index_array_of_struct(spark):
    df = _survey_df(spark)
    out = df.withColumn("vessels", S.index_array_of_struct(F.col("vessels"), "vessel_number"))
    v = out.filter(F.col("_id") == "sub1").collect()[0]["vessels"]
    assert [x["vessel_number"] for x in v] == [1, 2]
    # NULL array stays NULL
    assert out.filter(F.col("_id") == "sub2").collect()[0]["vessels"] is None


def test_normalize_array_of_struct_coalesce_and_cast(spark):
    # gillnets fixup (N5): variant field names coalesce, numerics cast,
    # missing fields become NULL (R/preprocessing.R:320-354).
    df = spark.createDataFrame(
        [Row(id=1, gillnets=[Row(gillnet_mesh="25", gillnet_mesh_mm=None,
                                 net_type=7)]),
         Row(id=2, gillnets=[Row(gillnet_mesh=None, gillnet_mesh_mm="30",
                                 net_type=None)])])
    out = S.normalize_array_of_struct(df, "gillnets", {
        "net_type": (["net_type"], "string"),
        "gillnet_mesh_mm": (["gillnet_mesh_mm", "gillnet_mesh"], "double"),
        "gillnet_length_m": (["gillnet_length_m", "gillnet_length"], "double"),
    })
    rows = {r.id: r.gillnets[0] for r in out.collect()}
    assert rows[1]["gillnet_mesh_mm"] == 25.0 and rows[1]["net_type"] == "7"
    assert rows[2]["gillnet_mesh_mm"] == 30.0
    assert rows[1]["gillnet_length_m"] is None
    schema = dict((f.name, f.dataType.elementType.simpleString())
                  for f in out.schema.fields if f.name == "gillnets")
    assert "gillnet_length_m:double" in schema["gillnets"]
