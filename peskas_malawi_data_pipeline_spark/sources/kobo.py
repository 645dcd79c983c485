"""KoboToolbox survey source (SURVEY §2.1 S1).

The reference pulls all submissions for an asset from the KPI REST API and
flattens them in an R worker pool (`process_asset`, R/ingestion.R:294-329).
Spark-first design:

- the HTTP fetch is a thin driver-side connector (volumes are tiny: survey
  submissions, not bulk data) that lands raw JSON;
- at scale, submissions land in an object-store directory and are read with
  ``spark.read.json`` + an explicit schema — the parse, flatten, and explode
  then run distributed (operators.structural), not per-row in Python;
- per-submission error absorption (reference `purrr::possibly`,
  R/ingestion.R:296) becomes PERMISSIVE-mode JSON parsing with a
  ``_corrupt_record`` column: malformed submissions are counted and dropped,
  the pipeline continues.
"""

from __future__ import annotations

import json
import urllib.request
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

KOBO_BASE = "https://kf.kobotoolbox.org/api/v2"


def fetch_submissions(asset_id: str, token: str, base_url: str = KOBO_BASE,
                      timeout: int = 60) -> list[dict[str, Any]]:
    """Driver-side REST fetch of all submissions for one asset
    (GET /assets/<id>/data, paginated). Network access is environment-
    dependent; callers normally land the result to storage and use
    :func:`read_landed_json`.
    """
    results: list[dict[str, Any]] = []
    url = f"{base_url}/assets/{asset_id}/data/?format=json"
    while url:
        req = urllib.request.Request(url, headers={"Authorization": f"Token {token}"})
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            payload = json.loads(resp.read().decode("utf-8"))
        results.extend(payload.get("results", []))
        url = payload.get("next")
    return results


def land_submissions(submissions: list[dict[str, Any]], path: str) -> None:
    """Write fetched submissions as JSON-lines — the landing zone the
    distributed reader consumes. One line per submission."""
    with open(path, "w") as fh:
        for sub in submissions:
            fh.write(json.dumps(sub) + "\n")


def read_landed_json(spark: SparkSession, path: str,
                     schema: StructType | None = None,
                     drop_corrupt: bool = True) -> DataFrame:
    """Distributed read of landed submission JSON.

    With ``schema`` the read is schema-pinned (production path — stable
    columns at any volume); without, Spark infers (exploration path).
    PERMISSIVE mode + ``_corrupt_record`` reproduces the reference's
    drop-bad-submissions semantics (R/ingestion.R:296) with an audit count.
    """
    reader = spark.read.option("mode", "PERMISSIVE") \
        .option("columnNameOfCorruptRecord", "_corrupt_record")
    df = reader.json(path, schema=schema) if schema else reader.json(path)
    if drop_corrupt and "_corrupt_record" in df.columns:
        df = df.filter(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    return df


def read_form_json(spark: SparkSession, path: str, form_name: str,
                   drop_corrupt: bool = True) -> DataFrame:
    """Schema-pinned read of one form's landed submissions (SURVEY §7.1
    step 1): resolves the form's pinned StructType from
    :mod:`form_schemas` — no inference, stable columns at any landing-zone
    volume — and keeps the PERMISSIVE corrupt-record absorption."""
    from pyspark.sql.types import StringType, StructField, StructType

    from . import form_schemas as FS

    pinned = FS.form_schema(form_name)
    schema = StructType(list(pinned.fields)
                        + [StructField("_corrupt_record", StringType())])
    return read_landed_json(spark, path, schema=schema,
                            drop_corrupt=drop_corrupt)
