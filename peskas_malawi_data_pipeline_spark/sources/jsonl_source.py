"""Custom PySpark DataSource for Kobo landing zones (Spark 4 Python
Data Source API) — the modern S1 read path.

``spark.read.format("kobo_jsonl")`` with options ``path`` (directory or
file glob of JSON-lines submissions) and ``form`` (one of the five pinned
form versions) reads with the form's pinned StructType and one input
partition per landing file — the partition unit a paginated REST fetch
naturally produces (at scale each partition would be an API page range;
here it's a landed file, keeping the source offline-testable).

Registered with ``register_kobo_source(spark)``; the plain
``read_landed_json`` path (PERMISSIVE JSON reader) remains the default —
this source demonstrates how a first-class connector with its own
partitioning slots into the same pinned-schema contract.
"""

from __future__ import annotations

import glob
import json
import os

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import ArrayType, LongType, StringType, StructType


def _convert(value, dtype):
    """JSON value → tuple-tree matching ``dtype`` (Spark's Python row
    wire shape): structs become field-ordered tuples, missing keys None.
    Scalars are coerced to the pinned type the same way the PERMISSIVE
    JSON reader does — numerics/booleans landing in a StringType field
    (Kobo answers are stringly typed but clients sometimes send numbers)
    become their JSON text, so both S1 read paths agree."""
    if value is None:
        return None
    if isinstance(dtype, StructType):
        return tuple(_convert(value.get(f.name), f.dataType)
                     for f in dtype.fields)
    if isinstance(dtype, ArrayType):
        return [_convert(v, dtype.elementType) for v in value]
    if isinstance(dtype, LongType):
        if isinstance(value, bool):
            return None            # PERMISSIVE parity: bool ≠ long → NULL
        try:
            return int(value)
        except (TypeError, ValueError):
            return None            # PERMISSIVE parity: type mismatch → NULL
    if isinstance(dtype, StringType) and not isinstance(value, str):
        # match the JSON reader: numbers arrive as their exact lexical
        # token (parse_float/parse_int=str below — str(float) would turn
        # "2.50" into "2.5" and "1e3" into "1000.0"); everything else
        # (bool/object/array) renders as JSON text, not Python repr
        return json.dumps(value)
    return value


class KoboJsonlDataSource(DataSource):
    """``format("kobo_jsonl")`` — schema-pinned JSONL submissions."""

    @classmethod
    def name(cls) -> str:
        return "kobo_jsonl"

    def schema(self) -> StructType:
        from . import form_schemas as FS

        return FS.form_schema(self.options["form"])

    def reader(self, schema: StructType) -> "KoboJsonlReader":
        return KoboJsonlReader(schema, self.options["path"])


class KoboJsonlReader(DataSourceReader):
    def __init__(self, schema: StructType, path: str) -> None:
        self.schema_ = schema
        self.path = path

    def partitions(self) -> list[InputPartition]:
        pattern = (os.path.join(self.path, "*.jsonl")
                   if os.path.isdir(self.path) else self.path)
        files = sorted(glob.glob(pattern))
        # one partition per landing file; an empty landing zone still needs
        # one (empty) partition so the scan yields a 0-row frame
        return [InputPartition(f) for f in files] or [InputPartition(None)]

    def read(self, partition: InputPartition):
        if partition.value is None:
            return
        with open(partition.value) as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                try:
                    # numbers parse as their raw text so StringType fields
                    # preserve the lexical token ("2.50" stays "2.50", as
                    # in the PERMISSIVE reader); typed fields re-parse
                    rec = json.loads(line, parse_float=str, parse_int=str)
                except ValueError:
                    continue  # corrupt-line absorption (reference parity)
                try:
                    yield _convert(rec, self.schema_)
                except (AttributeError, TypeError, ValueError):
                    # shape-mismatched record (e.g. a string where the
                    # pinned schema expects array<struct>): absorb and
                    # continue — one malformed submission must not abort
                    # the scan (the PERMISSIVE twin nulls such records)
                    continue


def register_kobo_source(spark) -> None:
    spark.dataSource.register(KoboJsonlDataSource)
