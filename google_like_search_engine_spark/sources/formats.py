"""Source/sink format layer.

The reference's only "source" is its KVS table scan (kvs/KVSClient.java
streaming row iterator); Spark gives the engine a real format surface.
This module pins schemas explicitly (no runtime inference — inference
is a full extra scan at 100 TB and nondeterministic under schema
drift) and centralizes reader/writer options so every pipeline ingests
the same way.

Formats: parquet (default, columnar, predicate/projection pushdown),
orc (same properties), csv / json (schema-pinned, permissive mode with
a corrupt-record column so bad rows are quarantined, not dropped).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, types as T

PAGES_READ_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), True),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

_CORRUPT_COL = "_corrupt_record"


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: T.StructType | str | None = None,
) -> DataFrame:
    """Schema-pinned read. csv/json require a schema (inference would
    rescan the input); a permissive corrupt-record column is added so
    malformed rows land in quarantine instead of failing the job."""
    fmt = fmt.lower()
    if fmt in ("parquet", "orc"):
        reader = spark.read.format(fmt)
        if schema is not None:
            reader = reader.schema(schema)
        return reader.load(path)
    if fmt in ("csv", "json"):
        if schema is None:
            raise ValueError(f"{fmt} reads require an explicit schema")
        if isinstance(schema, str):
            schema = T._parse_datatype_string(schema)
        if not any(f.name == _CORRUPT_COL for f in schema.fields):
            schema = T.StructType(
                list(schema.fields) + [T.StructField(_CORRUPT_COL, T.StringType(), True)]
            )
        reader = (
            spark.read.format(fmt)
            .schema(schema)
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", _CORRUPT_COL)
        )
        if fmt == "csv":
            reader = reader.option("header", "true").option("escape", '"')
        return reader.load(path)
    raise ValueError(f"unsupported format: {fmt}")


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list | None = None,
) -> None:
    """Format-symmetric writer. Binary columns are not representable in
    csv/json — callers must project them away first (loud error from
    Spark otherwise, which we keep)."""
    writer = df.write.format(fmt.lower()).mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if fmt.lower() == "csv":
        writer = writer.option("header", "true").option("escape", '"')
    writer.save(path)
