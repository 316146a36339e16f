"""Video-record JSON source/sink (S4/S5, FIXTURES.md §1.4).

The reference stores one pretty-printed JSON file per video under
``raw/{year}/{month}/{video_id}.json`` (ref processing.py:22-32,54-55)
and scans them with ``rglob`` (ref fetch_raw_data.py:60-62). Spark form:
``recursiveFileLookup`` + ``multiLine`` JSON read with an EXPLICIT
schema — schema inference at 100 TB means a full extra pass, so the
record schema is pinned here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Raw transcript snippet (pre-chunk): ref extractors/utils/types.py:18-21
RAW_SNIPPET_SCHEMA = ArrayType(
    StructType(
        [
            StructField("text", StringType()),
            StructField("start", DoubleType()),
            StructField("duration", DoubleType()),
        ]
    )
)

# CompleteVideoRecord: ref core/types.py:11-12, extractors/utils/types.py:11-28
VIDEO_RECORD_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("video_id", StringType()),
        StructField("show_name", StringType()),
        StructField("hosts", ArrayType(StringType())),
        StructField("title", StringType()),
        StructField("description", StringType()),
        StructField("published_at", LongType()),
        StructField("duration", LongType()),
        StructField(
            "transcript_chunks",
            ArrayType(
                StructType(
                    [
                        StructField("text", StringType()),
                        StructField("start", DoubleType()),
                    ]
                )
            ),
        ),
    ]
)


def read_video_records(
    spark: SparkSession,
    path: str,
    schema: StructType = VIDEO_RECORD_SCHEMA,
    multi_line: bool = False,
) -> DataFrame:
    """Recursive JSON scan with pinned schema (S4).

    ``multi_line=False`` (default) reads line-delimited JSON — the
    engine's own sink format and the only splittable/scalable layout.
    Pass ``multi_line=True`` to ingest the reference's pretty-printed
    one-record-per-file layout (processing.py:54-55 writes indent=4) —
    correct there because each file holds exactly one JSON document."""
    return (
        spark.read.schema(schema)
        .option("recursiveFileLookup", "true")
        .option("multiLine", str(multi_line).lower())
        .json(path)
    )


def with_partition_columns(df: DataFrame, epoch_col: str = "published_at") -> DataFrame:
    """Derive year / zero-padded month partition columns from epoch
    seconds (F13; ref processing.py:22-28)."""
    ts = F.timestamp_seconds(F.col(epoch_col))
    return df.withColumns(
        {
            "year": F.year(ts),
            "month": F.lpad(F.month(ts).cast("string"), 2, "0"),
        }
    )


def write_partitioned_json(
    df: DataFrame, path: str, epoch_col: str = "published_at", mode: str = "overwrite"
) -> None:
    """Partitioned JSON sink, ``{path}/year=Y/month=MM/part-*.json``
    (S5). The reference writes one file per video; at scale one file per
    (year, month, task) is the right grain — the record layout inside is
    identical."""
    out = df if "year" in df.columns else with_partition_columns(df, epoch_col)
    out.write.mode(mode).partitionBy("year", "month").json(path)
