"""JDBC source/sink wrappers (S1/S2/S10/S11).

The reference's relational edges are MySQL (catalog source,
ref database.py:20-131) and Postgres/pgvector (embedding sink + metadata
scans, ref loaders/utils/helpers/database.py). Spark's JDBC data source
covers both; these wrappers pin the options that matter at scale:

* **pushdown via query**: the reference pushes ``channel_id < 3`` into
  its export SELECT (database.py:70-71) — ``read_query`` does the same
  with the ``query`` option, so the predicate runs in the database.
* **parallel reads**: ``partition_column/num_partitions`` split the read
  into concurrent range scans — without them a JDBC read is one task.
* **batched writes**: ``batchsize`` mirrors the reference's insert
  batching (BATCH_SIZE=256, loaders/utils/config.py:14).

The call path is the stock ``spark.read.format("jdbc")`` one, and it
is integration-tested LIVE against embedded Derby (the in-JVM database
Spark ships for its metastore) in tests/test_jdbc_integration.py:
write/read round trip, database-side query pushdown, parallel
range-partitioned scans, batched writes. Only the Postgres-specific
JSONB resume scan (S11) stays construction-tested — Derby has no JSONB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, DataFrameReader, SparkSession


def _base_reader(spark: SparkSession, url: str, props: dict[str, str] | None) -> DataFrameReader:
    reader = spark.read.format("jdbc").option("url", url)
    for k, v in (props or {}).items():
        reader = reader.option(k, v)
    return reader


def read_table(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
    properties: dict[str, str] | None = None,
) -> DataFrame:
    """Whole-table scan (S1). With ``partition_column`` + bounds the scan
    parallelizes into ``num_partitions`` range queries."""
    reader = _base_reader(spark, url, properties).option("dbtable", table)
    if partition_column:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions or 8))
        )
    return reader.load()


def read_query(
    spark: SparkSession,
    url: str,
    query: str,
    properties: dict[str, str] | None = None,
) -> DataFrame:
    """Pushed-down SELECT (S1): the query executes database-side, so
    filters/projections in it never cross the wire (the reference's
    ``WHERE channel_id < 3`` export shape)."""
    return _base_reader(spark, url, properties).option("query", query).load()


def write_table(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    batch_size: int = 256,
    properties: dict[str, str] | None = None,
) -> None:
    """Batched JDBC sink (S2/S10). ``batch_size`` mirrors the reference's
    pgvector insert batches; for true upsert semantics stage to a temp
    table and MERGE database-side (Spark JDBC has no native upsert)."""
    writer = df.write.format("jdbc").option("url", url).option("dbtable", table).option(
        "batchsize", str(batch_size)
    )
    for k, v in (properties or {}).items():
        writer = writer.option(k, v)
    writer.mode(mode).save()


def pgvector_resume_keys(
    spark: SparkSession,
    url: str,
    collection: str,
    properties: dict[str, str] | None = None,
) -> DataFrame:
    """S11: the store-contents resume set — (video_id, start_time) pairs
    already embedded (ref loaders/utils/helpers/database.py:13-50 reads
    cmetadata JSONB). The JSON extraction is pushed into Postgres."""
    collection = collection.replace("'", "''")  # SQL-literal escape
    q = f"""
        SELECT e.cmetadata ->> 'video_id'               AS video_id,
               (e.cmetadata ->> 'start_time')::float8    AS start_time
        FROM langchain_pg_embedding e
        JOIN langchain_pg_collection c ON e.collection_id = c.uuid
        WHERE c.name = '{collection}'
    """
    return read_query(spark, url, q, properties)


def resume_keys_from_json(
    spark: SparkSession,
    url: str,
    collection: str,
    embedding_table: str = "langchain_pg_embedding",
    collection_table: str = "langchain_pg_collection",
    metadata_col: str = "cmetadata",
    properties: dict[str, str] | None = None,
) -> DataFrame:
    """S11, backend-portable arm: resume keys from a VARCHAR/TEXT JSON
    metadata column. Where :func:`pgvector_resume_keys` pushes the
    ``->>`` JSONB extraction into Postgres, this twin pushes only the
    collection-name join database-side and extracts the JSON fields in
    Spark with ``get_json_object`` — the path for any JDBC backend
    without JSONB operators (and the one integration-tested LIVE
    against embedded Derby in tests/test_jdbc_integration.py:
    scan -> JSON-extract -> composite-key anti join).

    COLUMN names are quoted (Spark's JDBC writer creates them
    case-preserving, so Derby needs the quotes back and Postgres
    accepts them identically); TABLE names stay unquoted, matching how
    ``write_table``'s ``dbtable`` option creates them (Derby folds to
    upper case, Postgres to lower — unquoted references resolve in
    both)."""
    import re

    from pyspark.sql import functions as F

    # The table/column names are interpolated as SQL identifiers —
    # restrict them to plain identifier characters so a crafted name
    # can't escape the quoting; the collection VALUE is a string
    # literal, so doubling single quotes suffices.
    # Table names may be schema-qualified (each dot-separated segment a
    # plain identifier — 'a.' / 'a..b' are rejected, not deferred to an
    # opaque JDBC error); metadata_col is interpolated inside double
    # quotes where a dot would become part of a literal column name, so
    # it must be a single undotted identifier.
    seg = r"[A-Za-z_][A-Za-z0-9_]*"
    for ident in (embedding_table, collection_table):
        if not re.fullmatch(rf"{seg}(\.{seg})*", ident):
            raise ValueError(f"invalid SQL identifier: {ident!r}")
    if not re.fullmatch(seg, metadata_col):
        raise ValueError(f"invalid SQL column identifier: {metadata_col!r}")
    collection = collection.replace("'", "''")
    q = f"""
        SELECT e."{metadata_col}" AS meta
        FROM {embedding_table} e
        JOIN {collection_table} c ON e."collection_id" = c."uuid"
        WHERE c."name" = '{collection}'
    """
    raw = read_query(spark, url, q, properties)
    return raw.select(
        F.get_json_object("meta", "$.video_id").alias("video_id"),
        F.get_json_object("meta", "$.start_time").cast("double").alias("start_time"),
    )


def snapshot_tables(
    spark: SparkSession,
    url: str,
    exports: dict[str, str],
    out_dir: str,
    properties: dict[str, str] | None = None,
    mode: str = "overwrite",
) -> dict[str, int]:
    """Database -> local columnar snapshot (the reference's MySQL ->
    SQLite export, ref extractors/utils/helpers/database.py:20-131,
    re-targeted at parquet — the right local store for an analytics
    engine; a SQLite sink would re-serialize row-wise).

    ``exports`` maps table name -> the SELECT to export (so predicates
    like the reference's ``channel_id < 3`` push into the database,
    database.py:70-71). Each result lands at ``out_dir/<name>.parquet``
    and downstream stages read the snapshot instead of hammering the
    live DB — same isolation the reference's SQLite copy buys. Returns
    per-table row counts. Integration-tested live against embedded
    Derby (tests/test_jdbc_integration.py)."""
    import os

    counts: dict[str, int] = {}
    for name, query in exports.items():
        df = read_query(spark, url, query, properties)
        path = os.path.join(out_dir, f"{name}.parquet")
        df.write.mode(mode).parquet(path)
        counts[name] = spark.read.parquet(path).count()
    return counts
