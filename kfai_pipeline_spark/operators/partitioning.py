"""Partitioning & skew toolkit (SURVEY §4 'hard parts': skewed keys,
co-located joins).

AQE's skew-join splitting handles most skew automatically
(session.py enables it); these operators cover the two cases AQE
can't:

* ``salted_join`` — when one join key is pathologically hot (the
  reference's analog: a 10-hour video exploding into thousands of
  chunks). The hot side gets a deterministic salt in [0, n); the other
  side is replicated n times. The shuffle then spreads the hot key over
  n reducers. Use only for the skewed keys — pass ``hot_keys`` to salt
  selectively and join the rest normally.
* ``write_bucketed`` / bucketed tables — repeated large-large joins on
  the same key (fact-fact at 100 TB) amortize their shuffle by
  pre-bucketing both sides: Spark's bucketed scan emits the required
  hash partitioning, so the join plans with NO Exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
    salt_source: str | None = None,
) -> DataFrame:
    """Skew-spreading equi join: ``left`` (the big/skewed side) gets a
    salt derived from ``salt_source`` (any high-cardinality column;
    defaults to the whole row via monotonically_increasing_id), ``right``
    is replicated ``n_salts`` times. Result == plain ``left.join(right,
    key, how)`` for inner/left joins."""
    salt = (
        F.pmod(F.xxhash64(F.col(salt_source)), F.lit(n_salts))
        if salt_source
        else F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts))
    )
    salted_left = left.withColumn("__salt", salt.cast("int"))
    replicated_right = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = salted_left.join(replicated_right, [key, "__salt"], how)
    return out.drop("__salt")


def split_skew_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    hot_keys: list,
    n_salts: int = 16,
    salt_source: str | None = None,
) -> DataFrame:
    """Selective skew handling: hot keys take the salted path, the rest
    join normally; results union. This is the manual form of AQE's
    skew-join split for when key skew is known ahead of time."""
    hot_left = left.where(F.col(key).isin(hot_keys))
    cold_left = left.where(~F.col(key).isin(hot_keys))
    hot_right = right.where(F.col(key).isin(hot_keys))
    cold_right = right.where(~F.col(key).isin(hot_keys))
    return salted_join(hot_left, hot_right, key, n_salts, "inner", salt_source).unionByName(
        cold_left.join(cold_right, key, "inner")
    )


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_key: str,
    n_buckets: int = 32,
    sort_key: str | None = None,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Persist as a bucketed (and optionally sorted) table — managed,
    or external when ``path`` is given (keeps the data out of the
    session warehouse dir; the bucketing metadata lives in the catalog
    either way). Both sides of a repeated join bucketed on the same key
    with the same bucket count join with zero Exchange."""
    writer = df.write.format("parquet").mode(mode).bucketBy(n_buckets, bucket_key)
    if sort_key:
        writer = writer.sortBy(sort_key)
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def bucketed_join_ready(spark: SparkSession, table_a: str, table_b: str, key: str) -> DataFrame:
    """Join two same-bucketed tables on their bucket key (shuffle-free)."""
    return spark.table(table_a).join(spark.table(table_b), key)
