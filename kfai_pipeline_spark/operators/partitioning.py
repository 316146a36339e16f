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


# ---------------------------------------------------------------------------
# Z-order clustering (X46): multi-column scan pruning via Morton layout
# ---------------------------------------------------------------------------


def zvalue(bucket_cols: list, bits: int = 16):
    """Morton (Z-curve) interleave of per-column bucket ids: column j's
    bit i lands at position ``i*n + (n-1-j)``, so all columns' high
    bits dominate jointly and rows close in EVERY dimension get close
    z-values. Pure codegen — ``bits * n_cols`` shift/and/or terms, no
    UDF, plan size O(bits x cols).

    Inputs must already be non-negative bucket ids < 2**bits
    (see :func:`zorder_frame` for the min/max bucketing). ``bits *
    len(bucket_cols)`` must fit a signed long (<= 62).
    """
    from functools import reduce

    n = len(bucket_cols)
    if n == 0:
        raise ValueError("zvalue needs at least one column")
    if bits * n > 62:
        raise ValueError(
            f"bits*cols = {bits * n} overflows a signed long; lower bits"
        )
    terms = []
    for i in range(bits):
        for j, c in enumerate(bucket_cols):
            pos = i * n + (n - 1 - j)
            terms.append(
                F.shiftleft(F.shiftright(c, i).bitwiseAND(F.lit(1)), pos)
            )
    return reduce(lambda a, b: a.bitwiseOR(b), terms)


def zorder_frame(
    df: DataFrame,
    cols: list[str],
    bits: int = 16,
    num_partitions: int | None = None,
    bucketing: str = "linear",
) -> DataFrame:
    """Rows re-clustered along a Z-curve over ``cols`` — the layout
    optimization behind lakehouse ``OPTIMIZE ZORDER BY``: after
    writing, parquet min/max stats prune scans that filter on ANY
    subset of the z columns, where a plain sort prunes only its prefix
    column. Content-preserving by construction: every input row
    appears exactly once (NULL values cluster at bucket 0), only
    order and partition boundaries change.

    Scale shape: per-column min/max is ONE tiny aggregate (2 values x
    cols to the driver, broadcast back as literals); bucket ids and the
    Morton interleave are whole-stage codegen; the final
    ``repartitionByRange`` on the z-value is Spark's own sampled range
    partitioner, so even a skewed z distribution yields balanced
    output files.

    ``bucketing``: ``"linear"`` (default) buckets on min/max — O(1)
    stats, right for roughly-uniform columns, but outlier-sensitive
    (one huge value squashes everyone else into bucket 0, the classic
    z-order caveat). ``"quantile"`` buckets on approxQuantile
    boundaries (capped at 8 effective bits = 255 boundaries): rank-like
    ids that are skew-immune, at the cost of one sampled-quantile pass
    and an O(boundaries) interpreted filter per row at write time —
    write-time only, never query-time.
    """
    if not cols:
        raise ValueError("zorder_frame needs at least one column")
    if bucketing not in ("linear", "quantile"):
        raise ValueError(f"unknown bucketing {bucketing!r}")
    top = (1 << bits) - 1

    # STRING dimensions bucket by hash, not range: min/max-on-a-cast is
    # meaningless (and an ANSI cast crash) for text keys, but z-order
    # pruning on a string column is an EQUALITY story — hash bucketing
    # still CLUSTERS equal values into the same row groups, so per-group
    # min/max stats on the raw string stay tight and `video_id = X`
    # scans prune. Range predicates on string dims are not served.
    from pyspark.sql.types import StringType

    string_cols = {
        c for c in cols if isinstance(df.schema[c].dataType, StringType)
    }

    def _hash_bucket(c: str, hb_top: int):
        # xxhash64(NULL) is the SEED (42), never NULL — an explicit
        # isNull branch pins NULLs to bucket 0 like the numeric arms
        # (round-8 review: a coalesce here was dead code)
        return (
            F.when(F.col(c).isNull(), F.lit(0))
            .otherwise(F.pmod(F.xxhash64(F.col(c)), F.lit(hb_top + 1)))
            .cast("long")
        )

    buckets = []
    if bucketing == "quantile":
        # quantile ids only occupy q_bits, so the interleave (and its
        # bits*cols <= 62 overflow guard) must use q_bits too — passing
        # the caller's `bits` would reject valid wide-column configs
        # and emit dead always-zero interleave terms
        bits = q_bits = min(bits, 8)  # 255 boundaries is plenty of z locality
        n_bounds = (1 << q_bits) - 1
        probs = [(i + 1) / (n_bounds + 1) for i in range(n_bounds)]
        # one sampled pass for every column's boundary list (NULLs are
        # ignored by approxQuantile; NULL rows land in bucket 0 below)
        all_bounds = df.stat.approxQuantile(
            [c for c in cols if c not in string_cols], probs, 0.001
        )
        num_bounds = dict(
            zip([c for c in cols if c not in string_cols], all_bounds)
        )
        top = (1 << bits) - 1  # re-derive after the q_bits clamp
        for c in cols:
            if c in string_cols:
                buckets.append(_hash_bucket(c, top))
                continue
            bounds = num_bounds[c]
            if not bounds:  # empty/all-NULL column
                buckets.append(F.lit(0).cast("long"))
                continue
            barr = F.array(*[F.lit(float(b)) for b in bounds])
            v = F.col(c).cast("double")
            buckets.append(
                F.when(
                    v.isNull(), F.lit(0)
                ).otherwise(F.size(F.filter(barr, lambda b: v >= b))).cast("long")
            )
    else:
        # one global aggregate: 2 doubles per column to the driver (an
        # agg over an empty frame still yields the one all-NULL row,
        # which the NULL-min branch below turns into constant-0 buckets)
        num_cols = [c for c in cols if c not in string_cols]
        row = (
            df.agg(
                *[F.min(F.col(c).cast("double")).alias(f"__mn_{c}") for c in num_cols],
                *[F.max(F.col(c).cast("double")).alias(f"__mx_{c}") for c in num_cols],
            ).collect()[0]
            if num_cols
            else {}
        )
        for c in cols:
            if c in string_cols:
                buckets.append(_hash_bucket(c, top))
                continue
            mn, mx = row[f"__mn_{c}"], row[f"__mx_{c}"]
            if mn is None or mx is None or mx <= mn:
                buckets.append(F.lit(0).cast("long"))
                continue
            frac = (
                F.coalesce(F.col(c).cast("double"), F.lit(mn)) - F.lit(mn)
            ) / F.lit(mx - mn)
            buckets.append(
                F.least(
                    F.floor(frac * F.lit(float(top + 1))), F.lit(top)
                ).cast("long")
            )
    z = df.withColumn("__z", zvalue(buckets, bits))
    parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    return (
        z.repartitionByRange(parts, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )


def _list_data_files(spark: SparkSession, path: str) -> list[tuple[str, int]]:
    """(path, bytes) of every data file under ``path`` (recursive),
    skipping committer/marker files (_SUCCESS, .crc, dotfiles) — via
    the Hadoop FS API so HDFS/S3A paths work like local ones."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    it = fs.listFiles(hpath, True)
    out = []
    while it.hasNext():
        f = it.next()
        name = f.getPath().getName()
        if name.startswith(("_", ".")):
            continue
        out.append((f.getPath().toString(), int(f.getLen())))
    return out


def compact_to(
    spark: SparkSession,
    src: str,
    dest: str,
    target_bytes: int = 128 * 1024 * 1024,
    partition_cols: list[str] | None = None,
) -> dict:
    """Small-file compaction (X48): rewrite the parquet table at
    ``src`` into ``dest`` with ~``target_bytes`` files — the standard
    lakehouse maintenance op (OPTIMIZE / rewrite_data_files). A
    streaming sink or a T-task dynamic-partition write leaves
    thousands of KB-sized files; at 100 TB the per-file open/footer
    cost dominates the scan and the driver's file index bloats, so
    periodic compaction IS part of the table's lifecycle.

    Content-preserving by construction (a plain read -> repartition ->
    write; no sort — compose with :func:`zorder_frame` first when the
    table should also be re-clustered). Writes to a fresh ``dest``
    under Spark's committer, so readers see the new table only behind
    its ``_SUCCESS`` (the committed-read protocol the minhash index
    uses); swapping a serving path to ``dest`` is the caller's pointer
    flip (streaming/rollup.py's version-pointer pattern), NOT an
    in-place rename — two renames are not atomic on any real FS.

    ``partition_cols``: compact WITHIN hive partitions — rows
    repartition BY the partition columns first (the T x k small-file
    lesson: without it every task writes into every partition), so
    each partition's rows land in one-ish task. Caveat: a partition
    bigger than ``target_bytes`` still becomes one file per task that
    holds it; split hot partitions upstream if that matters.

    Returns stats {files_before, bytes, files_after, n_target}.
    """
    files = _list_data_files(spark, src)
    total = sum(b for _, b in files)
    n_out = max(1, -(-total // max(1, target_bytes)))  # ceil
    df = spark.read.parquet(src)
    if partition_cols:
        out = df.repartition(n_out, *partition_cols)
        writer = out.write.mode("overwrite").partitionBy(*partition_cols)
    else:
        out = df.repartition(n_out)
        writer = out.write.mode("overwrite")
    writer.parquet(dest)
    after = _list_data_files(spark, dest)
    return {
        "files_before": len(files),
        "bytes": total,
        "files_after": len(after),
        "n_target": n_out,
    }


def optimize_table(
    spark: SparkSession,
    src: str,
    dest: str,
    zorder_cols: list[str] | None = None,
    target_bytes: int = 128 * 1024 * 1024,
    bits: int = 16,
    bucketing: str = "linear",
    row_group_bytes: int | None = None,
    schema=None,
) -> dict:
    """One-call table maintenance (X50b): the lakehouse ``OPTIMIZE``
    composed from the pieces this engine already ships — compaction
    sizing (X48: output file count = ceil(bytes / target_bytes)),
    optional z-order clustering (X46: cluster + prune on ANY of
    ``zorder_cols``, not just a sort prefix), and table stats — written
    to a fresh ``dest`` under Spark's committer so readers only see the
    optimized copy behind its ``_SUCCESS`` marker. Swapping a serving
    path to ``dest`` is the caller's pointer flip (the
    streaming/rollup.py version-pointer protocol), never an in-place
    rename.

    A real 100 TB lake runs these as ONE periodic operation per table:
    the streaming sink fragments it, ad-hoc writes de-cluster it, and
    scans pay for both until the next OPTIMIZE; doing compaction and
    re-clustering in separate passes reads the table twice for no
    reason. Content-preserving by construction (read -> cluster/
    repartition -> write; both component ops carry their own
    content-equality oracle rows, q116/q118).

    ``schema`` pins the read schema (StructType or DDL). Defaulting to
    the catalog pin for ``src`` (catalog.pinned_schema_for_path) is
    load-bearing, not a convenience: OPTIMIZE is the op you run on
    exactly the multi-vintage tables §5v declared unsafe for
    inference — a two-vintage table with an int32->int64 widened
    column crashes a plain-inference scan at materialization
    ([PARQUET_COLUMN_DATA_TYPE_MISMATCH]), and an added-column table
    reads "successfully" but SILENTLY DROPS the new column from the
    rewritten copy, so the maintenance op would corrupt the very
    tables it exists to heal. With the pin, Spark 4's scan-side type
    widening reads every vintage and the rewrite carries all columns.
    (Two-vintage case exercised in scripts/schema_evolution_sweep.py.)

    Returns {files_before, bytes_before, files_after, bytes_after,
    n_target, n_rows, col_stats} where col_stats maps each zorder_col
    to its (min, max, n_nulls) — the pruning-relevant metadata a table
    catalog would record.
    """
    if schema is None:
        from kfai_pipeline_spark.catalog import pinned_schema_for_path

        schema = pinned_schema_for_path(src)
    files = _list_data_files(spark, src)
    total = sum(b for _, b in files)
    n_out = max(1, -(-total // max(1, target_bytes)))  # ceil
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.parquet(src)
    if zorder_cols:
        out = zorder_frame(
            df, zorder_cols, bits=bits, num_partitions=n_out,
            bucketing=bucketing,
        )
    else:
        out = df.repartition(n_out)
    writer = out.write.mode("overwrite")
    if row_group_bytes:
        writer = writer.option("parquet.block.size", str(row_group_bytes))
    writer.parquet(dest)
    after = _list_data_files(spark, dest)
    # stats over the COMMITTED copy (one aggregate job): what a catalog
    # would record next to the new version's pointer. The dest copy is
    # single-vintage by construction, but read it through the same
    # schema anyway so the recorded stats carry the catalog's types
    # (e.g. the widened int64), not a re-inferred narrower vintage.
    stats_reader = spark.read
    if schema is not None:
        stats_reader = stats_reader.schema(schema)
    written = stats_reader.parquet(dest)
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in zorder_cols or []:
        aggs += [
            F.min(c).alias(f"__mn_{c}"),
            F.max(c).alias(f"__mx_{c}"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"__nl_{c}"),
        ]
    row = written.agg(*aggs).collect()[0]
    return {
        "files_before": len(files),
        "bytes_before": total,
        "files_after": len(after),
        "bytes_after": sum(b for _, b in after),
        "n_target": n_out,
        "n_rows": int(row["__n"]),
        "col_stats": {
            c: {
                "min": row[f"__mn_{c}"],
                "max": row[f"__mx_{c}"],
                # SUM over an empty table is NULL, not 0 (empty sweep)
                "n_nulls": int(row[f"__nl_{c}"] or 0),
            }
            for c in zorder_cols or []
        },
    }


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 16,
    num_partitions: int | None = None,
    row_group_bytes: int | None = None,
    bucketing: str = "linear",
) -> None:
    """Write ``df`` z-ordered by ``cols``. ``row_group_bytes`` caps the
    parquet row-group size — pruning granularity is the row group, so
    at a fixed file size smaller groups mean finer min/max pruning
    (at the cost of more footer metadata; lakehouse defaults are
    64-128 MB, the local spot uses 256 KB to make pruning visible at
    fixture scale)."""
    writer = zorder_frame(
        df, cols, bits, num_partitions, bucketing
    ).write.mode("overwrite")
    if row_group_bytes:
        writer = writer.option("parquet.block.size", str(row_group_bytes))
    writer.parquet(path)
