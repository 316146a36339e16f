"""As-of join (J8): for each left row, the latest right row with
``right_ts <= left_ts`` sharing the join key.

Spark has no native as-of join. The scalable pattern is the
union + windowed last(ignorenulls) carry-forward: one shuffle on
``(key, ts)``, no per-key Python, no cross product — survives 100x
scale-up because state per key is O(1) within the window scan.

A ``pd.merge_asof``-per-group variant would pin each key to one task
and pay the Arrow boundary; the union form stays whole-stage-codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str] | None = None,
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """Backward as-of join. Returns ``left`` columns plus the right-side
    ``value_cols`` (coalesced carry-forward, NULL if no prior right row).

    Ties (right_ts == left_ts) match, with right rows sorting before left
    rows at the same timestamp.

    ``tolerance_seconds`` bounds the lookback like
    ``pd.merge_asof(tolerance=...)``: a matched right row older than
    ``left_ts - tolerance`` yields NULLs instead. Implemented as a
    post-carry filter — the carried match timestamp rides along as one
    extra column, so the plan shape (one shuffle, one window) is
    unchanged.

    NULL join keys follow equi-join semantics: they match NOTHING
    (window partitionBy would otherwise group every NULL-key row into
    one partition and cross-match them — the round-6 NULL sweep caught
    exactly that). NULL-key left rows BYPASS the window entirely and
    union back with NULL values — correctness aside, a crawl corpus's
    giant NULL-key population would otherwise serialize into a single
    hot window partition.
    """
    value_cols = value_cols or [c for c in right.columns if c not in (on, right_ts)]

    left_null = left.where(F.col(on).isNull()).select(
        *left.columns,
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(c)
            for c in value_cols
        ],
    )
    left = left.where(F.col(on).isNotNull())
    right = right.where(F.col(on).isNotNull())

    l_tagged = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),  # left sorts after right at equal ts
        F.struct(*[F.col(c) for c in left.columns]).alias("__left"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in value_cols],
        F.lit(None).cast(right.schema[right_ts].dataType).alias("__r_ts"),
    )
    r_tagged = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(l_tagged.schema["__left"].dataType).alias("__left"),
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
        F.col(right_ts).alias("__r_ts"),
    )

    w = (
        Window.partitionBy("__k")
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = l_tagged.unionByName(r_tagged).select(
        "__side",
        "__ts",
        "__left",
        *[F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__r_{c}") for c in value_cols],
        F.last("__r_ts", ignorenulls=True).over(w).alias("__r_ts"),
    )
    matched = carried.where(F.col("__side") == 1)
    if tolerance_seconds is not None:
        from kfai_pipeline_spark.functions.datetime_fns import epoch_micros_fn

        us_l = epoch_micros_fn(matched, "__ts")
        us_r = epoch_micros_fn(matched, "__r_ts")  # sides may differ in tz-ness
        # Exact integer-micros compare — double epoch-seconds could in
        # principle round an exactly-at-tolerance match the wrong way.
        # NULL __r_ts (no match at all) makes the condition NULL -> NULLs
        within = us_l(F.col("__ts")) - us_r(F.col("__r_ts")) <= F.lit(
            int(round(tolerance_seconds * 1_000_000))
        )
        matched = matched.select(
            "__side",
            "__left",
            *[
                F.when(within, F.col(f"__r_{c}")).alias(f"__r_{c}")
                for c in value_cols
            ],
        )
    return matched.select(
        *[F.col(f"__left.{c}").alias(c) for c in left.columns],
        *[F.col(f"__r_{c}").alias(c) for c in value_cols],
    ).unionByName(left_null)
