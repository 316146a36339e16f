"""SparkSession factory.

Defaults are tuned for correctness-vs-oracle comparison (UTC session
timezone — the reference also forces UTC, see
/root/reference/src/kfai/loaders/utils/helpers/datetime.py:14-22) and
for scale (AQE on, skew-join handling, Arrow for the Pandas-UDF
boundary). On a real cluster only ``master`` and the memory knobs
change; the SQL conf here is the 100 TB posture.
"""

from __future__ import annotations

import os
from pathlib import Path

from pyspark.sql import SparkSession

DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

# Repo root (parent of this package) — Python workers are fresh
# processes and must be able to import kfai_pipeline_spark regardless of
# the driver's cwd. Locally that's a PYTHONPATH entry; on a real cluster
# the package ships as a wheel/zip via --py-files instead.
_PKG_ROOT = str(Path(__file__).resolve().parents[1])


def _ensure_worker_pythonpath() -> None:
    current = os.environ.get("PYTHONPATH", "")
    if _PKG_ROOT not in current.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            f"{_PKG_ROOT}{os.pathsep}{current}" if current else _PKG_ROOT
        )


def get_spark(
    app_name: str = "kfai-pipeline-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    Shuffle partitions default to the local core count — on a real
    cluster this would be sized to ~2-3x total executor cores and AQE
    coalesces the rest at runtime.
    """
    _ensure_worker_pythonpath()
    cpus = int(DEFAULT_CPUS)
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or cpus

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        # -- determinism / oracle comparison --
        .config("spark.sql.session.timeZone", "UTC")
        # -- adaptive execution: runtime coalesce + skew-join splitting --
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # -- Arrow for the Python boundary (pandas UDFs, toPandas) --
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # -- scan sizing: 128 MB splits is the large-cluster default;
        #    low open-cost lets small local files still split across cores
        #    (no effect at real scale where files exceed it) --
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.sql.files.openCostInBytes", str(512 * 1024))
        # -- broadcast threshold: Spark's stock 10 MB. Dims
        #    (region/nation/supplier/part/customer) are far below it at every
        #    SF; the DataFrame builders additionally hint broadcast() on known
        #    dims. A larger threshold (we ran 64 MB in round 1) is a mid-size
        #    trap: at 10x data the static planner's size estimate put the
        #    6M-row lineitem FACT under 64 MB and broadcast it, rebuilding a
        #    multi-million-entry hash relation per query (measured 2.4x
        #    slow-down on the 5-table join). Fact tables must never ride the
        #    auto threshold. --
        .config("spark.sql.autoBroadcastJoinThreshold", str(10 * 1024 * 1024))
        # Legacy-fixture compat: older events.parquet drops stored
        # TIMESTAMP(NANOS) (read as long, catalog converts); the current
        # micros/NTZ drop ignores this conf entirely.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
