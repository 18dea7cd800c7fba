"""SparkSession factory tuned for the KG-construction pipeline.

Scale posture (designed for a 1000-executor cluster, tested on local[N]):

* AQE on (runtime coalesce + skew-join splitting) — the reference handles
  skew not at all (single Python thread); we lean on AQE for joins and use
  explicit salting for hot-key aggregations (see operators/salted_agg.py).
* Arrow pandas-UDF batches sized explicitly — this is the analog of the
  reference's embed/insert batch sizes (reference
  src/frontend/ui/import_data.py:346, src/backend/db/methods/imports.py:32).
* shuffle partitions default to 2*cores locally; on a real cluster this is
  overridden via spark-submit conf (or left to AQE coalescing).
* session timezone pinned to UTC so timestamps round-trip identically
  against the DuckDB oracle and across executors.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_ARROW_BATCH = 4096


def cpu_count() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))


def get_spark(
    app_name: str = "omop-concept-automapper-spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Create (or fetch) a SparkSession.

    ``cores`` controls local parallelism (``local[cores]``); on a real
    cluster the master is taken from the environment/spark-submit and this
    argument is ignored.
    """
    cores = cores or cpu_count()
    shuffle_partitions = shuffle_partitions or max(2 * cores, 8)

    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # AQE coalescing floor (r7): with the default 1 MB floor, a stage
        # whose shuffle input is a few MB still fans out into one tiny
        # task per core (parallelismFirst targets defaultParallelism), and
        # iterative operators (CC rounds, PageRank, BPE) spend more time
        # scheduling micro-tasks than computing.  An 8 MB floor coalesces
        # those stages to a handful of tasks while leaving any production-
        # sized shuffle untouched — the size/parallelism target dominates
        # as soon as a stage shuffles more than cores x 8 MB (256 MB at 32
        # cores), so this is a latency guard, not a parallelism cap.
        .config(
            "spark.sql.adaptive.coalescePartitions.minPartitionSize",
            os.environ.get("SPARK_GRAFT_AQE_MIN_PARTITION_SIZE", "8m"),
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            str(DEFAULT_ARROW_BATCH),
        )
        # broadcast threshold: the filtered standard-concept dim +
        # embedding matrix is the hot broadcast (SURVEY.md §1.3)
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
    )
    if not os.environ.get("SPARK_MASTER"):
        builder = builder.master(f"local[{cores}]")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
