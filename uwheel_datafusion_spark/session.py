"""SparkSession factory with settings tuned for this engine.

Everything is UTC (the reference's wheel time domain is naive-UTC epoch
milliseconds, /root/reference/src/main.rs:84,133-135) and AQE is on so
plans re-optimize at runtime (skew joins, partition coalescing) — the
knobs that matter when the same code runs on a 1000-executor cluster.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "uwheel_datafusion_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    Local test default: ``local[$SPARK_GRAFT_CPUS]`` with shuffle
    partitions ≈ cores. On a real cluster, callers pass ``master=None``
    with their own submit conf; these settings are safe there too (AQE
    coalesces the shuffle-partition count at runtime).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # InferFiltersFromGenerate clones a generator's WHOLE input
        # expression into a size(...)>0 filter that then pushes below
        # the fan-out exchange — the md5/shingle chains of the text
        # tier get evaluated twice, once SERIALIZED on the single-file
        # scan task (measured 14 s → 3.4 s at sf0.1 for span islands
        # with the rule off). Our explode inputs are never empty-heavy,
        # so the filter only ever costs.
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
