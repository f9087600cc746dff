"""SparkSession factory with scale-aware defaults.

Local mode is for correctness testing only; the config choices below are the
ones that matter on a real multi-executor cluster too (AQE, skew-join
handling, Arrow transfer, sane shuffle parallelism).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "tenzir_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    driver_memory: str | None = None,
    extra_conf: dict[str, str] | None = None,
    master: str | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``cores`` defaults to $SPARK_GRAFT_CPUS (driver contract) or 4.
    ``shuffle_partitions`` defaults to 2*cores — on a real cluster you would
    size this to total executor cores; AQE coalesces the excess at runtime.
    ``master`` overrides local[cores] (e.g. ``spark://127.0.0.1:7077`` for a
    multi-executor standalone cluster; ``cores`` then sizes shuffle
    parallelism only).
    """
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "4"))
    if shuffle_partitions is None:
        shuffle_partitions = max(2 * cores, 8)
    builder = (
        SparkSession.builder.master(master or f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # max_by(struct(...)) — the LWW collapse — is a TypedImperativeAggregate
        # (ObjectHashAggregateExec). The default fallback threshold (128 keys!)
        # silently degrades every partial aggregation to an external SORT of
        # the full batch including token arrays. A micro-batch map task sees
        # ≤ ~100k distinct keys ≈ tens of MB of entries — keep it hashing.
        .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4000000")
        # semijoin-mode LWW collapse leaves its winner-set join UNhinted and
        # relies on AQE's runtime conversion: typical winner sets (a few
        # hundred MB of (file_path, row_index) pairs per 10^6-key batch)
        # must still convert to broadcast for the payload to stay
        # exchange-free, while a pathological batch degrades to a hash join
        # instead of OOMing the driver (the fallback ADVICE asked for)
        .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "256m")
        .config("spark.sql.session.timeZone", "UTC")
        # Python workers (mapInPandas/pandas UDFs) inherit the same glibc
        # mmap-threshold fix as the driver (tenzir_spark.__init__._tune_malloc:
        # slow first-touch faults on micro-VM kernels make large Arrow/numpy
        # temporaries pathological without it)
        .config("spark.executorEnv.MALLOC_MMAP_THRESHOLD_", str(1 << 30))
        .config("spark.executorEnv.MALLOC_TRIM_THRESHOLD_", str(1 << 30))
        # NOTE: -XX:+UseTransparentHugePages was A/B-tested here and made
        # everything 4x WORSE (507 s vs 132 s headline): THP defrag is
        # `madvise` on this kernel, so each madvised huge-page allocation
        # performs synchronous compaction — allocation paths stall for
        # seconds. Leave THP to the kernel default.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", driver_memory or os.environ.get("TENZIR_SPARK_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
