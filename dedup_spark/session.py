"""SparkSession builder with scale-conscious defaults (SURVEY.md §4, §7.0).

AQE stays on as a *backstop* (skew-join, partition coalescing); explicit skew
handling lives in operators.skew per the north rule. Shuffle partitions are
sized to the actual parallelism instead of the 200 default — at cluster scale
the caller overrides via --conf, these are local-mode ergonomics.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def get_spark(
    app: str = "dedup_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    b = SparkSession.builder.appName(app)
    if master:
        b = b.master(master)
    b = (
        b.config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    if shuffle_partitions is None:
        shuffle_partitions = max(spark.sparkContext.defaultParallelism, 8)
    spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
    spark.sparkContext.setLogLevel("WARN")
    return spark


def iceberg_available(spark: SparkSession) -> bool:
    """True when an Iceberg catalog/extension is live on this session.

    The sandbox has no Iceberg runtime jar (SURVEY.md §7.0), so StageStore
    falls back to Parquet-with-manifest; on a real cluster the same pipeline
    writes Iceberg tables (sources.store.IcebergStore).
    """
    try:
        ext = spark.conf.get("spark.sql.extensions", "") or ""
        return "IcebergSparkSessionExtensions" in ext
    except Exception:
        return False
