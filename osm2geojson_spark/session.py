"""SparkSession factory tuned for this engine.

Local-mode defaults mirror what we would set cluster-side: AQE on (runtime
join re-planning + skew splitting replaces the reference's hand-tuned
bucketSize knobs, SortingWriter.java:70-153), shuffle partitions sized to
cores not the 200 default, Arrow enabled for every pandas-UDF kernel,
UTC session timezone so DuckDB-oracle comparisons are stable.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app: str = "osm2geojson_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the tuned SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (driver contract)
    falling back to ``local[*]``. On a real cluster this function is a
    no-op passthrough: spark-submit owns master/memory and only the SQL
    confs below apply.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        if cpus:
            master = f"local[{cpus}]"
        elif "PYSPARK_GATEWAY_PORT" in os.environ:
            # launched BY spark-submit: the submit conf owns the master —
            # setting one here would override --master. Leave unset.
            master = None
        else:
            master = "local[*]"
    if shuffle_partitions is None:
        # local mode: match parallelism, not the 200 default (AQE
        # coalesces further). Cluster mode (yarn/k8s/standalone): leave
        # None → keep Spark's default / spark-submit conf; AQE's
        # coalescePartitions owns the effective number at runtime.
        if master is not None and master.startswith("local"):
            try:
                n = int(master.split("[")[1].rstrip("]*")) if "[" in master else 0
            except ValueError:
                n = 0
            shuffle_partitions = n if n > 0 else (os.cpu_count() or 8)

    b = SparkSession.builder.appName(app)
    if master is not None:
        b = b.master(master)
    b = (
        b.config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.optimizer.nestedSchemaPruning.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    if shuffle_partitions is not None:
        b = b.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def load_tables(spark: SparkSession, sf_dir: str, *names: str):
    """Read driver-generated parquet tables from an sf dir."""
    out = [spark.read.parquet(f"{sf_dir}/{n}.parquet") for n in names]
    return out[0] if len(out) == 1 else out
