"""SparkSession factory with scale-oriented defaults.

Local testing runs on ``local[N]``; the same config block is what we'd
ship to a 1000-executor cluster via ``spark-submit --py-files`` (AQE,
skew-join handling, Arrow batching) — only master/shuffle-partition
count change per deployment.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    master: str | None = None,
    app_name: str = "idd-hw6-record-linkage-spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for the linkage workload.

    - AQE on: runtime coalescing of shuffle partitions + skew-join
      splitting (mega-domain block keys are the known skew source,
      cf. reference ``output/blocking/blocking_B2_test_log.txt`` where
      one block holds 69/1425 records).
    - Arrow on: every pandas UDF moves data in columnar batches.
    - Shuffle partitions default to ``max(2*cores, 32)`` locally; on a
      real cluster this is set to ~2-3x total cores instead.
    """
    # Make the package importable in forked Python workers (pandas UDF /
    # mapInPandas closures pickle module references). Local mode: the
    # worker daemon inherits this env var. Cluster mode: ship the
    # package with ``spark-submit --py-files`` instead.
    pkg_parent = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if pkg_parent not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            pkg_parent + (os.pathsep + existing if existing else "")
        )

    cpus = DEFAULT_CPUS
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        if master.startswith("local["):
            inner = master[len("local[") : -1]
            cpus = int(cpus if inner == "*" else inner)
        shuffle_partitions = max(2 * cpus, 32)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # Fork workers from a daemon that has numpy/pandas/pyarrow
        # already imported (copy-on-write inheritance) — first-task
        # import cost of Arrow UDF stages drops to zero. See
        # daemon_preload.py; harmless fallback: if the module were
        # missing the session would fail loudly at first Python stage.
        .config(
            "spark.python.daemon.module",
            "idd_hw6_record_linkage_spark.daemon_preload",
        )
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.extraJavaOptions", "-Duser.timezone=UTC")
        .config("spark.executor.extraJavaOptions", "-Duser.timezone=UTC")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
