"""SparkSession factory with scale-oriented defaults.

Tuned for the sandbox (single JVM, local[N]) but every knob is the one you
would set on a 1000-executor cluster: AQE on (runtime re-plan + skew-join
splitting), Arrow on (all our UDFs are pandas UDFs), shuffle partitions
sized to cores at test scale (on a real cluster AQE coalesces).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    master: str | None = None,
    app_name: str = "eget-crawler-overflow-spark",
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        # match parallelism at test scale; AQE coalesces small shuffles anyway
        shuffle_partitions = cpus
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "16384")
        # Unix-domain sockets for the driver-python <-> JVM side channels
        # (accumulator updates etc). The TCP default ack-round-trips inside
        # the DAGScheduler event loop on EVERY task completion; under CPU
        # pressure those acks stall and serialize task completions (measured
        # 20.7s -> 13.4s on the 500k-page extract at local[16], and the
        # "Failed to update accumulator"/broken-pipe noise disappears).
        .config("spark.python.unix.domain.socket.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # Test corpora are a few hundred MB: the 128m default would give a
        # handful of scan partitions and starve 32 cores. At warehouse scale
        # (many-GB Iceberg tables) the default is right — override via env.
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", "8m"),
        )
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        # bucketed seen-set tables (operators/seen.py) live here; kept out
        # of the repo tree's CWD so tests/bench can run from anywhere
        .config(
            "spark.sql.warehouse.dir",
            os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                ".data",
                "warehouse",
            ),
        )
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    return builder.getOrCreate()
