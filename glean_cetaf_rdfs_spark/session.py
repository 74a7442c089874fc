"""SparkSession factory tuned for this engine.

Local-mode knobs mirror what a cluster deployment would set per-executor:
AQE on (runtime coalesce + skew-join), Arrow on (all UDFs are
pandas/Arrow-vectorized), shuffle partitions sized to cores rather than
the 200 default, UTC session TZ so DuckDB oracle comparisons are stable.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

from pyspark.sql import SparkSession

# repo root (parent of this package) — shipped to Python workers so the
# extraction UDFs can unpickle package functions regardless of the
# driver's cwd; on a real cluster this is `spark-submit --py-files
# glean_cetaf_rdfs_spark.zip` (see package_zip()).
_PKG_ROOT = str(Path(__file__).resolve().parents[1])


def package_zip(target_dir: str = "/tmp") -> str:
    """Zip this package for ``spark-submit --py-files`` / ``addPyFile``."""
    import shutil

    base = os.path.join(target_dir, "glean_cetaf_rdfs_spark")
    return shutil.make_archive(base, "zip", root_dir=_PKG_ROOT,
                               base_dir="glean_cetaf_rdfs_spark")


def get_spark(
    app_name: str = "glean_cetaf_rdfs_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32).
    ``shuffle_partitions`` defaults to the local core count — on a real
    cluster this would be ~2-3× total executor cores; AQE coalesces down.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        inner = master[master.find("[") + 1 : master.find("]")] if "[" in master else "4"
        shuffle_partitions = 32 if inner == "*" else max(4, int(inner))

    if _PKG_ROOT not in sys.path:
        sys.path.insert(0, _PKG_ROOT)
    worker_pythonpath = _PKG_ROOT + os.pathsep + os.environ.get("PYTHONPATH", "")
    # local mode: python workers fork from the driver JVM and read the
    # process env — set it before the JVM starts
    os.environ["PYTHONPATH"] = worker_pythonpath

    builder = (
        SparkSession.builder.master(master)
        .config("spark.executorEnv.PYTHONPATH", worker_pythonpath)
        .config("spark.yarn.appMasterEnv.PYTHONPATH", worker_pythonpath)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "20000")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
