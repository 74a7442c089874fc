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


def _scratch_dir() -> str:
    custom = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if custom:
        return custom
    if os.path.isdir("/dev/shm"):
        path = "/dev/shm/spark-local"
        os.makedirs(path, exist_ok=True)
        return path
    import tempfile

    return tempfile.gettempdir()


_APP_SCRATCH_REGISTERED: set[str] = set()


def app_scratch_path(spark: SparkSession, name: str) -> str:
    """App-scoped scratch path ``<scratch>/<name>_<applicationId>`` —
    bounded to one copy per SparkSession (overwritten on rebuild) and
    removed at interpreter exit. /dev/shm is RAM; uuid-per-run paths leak
    it across repeated bench/test runs."""
    import atexit
    import shutil

    path = f"{_scratch_dir()}/{name}_{spark.sparkContext.applicationId}"
    if path not in _APP_SCRATCH_REGISTERED:
        _APP_SCRATCH_REGISTERED.add(path)
        atexit.register(shutil.rmtree, path, ignore_errors=True)
    return path


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
        # coalescePartitions collapses small shuffles to ~1 partition and
        # serializes every downstream stage — measured 1.6-3x wall-time on
        # the KG pipeline at local scale and it would cap scaling the same
        # way. We size spark.sql.shuffle.partitions to cores up front
        # instead; skew-join stays on (the protection that matters at
        # 100 TB, where partitions are never tiny).
        .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "20000")
        # heap sized deliberately small: G1 on a 48g+ heap with 32
        # allocating task threads produced 200s of GC + safepoint stalls
        # per run (10x task-time inflation); 8-16g keeps pauses short.
        # On a real cluster this is executor memory per ~4-8 cores.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        # shuffle/spill scratch on tmpfs when available: the sandbox's
        # virtio disk caps at ~140 MB/s with high latency, which turns
        # every shuffle into an IO queue; on a real cluster this is the
        # executors' local NVMe (or a remote shuffle service)
        .config("spark.local.dir", _scratch_dir())
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # smaller input splits: the extraction stage is pandas-UDF-heavy
        # (~10x the per-byte cost of a plain scan), so 128MB packing gives
        # few, skewed tasks — 32MB keeps every core busy through the tail
        .config("spark.sql.files.maxPartitionBytes", str(32 * 1024 * 1024))
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
