"""SparkSession factory with the engine's tuned defaults.

Ensures package code reaches Python workers (the local-mode analog of
``spark-submit --py-files``, which the north rule mandates for cluster runs)
and enables AQE so skewed shuffle partitions are split at runtime.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def ensure_worker_imports(spark: SparkSession) -> None:
    """Make the package importable on executors of an externally created
    session (the ``spark-submit --py-files`` analog, applied after the
    fact): zip the package once and ``addPyFile`` it. Safe to call
    repeatedly; no-op when workers already share the driver's PYTHONPATH."""
    import tempfile
    import zipfile

    from imagery_utils_spark import __version__

    flag = "_imagery_utils_spark_pyfiles"
    sc = spark.sparkContext
    if getattr(sc, flag, False):
        return
    pkg = os.path.join(_REPO_ROOT, "imagery_utils_spark")
    sources = [
        os.path.join(root, f)
        for root, _dirs, files in os.walk(pkg)
        for f in files if f.endswith(".py")
    ]
    # cache key includes newest source mtime so edits invalidate the zip
    stamp = int(max(os.path.getmtime(p) for p in sources))
    zip_path = os.path.join(
        tempfile.gettempdir(), f"imagery_utils_spark-{__version__}-{stamp}.zip"
    )
    if not os.path.exists(zip_path):
        tmp = zip_path + ".tmp"
        with zipfile.ZipFile(tmp, "w") as z:
            for full in sorted(sources):
                z.write(full, os.path.relpath(full, _REPO_ROOT))
        os.replace(tmp, zip_path)
    sc.addPyFile(zip_path)
    setattr(sc, flag, True)


def get_spark(
    master: str | None = None,
    app_name: str = "imagery_utils_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    * repo root is prepended to PYTHONPATH before the JVM starts so local
      python workers can import the package from inside UDFs;
    * AQE on (runtime coalesce + skew-join splitting);
    * Arrow on (vectorized pandas UDF transfer).
    """
    # Workers are forked with the driver's environment in local mode; this
    # must happen before the gateway launches.
    pp = os.environ.get("PYTHONPATH", "")
    if _REPO_ROOT not in pp.split(os.pathsep):
        os.environ["PYTHONPATH"] = os.pathsep.join(p for p in (_REPO_ROOT, pp) if p)

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus.isdigit() else 32

    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    # Belt and braces for sessions created by someone else first:
    try:
        spark.sparkContext.setLogLevel("WARN")
    except Exception:
        pass
    return spark
