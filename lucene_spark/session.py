"""Session helpers: tuned SparkSession factory + package shipping.

On a real cluster the package ships via ``spark-submit --py-files
lucene_spark.zip`` (the north star's deployment mode). For driver-side
programmatic use (notebooks, the test driver) :func:`ensure_shipped` zips
the package once and registers it with ``sc.addPyFile`` so executor Python
workers can import it regardless of their working directory.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

_SHIPPED: set[str] = set()


def ensure_shipped(spark) -> None:
    """Ship the lucene_spark package to executors (idempotent per app)."""
    app_id = spark.sparkContext.applicationId
    if app_id in _SHIPPED:
        return
    import lucene_spark
    pkg_dir = os.path.dirname(os.path.abspath(lucene_spark.__file__))
    root = os.path.dirname(pkg_dir)
    zpath = os.path.join(tempfile.gettempdir(),
                         f"lucene_spark_pyfiles_{os.getpid()}.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        for dirpath, _, files in os.walk(pkg_dir):
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    z.write(full, os.path.relpath(full, root))
    spark.sparkContext.addPyFile(zpath)
    _SHIPPED.add(app_id)


def get_session(master: str | None = None, app_name: str = "lucene_spark",
                shuffle_partitions: int | None = None, **extra_conf):
    """SparkSession with the configuration the engine expects: AQE on
    (runtime re-plan + skew handling), Arrow enabled for the vectorized
    UDF kernels."""
    from pyspark.sql import SparkSession

    b = SparkSession.builder.appName(app_name)
    if master:
        b = b.master(master)
    b = (b.config("spark.sql.adaptive.enabled", "true")
          .config("spark.sql.execution.arrow.pyspark.enabled", "true")
          .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000"))
    if shuffle_partitions is not None:
        b = b.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    for k, v in extra_conf.items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    ensure_shipped(spark)
    return spark
