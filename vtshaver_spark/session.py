"""SparkSession factory tuned for the engine.

Defaults follow the 100 TB design point scaled to local testing: AQE on
(runtime coalescing + skew-join splitting), Arrow transfer for every
pandas UDF edge, and shuffle partitions sized to the local core count —
on a real cluster these are overridden per-job via spark-submit conf.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(
    app_name: str = "vtshaver-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    # Python workers inherit this env (driver -> JVM -> daemon): keep
    # big numpy buffers on the sbrk heap instead of per-alloc mmap.
    # Measured on this VM: concurrent first-touch page faults of fresh
    # mmap'd arrays run ~100x slower than reused heap pages, turning
    # millisecond kernels into minutes (glibc re-mmaps every equal-size
    # large alloc since the threshold only ratchets past *smaller*
    # sizes).
    os.environ.setdefault("MALLOC_MMAP_MAX_", "0")
    os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", "-1")
    # One BLAS thread per python worker: parallelism belongs to Spark's
    # task slots, not to nested OpenBLAS threads. Unpinned, each
    # worker's GEMM grabs extra cores when the box is idle — the
    # low-core bench config silently borrows cores and the measured
    # N->4N scaling efficiency compresses (r3: kernels 0.75 unpinned);
    # on a packed production executor the same nesting oversubscribes.
    os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")
    os.environ.setdefault("OMP_NUM_THREADS", "1")
    os.environ.setdefault("MKL_NUM_THREADS", "1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        n = cpus if cpus != "*" else os.cpu_count() or 8
        shuffle_partitions = int(n)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
