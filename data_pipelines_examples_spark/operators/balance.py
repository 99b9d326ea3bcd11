"""Input under-parallelism guard, RDD-free.

A corpus arriving in fewer splits than the cluster's parallelism (one
small parquet file, an unsplittable gzip) runs every narrow map stage on
those few cores. The fix is one bounded up-front repartition — measured
2.7× on the n-gram Jaccard bench at sf0.01. At production scale input
splits far exceed cores, so the guard must be a cheap no-op there.

``df.rdd.getNumPartitions()`` answers the question but forces eager
physical planning plus a Python RDD wrapper on every call. Instead the
split count is estimated the same way Spark's own FilePartition packing
does: from the scan's file list and ``spark.sql.files.maxPartitionBytes``.
The file list comes from the analyzed plan (``df.inputFiles()`` — no job,
no RDD), and file sizes are only stat'ed when the file COUNT alone can't
prove there's enough parallelism, so the 100 TB case (thousands of files)
never touches the filesystem.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame

_DEFAULT_MAX_PARTITION_BYTES = 128 * 1024 * 1024


def _max_partition_bytes(spark) -> int:
    raw = spark.conf.get("spark.sql.files.maxPartitionBytes", str(_DEFAULT_MAX_PARTITION_BYTES))
    try:
        return int(raw)
    except ValueError:  # size suffix form, e.g. "32m" / "128MB"
        jvm = spark.sparkContext._jvm
        return int(jvm.org.apache.spark.network.util.JavaUtils.byteStringAsBytes(raw))


def ensure_parallelism(df: DataFrame) -> DataFrame:
    """Repartition ``df`` up to ``defaultParallelism`` iff its file scan
    provably yields fewer splits; leave every other plan untouched.

    Non-file plans (in-memory relations, post-shuffle stages) report no
    input files and are left alone — shuffle stages already size by
    ``spark.sql.shuffle.partitions``.
    """
    spark = df.sparkSession
    sc = spark.sparkContext
    par = sc.defaultParallelism
    files = df.inputFiles()
    if not files or len(files) >= par:
        return df
    max_bytes = _max_partition_bytes(spark)
    hconf = sc._jsc.hadoopConfiguration()
    jvm = sc._jvm
    splits = 0
    for f in files:
        try:
            p = jvm.org.apache.hadoop.fs.Path(f)
            size = p.getFileSystem(hconf).getFileStatus(p).getLen()
        except Exception:  # noqa: BLE001 — listing raced a writer; assume 1 split
            size = 0
        splits += max(1, math.ceil(size / max_bytes))
        if splits >= par:
            return df
    return df.repartition(par)
