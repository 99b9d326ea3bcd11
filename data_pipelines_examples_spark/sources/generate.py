"""Schema-driven synthetic data generation (SURVEY §2.1 S16/S17).

Reference parity:
- per-field type-driven random rows — notebooks/zeppelin/bof_30_migrate.scala:857-877
- parameterized benchmark-corpus generation (dsdgen fan-out) —
  notebooks/databricks/python/tpcds_automated_population.py:89-206. The
  external dsdgen binary is replaced by a distributed ``spark.range``-based
  generator: deterministic per-row seeds, no driver-side row materialization.

Scale notes: rows are generated ON the executors from ``spark.range(n)``
(narrow, perfectly parallel, no shuffle); a seeded xxhash64 of (row id,
column) drives every value, so any slice of the table is reproducible
independently of partitioning or cluster size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _hash01(seed_col: Column, salt: str) -> Column:
    """Deterministic uniform [0,1) from a row id and a column salt."""
    h = F.xxhash64(seed_col, F.lit(salt))
    return (F.abs(h) % F.lit(1_000_000_007)).cast("double") / 1_000_000_007.0


def random_dataframe(
    spark: SparkSession,
    schema: T.StructType,
    n_rows: int,
    seed: int = 42,
    categories: dict[str, list[str]] | None = None,
) -> DataFrame:
    """Generate ``n_rows`` rows matching ``schema``, deterministically.

    Strings draw from ``categories[col]`` when given, else synthesize
    ``col_<k>`` tokens; numerics are uniform; dates/timestamps span 2020;
    booleans are fair coins. All expressions are codegen'd — the generator
    scales linearly with cores.
    """
    df = spark.range(n_rows).withColumn("__seed", F.col("id") + seed)
    cols = []
    for field in schema.fields:
        u = _hash01(F.col("__seed"), field.name)
        dt = field.dataType
        if isinstance(dt, T.StringType):
            cats = (categories or {}).get(field.name)
            if cats:
                arr = F.array(*[F.lit(c) for c in cats])
                c = F.element_at(arr, (u * len(cats)).cast("int") + 1)
            else:
                c = F.concat(F.lit(f"{field.name}_"), (u * 10000).cast("int").cast("string"))
        elif isinstance(dt, (T.IntegerType, T.LongType)):
            c = (u * 1_000_000).cast(dt)
        elif isinstance(dt, (T.DoubleType, T.FloatType)):
            c = (u * 10_000).cast(dt)
        elif isinstance(dt, T.DecimalType):
            c = (u * 10_000).cast(dt)
        elif isinstance(dt, T.BooleanType):
            c = u < 0.5
        elif isinstance(dt, T.DateType):
            c = F.date_add(F.lit("2020-01-01").cast("date"), (u * 365).cast("int"))
        elif isinstance(dt, T.TimestampType):
            c = F.timestamp_seconds(
                F.unix_timestamp(F.lit("2020-01-01 00:00:00")) + (u * 31_536_000).cast("long")
            )
        else:
            c = F.lit(None).cast(dt)
        cols.append(c.alias(field.name))
    return df.select(*cols)


def benchmark_corpus(
    spark: SparkSession,
    tables: dict[str, tuple[T.StructType, int]],
    path: str,
    scale_factor: float = 1.0,
    seed: int = 42,
    categories: dict[str, dict[str, list[str]]] | None = None,
) -> dict[str, int]:
    """Generate a multi-table benchmark corpus to parquet, row counts
    scaled by ``scale_factor`` — the dsdgen-population shape without the
    external binary. Returns written row counts."""
    counts = {}
    for name, (schema, base_rows) in tables.items():
        n = max(1, int(base_rows * scale_factor))
        df = random_dataframe(spark, schema, n, seed=seed, categories=(categories or {}).get(name))
        df.write.mode("overwrite").parquet(f"{path}/{name}.parquet")
        counts[name] = n
    return counts
