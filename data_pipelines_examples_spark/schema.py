"""Schema compilers: StructType from delimited field lists, dicts, or DDL.

Reference parity: the Zeppelin pipelines compile schemas from
comma-delimited metadata strings — key lists become non-nullable fields,
type lists map to Spark types (reference:
notebooks/zeppelin/bof_30_migrate.scala:25-36,726-854,
notebooks/zeppelin/sap_bw_api.scala:65-117); TPC-DS schemas come from JSON
specs (notebooks/databricks/python/tpcds_automated_population.py:145-165).
"""

from __future__ import annotations

import re

from pyspark.sql import types as T

_TYPE_ALIASES: dict[str, T.DataType] = {
    "string": T.StringType(),
    "varchar": T.StringType(),
    "int": T.IntegerType(),
    "integer": T.IntegerType(),
    "bigint": T.LongType(),
    "long": T.LongType(),
    "double": T.DoubleType(),
    "float": T.FloatType(),
    "boolean": T.BooleanType(),
    "bool": T.BooleanType(),
    "date": T.DateType(),
    "timestamp": T.TimestampType(),
    "binary": T.BinaryType(),
}


def parse_type(name: str) -> T.DataType:
    """Spark type from a metadata type name; supports decimal(p,s),
    array<...>, map<...> via DDL fallback."""
    key = name.strip().lower()
    if key in _TYPE_ALIASES:
        return _TYPE_ALIASES[key]
    m = re.fullmatch(r"(?:decimal|numeric)\s*\(\s*(\d+)\s*,\s*(\d+)\s*\)", key)
    if m:
        return T.DecimalType(int(m.group(1)), int(m.group(2)))
    # array<t>, map<k,v>, struct<...> — delegate to the DDL parser (needs an
    # active SparkSession)
    return T._parse_datatype_string(key)


def schema_from_fields(
    fields: str | list[str],
    types: str | list[str] | None = None,
    keys: str | list[str] | None = None,
    default_type: str = "string",
) -> T.StructType:
    """Compile a StructType from delimited field metadata.

    ``fields``: comma-delimited names (or list). ``types``: matching type
    names (or one-for-all default). ``keys``: names that become
    non-nullable (the reference's key-list convention).
    """
    names = [f.strip() for f in (fields.split(",") if isinstance(fields, str) else fields)]
    if types is None:
        type_list = [default_type] * len(names)
    elif isinstance(types, str):
        # split on commas not nested in (), <> — so decimal(10,2) and
        # map<string,int> stay whole
        type_list = [t.strip() for t in re.split(r",(?![^(<]*[)>])", types)]
    else:
        type_list = list(types)
    if len(type_list) != len(names):
        raise ValueError(f"{len(names)} fields but {len(type_list)} types")
    key_set = {
        k.strip()
        for k in (keys.split(",") if isinstance(keys, str) else (keys or []))
    }
    return T.StructType(
        [
            T.StructField(n, parse_type(t), nullable=n not in key_set)
            for n, t in zip(names, type_list)
        ]
    )


def schema_from_ddl(ddl: str) -> T.StructType:
    """StructType from a DDL column list, e.g. ``"a INT, b STRING"``."""
    parsed = T._parse_datatype_string(ddl)
    if not isinstance(parsed, T.StructType):
        raise ValueError(f"not a struct schema: {ddl}")
    return parsed


def align_to_schema(df, target: T.StructType):
    """Evolve a DataFrame to a target schema: add missing columns as typed
    nulls, cast mismatched types, order columns.

    Reference parity: schema evolution across raw-table versions via
    ``lit(None)`` columns + type-borrowing UDFs
    (notebooks/databricks/python/from_raw_to_hive_with_glue.py:44-84).
    """
    from pyspark.sql import functions as F

    cols = []
    have = {f.name: f for f in df.schema.fields}
    for field in target.fields:
        if field.name in have:
            cols.append(F.col(field.name).cast(field.dataType).alias(field.name))
        else:
            cols.append(F.lit(None).cast(field.dataType).alias(field.name))
    return df.select(*cols)
