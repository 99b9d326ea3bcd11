"""Scalar function library (native-first; UDF only where Spark lacks an
expression)."""
