"""Placeholder — filled in by a later milestone this round."""

SPARK_QUERIES = {}
ORACLE_SQL = {}
