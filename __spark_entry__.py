"""Driver contract for the spark-graft builder (PySpark target).

entry(spark) runs the flagship query at sf0.001; queries() exposes one
callable per implemented operator from SURVEY.md §2; oracle_sql() maps
each to the DuckDB-equivalent ANSI SQL (omitted entries → rows-only
check).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: TPC-H Q5-shape 6-way join at sf0.001."""
    from flapi_spark.operators.relational import q5_local_supplier_volume

    return q5_local_supplier_volume(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from flapi_spark.queries import QUERIES

    return {name: fn for name, (fn, _oracle) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    from flapi_spark.queries import QUERIES

    return {name: oracle for name, (_fn, oracle) in QUERIES.items() if oracle}
