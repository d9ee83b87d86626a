"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: derive a KG from the sf0.001 star schema and
answer a PARJ-style BGP chain join over it. ``queries()``/``oracle_sql()``
delegate to :mod:`parj_spark.contract` (one entry per implemented operator
family from SURVEY.md §2 plus the training-data operators).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from parj_spark import contract


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return contract.kg_bgp_chain(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(contract.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(contract.ORACLES)
