"""Query registry: every operator registers a (spark, sf_dir) -> DataFrame
callable plus (when SQL-expressible) a DuckDB oracle twin.

The driver runs each pair side-by-side at sf0.01 and compares row count +
schema + order-insensitive value hash (see __spark_entry__.py).  Column
names MUST match between the Spark result and the oracle SQL.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: Optional[str] = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a query under ``name`` with an optional DuckDB
    oracle SQL string.  Ops without an oracle get a rows-only check."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
