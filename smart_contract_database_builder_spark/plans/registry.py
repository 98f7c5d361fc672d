"""Query registry backing ``__spark_entry__.py``.

A query is registered with:
- ``name``   — stable key, shared by the Spark fn and its oracle SQL;
- ``fn``     — ``(spark: SparkSession, sf_dir: str) -> DataFrame``;
- ``oracle`` — equivalent DuckDB SQL over the pre-registered views
  (region nation customer supplier part orders lineitem events documents
  embeddings), or ``None`` for non-SQL-expressible operators (the driver
  then records a rows-only check).

Column-name parity is enforced socially: alias every computed column the
same way on both sides (the driver sorts columns by name before hashing).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None
    doc: str


QUERIES: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None):
    """Decorator: add a query to the registry."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = QuerySpec(name, fn, oracle, (fn.__doc__ or "").strip())
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle for name, spec in QUERIES.items() if spec.oracle is not None
    }
