"""Query registry: the single source of truth for the driver contract.

Every operator from SURVEY.md §2 that is "done" registers here with a
PySpark builder and (when SQL-expressible) a DuckDB oracle string.
``__spark_entry__.py`` reads this registry to produce ``queries()`` and
``oracle_sql()``; tests/test_oracle_parity.py replays the driver's
comparison locally at sf0.001 so mismatches are caught before the
driver's sf0.01 gate.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    builder: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB; None -> rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


_REGISTRY: dict[str, QuerySpec] = {}

#: Modules that register queries on import (one per SURVEY.md §2 family).
_QUERY_MODULES: tuple[str, ...] = (
    "mobility_etl_spark.queries.relational",
    "mobility_etl_spark.queries.relational2",
    "mobility_etl_spark.queries.joins",
    "mobility_etl_spark.queries.aggregates",
    "mobility_etl_spark.queries.windows",
    "mobility_etl_spark.queries.sorts_sets",
    "mobility_etl_spark.queries.scalars",
    "mobility_etl_spark.queries.scalars2",
    "mobility_etl_spark.queries.domain",
    "mobility_etl_spark.queries.dedup",
    "mobility_etl_spark.queries.graph",
    "mobility_etl_spark.queries.similarity",
    "mobility_etl_spark.queries.text",
    "mobility_etl_spark.queries.multimodal",
    "mobility_etl_spark.queries.sources",
    "mobility_etl_spark.queries.streaming",
    "mobility_etl_spark.queries.tpch",
    "mobility_etl_spark.queries.tpch2",
    "mobility_etl_spark.queries.tpch3",
    "mobility_etl_spark.queries.subqueries",
    "mobility_etl_spark.queries.sampling",
    "mobility_etl_spark.queries.sketches",
    "mobility_etl_spark.queries.curation",
    "mobility_etl_spark.queries.udfs",
    "mobility_etl_spark.queries.warsaw_queries",
    "mobility_etl_spark.queries.corpus_prep",
    "mobility_etl_spark.queries.scale_ops",
    "mobility_etl_spark.queries.training_prep",
    "mobility_etl_spark.queries.spatial",
    "mobility_etl_spark.queries.text2",
    "mobility_etl_spark.queries.analytics",
    "mobility_etl_spark.queries.retrieval",
    "mobility_etl_spark.queries.timeseries_q",
    "mobility_etl_spark.queries.sketch_graph",
    "mobility_etl_spark.queries.dataops",
    "mobility_etl_spark.queries.mlstats",
    "mobility_etl_spark.queries.curation2",
    "mobility_etl_spark.queries.temporal",
    "mobility_etl_spark.queries.tokenize",
)


def register(
    name: str, oracle: str | None = None, tags: tuple[str, ...] = ()
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a (spark, sf_dir) -> DataFrame query builder."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QuerySpec(
            name=name, builder=fn, oracle=oracle, tags=tuple(tags), doc=fn.__doc__ or ""
        )
        return fn

    return deco


def load_all() -> dict[str, QuerySpec]:
    """Import all query modules (idempotent) and return the registry."""
    for mod in _QUERY_MODULES:
        importlib.import_module(mod)
    return dict(_REGISTRY)
