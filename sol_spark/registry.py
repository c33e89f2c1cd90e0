"""Query registry: the single source of truth binding each implemented
operator/query to (a) its PySpark implementation and (b) its DuckDB oracle
SQL. ``__spark_entry__.py`` and the pytest oracle-parity suite both consume
this registry, so "declared in SURVEY §2" == "registered here" == "tested".
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None => driver does rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


_REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None,
    tags: tuple[str, ...] = (),
    doc: str = "",
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, tags=tags, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def all_queries() -> dict[str, QuerySpec]:
    """Import every query-defining module, then return the registry.

    Ordering note: the driver's correctness harness verifies queries in
    registration (dict) order under a fixed budget, so modules are imported
    least-recently-verified first — the LLM-pipeline operators and TPC-H
    (green in the local oracle harness, not yet in a driver CORRECTNESS
    report) ahead of the families already driver-verified in rounds 1-2.
    """
    # Imports are deferred so `import sol_spark` stays cheap.
    from sol_spark.operators import dedup, layout, multimodal, similarity, skew, text  # noqa: F401
    from sol_spark.queries import tpch  # noqa: F401
    from sol_spark.queries import relational, ssb, tpcds  # noqa: F401
    from sol_spark.queries import (  # noqa: F401
        event_windows,
        events_analytics,
        functions_coverage,
        generators,
        pandas_ops,
    )

    return dict(_REGISTRY)
