"""Central query registry: every operator exposed to the driver.

Each entry pairs a Spark implementation ``(spark, sf_dir) -> DataFrame``
with (where SQL-expressible) an equivalent DuckDB oracle SQL string.
The driver runs both at sf0.01 and compares row count + schema +
order-insensitive value hash (see ``__spark_entry__.py``).

Determinism rules every query here follows:

* aggregate money/quantity columns as DECIMAL (exact in both engines,
  immune to float summation order);
* per-row double arithmetic is fine (IEEE-deterministic);
* any ratio/avg is computed as one double division of exact inputs;
* top-k always carries a full deterministic tie-break.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None          # DuckDB SQL, or None -> rows-only check
    description: str = ""


_REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None = None, description: str = ""):
    """Decorator: add a query implementation to the registry."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = Query(name, fn, oracle, description)
        return fn

    return deco


def all_queries() -> dict[str, Query]:
    # Import side-effect modules exactly once.
    from . import cdc_queries  # noqa: F401
    from . import analytics  # noqa: F401
    from . import analytics_ext  # noqa: F401
    from . import events_queries  # noqa: F401
    from . import text_queries  # noqa: F401
    from . import similarity_queries  # noqa: F401
    from . import sql_queries  # noqa: F401
    from . import media_queries  # noqa: F401
    from . import analytics_shapes  # noqa: F401
    from . import set_queries  # noqa: F401
    from . import behavior_queries  # noqa: F401

    return dict(_REGISTRY)


def get_query(name: str) -> Query:
    return all_queries()[name]
