"""Named-query registry — the engine's public contract.

Every operator from SURVEY.md §2 registers here as a named query:
a callable ``(spark, sf_dir) -> DataFrame`` plus (when the operator
is SQL-expressible) an ANSI-SQL twin that DuckDB can run over the
same parquet tables. The driver compares the two sides (row count +
schema + order-insensitive value hash), so:

- every computed/aggregate column is aliased identically on both
  sides;
- double-valued aggregates are rounded to 6 decimals on both sides
  (summation-order last-ulp drift would otherwise break hashes);
- every ORDER BY used for top-k/limit carries a unique tiebreaker so
  the selected row set is deterministic across engines.
"""

from __future__ import annotations

import functools
from collections.abc import Callable
from typing import TYPE_CHECKING

if TYPE_CHECKING:
    from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[["SparkSession", str], "DataFrame"]

QUERIES: dict[str, SparkQuery] = {}
ORACLE: dict[str, str] = {}

#: Prepared-plan cache for PURE queries, keyed by (applicationId,
#: sf_dir, name). Building a DataFrame costs ~250-300 ms of Py4J
#: round trips; a resident engine prepares a statement once and
#: re-executes it, which is exactly what re-invoking a cached
#: DataFrame does (plans are immutable; execution is still lazy and
#: re-runs from the source files every action).
_PLAN_CACHE: dict[tuple[str, str, str], "DataFrame"] = {}


def query(
    name: str, oracle: str | None = None, impure: bool = False
) -> Callable[[SparkQuery], SparkQuery]:
    """Register ``fn`` as query ``name`` with an optional DuckDB oracle.

    ``oracle=None`` marks a rows-only operator (not SQL-expressible:
    approximate, stateful-streaming, or side-effecting) — the driver
    then records the weaker rows-only check.

    ``impure=True`` opts out of prepared-plan caching for queries
    whose *construction* has side effects that must re-run on every
    invocation (scratch-dir writes, streaming runs, view/UDTF
    registration).
    """

    def deco(fn: SparkQuery) -> SparkQuery:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        if impure:
            registered = fn
        else:

            @functools.wraps(fn)
            def registered(spark: "SparkSession", sf_dir: str) -> "DataFrame":
                key = (spark.sparkContext.applicationId, sf_dir, name)
                df = _PLAN_CACHE.get(key)
                if df is None:
                    df = fn(spark, sf_dir)
                    _PLAN_CACHE[key] = df
                return df

        QUERIES[name] = registered
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every query module so registration side effects run."""
    # Imported lazily so `import hetnetdb_spark` stays cheap and so a
    # syntax error in one operator family doesn't take down the rest
    # during development (tests import load_all and fail loudly).
    from hetnetdb_spark.operators import (  # noqa: F401
        aggregates,
        joins,
        projection,
        setops,
        tpch,
        windows,
    )
    from hetnetdb_spark.functions import scalar  # noqa: F401
    from hetnetdb_spark.pipeline import dedup, multimodal, similarity, text  # noqa: F401
    from hetnetdb_spark.sources import io  # noqa: F401
    from hetnetdb_spark.streaming import queries  # noqa: F401
    from hetnetdb_spark.udfs import surface  # noqa: F401
