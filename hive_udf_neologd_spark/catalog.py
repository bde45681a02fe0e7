"""Central query catalog: name → (Spark builder, DuckDB oracle SQL).

``__spark_entry__.py`` exposes this to the driver's correctness harness.
Every implemented operator from SURVEY.md §2 has an entry here; oracle is
None only for genuinely non-SQL-expressible operators (driver then records
a rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from hive_udf_neologd_spark.operators.relational import (
    RELATIONAL_ORACLES,
    RELATIONAL_QUERIES,
)

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def _register(queries: dict, oracles: dict) -> None:
    for name, fn in queries.items():
        if name in QUERIES:
            raise ValueError(f"duplicate catalog entry {name!r}")
        QUERIES[name] = fn
        sql = oracles.get(name)
        if sql is not None:
            ORACLES[name] = sql


_register(RELATIONAL_QUERIES, RELATIONAL_ORACLES)

try:
    from hive_udf_neologd_spark.operators.temporal import (
        TEMPORAL_ORACLES,
        TEMPORAL_QUERIES,
    )

    _register(TEMPORAL_QUERIES, TEMPORAL_ORACLES)
except ImportError:
    pass

# Text / dedup / similarity / multimodal tiers register below as they land.
try:
    from hive_udf_neologd_spark.operators.textops import TEXT_ORACLES, TEXT_QUERIES

    _register(TEXT_QUERIES, TEXT_ORACLES)
except ImportError:
    pass

try:
    from hive_udf_neologd_spark.operators.dedup import DEDUP_ORACLES, DEDUP_QUERIES

    _register(DEDUP_QUERIES, DEDUP_ORACLES)
except ImportError:
    pass

try:
    from hive_udf_neologd_spark.operators.ann import ANN_ORACLES, ANN_QUERIES

    _register(ANN_QUERIES, ANN_ORACLES)
except ImportError:
    pass

try:
    from hive_udf_neologd_spark.operators.multimodal import MM_ORACLES, MM_QUERIES

    _register(MM_QUERIES, MM_ORACLES)
except ImportError:
    pass

try:
    from hive_udf_neologd_spark.operators.io import IO_ORACLES, IO_QUERIES

    _register(IO_QUERIES, IO_ORACLES)
except ImportError:
    pass

try:
    from hive_udf_neologd_spark.streaming.e2e import (
        STREAMING_ORACLES,
        STREAMING_QUERIES,
    )

    _register(STREAMING_QUERIES, STREAMING_ORACLES)
except ImportError:
    pass
