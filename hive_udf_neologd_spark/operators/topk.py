"""Skew-safe grouped top-k.

A plain ``row_number() OVER (PARTITION BY key)`` puts every row of a hot
key into one task.  At 100 TB with skewed keys that task is the job.  The
two-phase formulation bounds per-task work:

  phase 1 — salt the key (``key, spray``), rank within each salted
            sub-group, keep only the local top-k (≤ k·S rows per key
            survive, whatever the skew);
  phase 2 — re-rank the survivors within the true key and keep the global
            top-k.

Result is identical to the single-window formulation (the global top-k is
always contained in the union of salted local top-ks), so the DuckDB
oracle can stay the simple single-window query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.column import Column


def grouped_topk(
    df: DataFrame,
    keys: list[str],
    order_by: list[Column],
    k: int,
    salt_buckets: int = 16,
    rank_col: str = "rn",
) -> DataFrame:
    """Top-k rows per key group, skew-safe, deterministic given a total
    ordering in ``order_by`` (add a unique tiebreak column)."""
    spray = (F.abs(F.hash(*[F.col(c) for c in df.columns])) % salt_buckets).alias("__spray")
    local_w = Window.partitionBy(*keys, "__spray").orderBy(*order_by)
    survivors = (
        df.withColumn("__spray", spray)
        .withColumn("__local_rn", F.row_number().over(local_w))
        .filter(F.col("__local_rn") <= k)
        .drop("__spray", "__local_rn")
    )
    global_w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        survivors.withColumn(rank_col, F.row_number().over(global_w))
        .filter(F.col(rank_col) <= k)
    )
