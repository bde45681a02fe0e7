"""Skew-safe grouped top-k.

A plain ``row_number() OVER (PARTITION BY key)`` historically put every
row of a hot key through one reducer.  MEASURED FINDING (round 5, sf0.1
lineitem amplified to 4.8M rows with 90% of rows on one key, local[32],
warmup + best-of-2):

* single window + ``rn <= k`` filter: **4.36 s**
* hand-salted two-phase ranking:     **7.83 s** (identical results)

The reason is visible in the executed plan: since Spark 3.5 the
``InferWindowGroupLimit`` rule plans a ``WindowGroupLimit … Partial``
*before* the exchange for rank-style windows filtered by a constant
limit —

    Window [row_number() …]
    +- WindowGroupLimit [skey], …, row_number(), 10, Final
       +- Sort …
          +- Exchange hashpartitioning(skey, 32)
             +- WindowGroupLimit [skey], …, row_number(), 10, Partial

i.e. every map task keeps only its local top-k per key BEFORE the
shuffle, so the hot key's reduce partition receives at most
``num_map_tasks × k`` rows no matter how skewed the data.  That is
exactly the bound the manual salt provided — built into the engine, with
one less shuffle column, one less window, and no per-row hashing.  At
100 TB the same argument holds: the exchange never carries a hot group,
and the reduce-side sort is bounded by maps×k (for extreme map counts,
raise parallelism or fall back to :func:`grouped_topk_salted`).

``grouped_topk`` therefore plans the single window and a plan test
(tests/test_skew.py) asserts the Partial WindowGroupLimit is present —
if a Spark upgrade or conf change ever drops the rule, the test fails
rather than silently reintroducing the skew bottleneck.
``grouped_topk_salted`` keeps the engine-independent two-phase
formulation for engines without the rule.
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
    salt_buckets: int = 16,  # kept for API compat; used only by the salted variant
    rank_col: str = "rn",
) -> DataFrame:
    """Top-k rows per key group, deterministic given a total ordering in
    ``order_by`` (add a unique tiebreak column).  Skew-safe on Spark ≥3.5
    via the engine's partial WindowGroupLimit (see module docstring)."""
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return df.withColumn(rank_col, F.row_number().over(w)).filter(
        F.col(rank_col) <= k
    )


def grouped_topk_salted(
    df: DataFrame,
    keys: list[str],
    order_by: list[Column],
    k: int,
    salt_buckets: int = 16,
    rank_col: str = "rn",
) -> DataFrame:
    """Engine-independent two-phase formulation (pre-3.5 Spark or any
    engine without rank-limit pushdown):

    phase 1 — salt the key (``key, spray``), rank within each salted
    sub-group, keep only the local top-k (≤ k·S rows per key survive);
    phase 2 — re-rank survivors within the true key, keep the global
    top-k.  Identical results to :func:`grouped_topk`; measured 1.8×
    slower on Spark 4 because it duplicates work the engine already does
    (module docstring)."""
    spray = (F.abs(F.hash(*[F.col(c) for c in df.columns])) % salt_buckets).alias(
        "__spray"
    )
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
