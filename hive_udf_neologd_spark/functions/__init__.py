"""Scalar function surface (the reference's UDF tier, SURVEY.md §2.1),
plus text-analysis and similarity column expressions (engine extensions
for large-scale training-data pipelines)."""

from hive_udf_neologd_spark.functions.tokenize import (
    tokenize_ja,
    tokenize_ja_version,
    register_udfs,
)

__all__ = ["tokenize_ja", "tokenize_ja_version", "register_udfs"]
